package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

import graft.SparkSpec
import graft.plans.RollupRewrite.SumMeasure

/** The materialized-rollup rewrite: correctness of the re-aggregation,
  * exactness of the refusal conditions, and invisibility of the swap
  * (schema, names, types identical either way). */
class RollupRewriteSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val dec = DataType.fromDDL("decimal(18,2)")

  // lineitem fact + a materialized (returnflag, linestatus) rollup —
  // written to parquet so the rewritten scan is a genuinely different
  // (and smaller) file source
  private lazy val fixture: (DataFrame, String) = {
    val base = spark.read.parquet(s"$sf/lineitem.parquet")
    val dir = Files.createTempDirectory("mv_rollup").toString + "/rollup"
    RollupRewrite.buildRollup(base, Seq("l_returnflag", "l_linestatus"),
        Seq(SumMeasure("l_quantity", Some(dec), "sum_qty"),
            SumMeasure("l_extendedprice", Some(dec), "sum_price")),
        countCol = Some("cnt"),
        maxs = Map("l_shipdate" -> "max_ship"))
      .write.mode("overwrite").parquet(dir)
    (base, dir)
  }

  private def withMv[T](body: => T): T = {
    val (base, dir) = fixture
    RollupRewrite.withRollup(spark, "li_rollup", base,
      Seq("l_returnflag", "l_linestatus"),
      Seq(SumMeasure("l_quantity", Some(dec), "sum_qty"),
          SumMeasure("l_extendedprice", Some(dec), "sum_price")),
      spark.read.parquet(dir),
      countCol = Some("cnt"),
      maxs = Map("l_shipdate" -> "max_ship"))(body)
  }

  private def scansRollup(df: DataFrame): Boolean = {
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("mv_rollup") && !plan.contains("lineitem.parquet")
  }

  private def query(): DataFrame =
    spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast(dec)).as("sum_qty"),
           count(lit(1)).as("n"))

  test("rewrite fires: the aggregate scans the rollup, not the fact") {
    val direct = query().collect().toSeq
    withMv {
      val df = query()
      assert(scansRollup(df), df.queryExecution.executedPlan.toString)
      assert(canon(df) == direct.map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")))
    }
    // unregistered again: back to the fact scan
    val after = query()
    after.count()
    assert(after.queryExecution.executedPlan.toString.contains("lineitem.parquet"))
  }

  test("schema is identical with and without the rewrite") {
    val direct = query()
    withMv { assert(query().schema == direct.schema) }
  }

  test("expressions over rewritten aggregates (ratios, casts) carry over") {
    def q() = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag", "l_linestatus")
      .agg((sum(col("l_extendedprice").cast(dec)).cast("double") /
            sum(col("l_quantity").cast(dec)).cast("double")).as("avg_price"),
           max(col("l_shipdate")).as("max_ship"))
    val direct = canon(q())
    withMv {
      val df = q()
      assert(scansRollup(df), df.queryExecution.executedPlan.toString)
      assert(canon(df) == direct)
    }
  }

  test("filters on grouping keys rewrite; filters on other columns refuse") {
    def keyFiltered() = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_returnflag") === "R")
      .groupBy("l_linestatus").agg(count(lit(1)).as("n"))
    val direct = canon(keyFiltered())
    withMv {
      val kf = keyFiltered()
      assert(scansRollup(kf), kf.queryExecution.executedPlan.toString)
      assert(canon(kf) == direct)
      // a measure-column filter cannot be answered from the rollup
      val mf = spark.read.parquet(s"$sf/lineitem.parquet")
        .filter(col("l_quantity") > 10)
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      mf.count()
      assert(mf.queryExecution.executedPlan.toString.contains("lineitem.parquet"))
    }
  }

  test("non-derivable aggregates refuse: distinct, unregistered measure, min") {
    withMv {
      val distinct = spark.read.parquet(s"$sf/lineitem.parquet")
        .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("n"))
      distinct.count()
      assert(distinct.queryExecution.executedPlan.toString.contains("lineitem.parquet"))
      val unregistered = spark.read.parquet(s"$sf/lineitem.parquet")
        .groupBy("l_returnflag").agg(sum("l_tax").as("t"))
      unregistered.count()
      assert(unregistered.queryExecution.executedPlan.toString.contains("lineitem.parquet"))
      // max_ship is registered, min is not
      val unregMin = spark.read.parquet(s"$sf/lineitem.parquet")
        .groupBy("l_returnflag").agg(min("l_shipdate").as("m"))
      unregMin.count()
      assert(unregMin.queryExecution.executedPlan.toString.contains("lineitem.parquet"))
    }
  }

  test("sum must match the registered cast exactly (raw sum over a cast measure refuses)") {
    withMv {
      // registered as sum(cast(l_quantity as decimal)); a raw double sum
      // is a DIFFERENT number (fp addition order) — must not rewrite
      val raw = spark.read.parquet(s"$sf/lineitem.parquet")
        .groupBy("l_returnflag").agg(sum("l_quantity").as("q"))
      raw.count()
      assert(raw.queryExecution.executedPlan.toString.contains("lineitem.parquet"))
    }
  }

  test("grouping by a non-key or an expression refuses") {
    withMv {
      val nonKey = spark.read.parquet(s"$sf/lineitem.parquet")
        .groupBy("l_suppkey").agg(count(lit(1)).as("n"))
      nonKey.count()
      assert(nonKey.queryExecution.executedPlan.toString.contains("lineitem.parquet"))
      val expr = spark.read.parquet(s"$sf/lineitem.parquet")
        .groupBy(upper(col("l_returnflag")).as("rf")).agg(count(lit(1)).as("n"))
      expr.count()
      assert(expr.queryExecution.executedPlan.toString.contains("lineitem.parquet"))
    }
  }

  test("count(*) re-aggregates the stored per-group count") {
    def q() = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_linestatus").agg(count(lit(1)).as("n"))
    val direct = canon(q())
    withMv {
      val df = q()
      assert(scansRollup(df), df.queryExecution.executedPlan.toString)
      assert(canon(df) == direct)
    }
  }

  test("store-backed fact: a ManifestStore union read matches by plan identity") {
    import graft.pipeline.ManifestStore
    import graft.schema.TableConfig
    val root = Files.createTempDirectory("mv_store").toString
    val store = new ManifestStore(spark, s"$root/fact", "l_returnflag")
    val cfg = TableConfig("mv_fact", null, Seq("l_orderkey", "l_linenumber"))
    store.upsert(spark.read.parquet(s"$sf/lineitem.parquet"), cfg)
    val base = store.read.get
    val rollupDir = s"$root/rollup"
    RollupRewrite.buildRollup(base, Seq("l_returnflag"),
        Seq(SumMeasure("l_quantity", Some(dec), "sum_qty")))
      .write.parquet(rollupDir)
    def q() = store.read.get.groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast(dec)).as("sum_qty"), count(lit(1)).as("n"))
    val direct = canon(q())
    RollupRewrite.withRollup(spark, "store_mv", base, Seq("l_returnflag"),
        Seq(SumMeasure("l_quantity", Some(dec), "sum_qty")),
        spark.read.parquet(rollupDir)) {
      val df = q()
      df.count()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("mv_store") && plan.contains("rollup") &&
        !plan.contains("fact/seg"), plan)
      assert(canon(df) == direct)

      // freshness guard by construction: a store COMMIT changes the
      // resolved union plan, so the (now stale) registration silently
      // stops matching — the fact is scanned again until the
      // maintenance loop re-registers after its tick
      store.upsert(spark.read.parquet(s"$sf/lineitem.parquet")
        .limit(5).withColumn("l_quantity", lit(999.0)), cfg)
      val after = q()
      after.count()
      assert(!after.queryExecution.executedPlan.toString.contains("rollup"),
        after.queryExecution.executedPlan.toString)
    }
  }

  test("plain SQL through a temp view rewrites too (SubqueryAlias peeled)") {
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("mv_fact_v")
    def q() = spark.sql("""
      SELECT l_returnflag, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
             count(*) AS n
      FROM mv_fact_v GROUP BY l_returnflag""")
    val direct = canon(q())
    withMv {
      val df = q()
      assert(scansRollup(df), df.queryExecution.executedPlan.toString)
      assert(canon(df) == direct)
    }
  }

  test("two registered facts: each query matches its own rollup") {
    val (base, dir) = fixture
    val odir = Files.createTempDirectory("mv_orders").toString + "/rollup"
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    RollupRewrite.buildRollup(orders, Seq("o_orderstatus"),
        Seq(SumMeasure("o_totalprice", Some(dec), "sum_price")))
      .write.parquet(odir)
    withMv {
      RollupRewrite.withRollup(spark, "orders_mv", orders, Seq("o_orderstatus"),
          Seq(SumMeasure("o_totalprice", Some(dec), "sum_price")),
          spark.read.parquet(odir)) {
        val li = query()
        assert(scansRollup(li), li.queryExecution.executedPlan.toString)
        val om = orders.groupBy("o_orderstatus")
          .agg(sum(col("o_totalprice").cast(dec)).as("p"))
        om.count()
        val plan = om.queryExecution.executedPlan.toString
        assert(plan.contains("mv_orders") && !plan.contains("orders.parquet"), plan)
      }
    }
  }

  test("property: rewritten results equal direct over randomized query shapes") {
    val rnd = new scala.util.Random(42)
    val keys = Seq("l_returnflag", "l_linestatus")
    withMv {
      for (i <- 1 to 25) {
        val gks = keys.filter(_ => rnd.nextBoolean())
        val aggs = scala.collection.mutable.Buffer[org.apache.spark.sql.Column]()
        if (rnd.nextBoolean()) aggs += sum(col("l_quantity").cast(dec)).as("sq")
        if (rnd.nextBoolean()) aggs += sum(col("l_extendedprice").cast(dec)).as("sp")
        if (rnd.nextBoolean()) aggs += count(lit(1)).as("n")
        if (rnd.nextBoolean()) aggs += max(col("l_shipdate")).as("ms")
        if (aggs.isEmpty) aggs += count(lit(1)).as("n")
        val filt: DataFrame => DataFrame = rnd.nextInt(3) match {
          case 0 => identity
          case 1 => _.filter(col("l_returnflag") =!= "N")
          case 2 => _.filter(col("l_linestatus") === "F")
        }
        def build(): DataFrame = {
          val b = filt(spark.read.parquet(s"$sf/lineitem.parquet"))
          val g = if (gks.isEmpty) b.groupBy() else b.groupBy(gks.map(col): _*)
          g.agg(aggs.head, aggs.tail.toSeq: _*)
        }
        val withRewrite = build()
        val scans = withRewrite.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.rootPaths.map(_.toString)
              case _ => Nil
            }
        }.flatten
        assert(scans.nonEmpty && scans.forall(_.contains("mv_rollup")),
          s"case $i did not rewrite (gks=$gks, ${aggs.size} aggs): $scans")
        val rewrittenRows = canon(withRewrite)
        val rewrittenSchema = withRewrite.schema
        // direct baseline with the registration suspended
        RollupRewrite.unregister("li_rollup")
        val direct = build()
        assert(rewrittenSchema == direct.schema, s"case $i schema diverges")
        assert(rewrittenRows == canon(direct), s"case $i values diverge")
        // restore for the remaining iterations (withMv cleans up at the end)
        RollupRewrite.register(spark, "li_rollup", fixture._1, keys,
          Seq(SumMeasure("l_quantity", Some(dec), "sum_qty"),
              SumMeasure("l_extendedprice", Some(dec), "sum_price")),
          spark.read.parquet(fixture._2), countCol = Some("cnt"),
          maxs = Map("l_shipdate" -> "max_ship"))
      }
    }
  }

  test("property: randomized NON-rewritable shapes all refuse (scan stays on the fact)") {
    val rnd = new scala.util.Random(1337)
    withMv {
      for (i <- 1 to 25) {
        // each case takes a rewritable core and injects ONE poison the
        // rule must refuse: the refusal conditions are the safety
        // boundary, so they get the same randomized coverage as the
        // positive path
        val poison = rnd.nextInt(6)
        def base = spark.read.parquet(s"$sf/lineitem.parquet")
        val df = poison match {
          case 0 => // distinct aggregate
            base.groupBy("l_returnflag")
              .agg(countDistinct(col("l_linestatus")).as("n"))
          case 1 => // filter on a measure column
            base.filter(col("l_quantity") > rnd.nextInt(40))
              .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
          case 2 => // NONDETERMINISTIC filter (reference-free: the key
            // check alone would pass it — the determinism guard must not)
            base.filter(rand(rnd.nextInt(100)) < 0.99)
              .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
          case 3 => // unregistered measure
            base.groupBy("l_returnflag")
              .agg(sum(col("l_tax").cast(dec)).as("s"))
          case 4 => // expression grouping key
            base.groupBy(upper(col("l_returnflag")).as("rf"))
              .agg(count(lit(1)).as("n"))
          case 5 => // type drift: sum under a different cast than registered
            base.groupBy("l_returnflag")
              .agg(sum(col("l_quantity").cast("double")).as("s"))
        }
        df.count()
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("lineitem.parquet") && !plan.contains("mv_rollup"),
          s"case $i (poison $poison) must NOT rewrite:\n$plan")
      }
    }
  }

  test("avg rewrites to sum/count-of-measure and stays exact under nulls") {
    // a fact with planted nulls in the measure: avg's denominator is the
    // NON-NULL count, so a rewrite dividing by cnt(*) would be wrong —
    // the per-measure cntCol is what keeps it exact
    val facts = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag"), col("l_linestatus"),
        when(col("l_orderkey") % 3 === 0, lit(null).cast("double"))
          .otherwise(col("l_quantity").cast("double")).as("qty"))
    val dir = Files.createTempDirectory("mv_avg").toString + "/rollup"
    val sums = Seq(SumMeasure("qty", None, "sum_qty", cntCol = Some("cnt_qty")))
    RollupRewrite.buildRollup(facts, Seq("l_returnflag", "l_linestatus"), sums)
      .write.parquet(dir)
    def q() = facts.groupBy("l_returnflag").agg(avg(col("qty")).as("a"))
    val direct = canon(q())
    val directSchema = q().schema
    RollupRewrite.withRollup(spark, "avg_mv", facts,
        Seq("l_returnflag", "l_linestatus"), sums, spark.read.parquet(dir)) {
      val df = q()
      df.count()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("mv_avg") && !plan.contains("lineitem.parquet"), plan)
      assert(df.schema == directSchema)
      assert(canon(df) == direct)
    }
  }

  test("avg rewrite under ANSI mode: an all-null group divides to NULL, never errors") {
    // the rewritten AVG is Σsum/Σcnt — a group whose measure is all
    // null has cnt-sum 0, and the direct plan's avg answers NULL there
    // under EVERY eval mode. The Divide is pinned to LEGACY so an ANSI
    // session doesn't turn the automatic rewrite into DIVIDE_BY_ZERO.
    import spark.implicits._
    val facts = Seq(("A", Some(2.0)), ("A", Some(4.0)),
      ("X", Option.empty[Double]), ("X", Option.empty[Double]))
      .toDF("g", "qty")
    val dir = Files.createTempDirectory("mv_avg_ansi").toString + "/rollup"
    val sums = Seq(SumMeasure("qty", None, "sum_qty", cntCol = Some("cnt_qty")))
    RollupRewrite.buildRollup(facts, Seq("g"), sums).write.parquet(dir)
    val prior = spark.conf.getOption("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      RollupRewrite.withRollup(spark, "avg_ansi_mv", facts, Seq("g"), sums,
          spark.read.parquet(dir)) {
        val df = facts.groupBy("g").agg(avg(col("qty")).as("a"))
        val rows = df.collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
        assert(df.queryExecution.executedPlan.toString.contains("mv_avg_ansi"))
        assert(rows("A").contains(3.0) && rows("X").isEmpty, rows.toString)
      }
    } finally prior match {
      case Some(v) => spark.conf.set("spark.sql.ansi.enabled", v)
      case None => spark.conf.unset("spark.sql.ansi.enabled")
    }
  }

  test("decimal avg rewrites EXACTLY — Spark's promotion replicated, randomized shapes") {
    // the rewrite replays Average.evaluateExpression's own expression
    // shape (divide of sum type by Decimal(20,0), cast to resultType),
    // so the decimal result must be BIT-IDENTICAL to the direct plan —
    // across precisions/scales, planted nulls, an all-null group, and
    // values at the precision edge
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for ((p, s) <- Seq((10, 2), (18, 6), (7, 0), (27, 10))) {
      val dt = org.apache.spark.sql.types.DecimalType(p, s)
      def randVal(): String = {
        // up to p digits, scale s — exercise the full precision range
        val digits = 1 + rnd.nextInt(p)
        val raw = (1 to digits).map(_ => rnd.nextInt(10)).mkString.dropWhile(_ == '0')
        val v = if (raw.isEmpty) "1" else raw
        val (i, f) = v.splitAt(math.max(0, v.length - s))
        val sign = if (rnd.nextBoolean()) "-" else ""
        s"$sign${if (i.isEmpty) "0" else i}.${f.reverse.padTo(s, '0').reverse}"
      }
      val rows = (1 to 400).map { i =>
        val g = s"g${i % 7}"
        val v = if (g == "g6" || rnd.nextInt(5) == 0) null else randVal()
        (g, v)
      }
      val facts = rows.toDF("g", "vs").select(col("g"), col("vs").cast(dt).as("m"))
        .localCheckpoint()
      val dir = Files.createTempDirectory(s"mv_avg_dec_${p}_$s").toString + "/rollup"
      val sums = Seq(SumMeasure("m", None, "sum_m", cntCol = Some("cnt_m")))
      RollupRewrite.buildRollup(facts, Seq("g"), sums).write.parquet(dir)
      def q() = facts.groupBy("g").agg(avg(col("m")).as("a"))
      val direct = canon(q())
      val directSchema = q().schema
      RollupRewrite.withRollup(spark, s"avg_dec_$p", facts, Seq("g"), sums,
          spark.read.parquet(dir)) {
        val df = q()
        df.count()
        assert(df.queryExecution.executedPlan.toString.contains(s"mv_avg_dec_${p}_$s"),
          s"decimal($p,$s) avg did not rewrite")
        assert(df.schema == directSchema, s"decimal($p,$s): schema drift")
        assert(canon(df) == direct, s"decimal($p,$s): value drift")
      }
    }
  }

  test("avg refuses without a registered per-measure count") {
    withMv {
      // sum_qty is registered but has no cntCol — dividing by the group
      // row count would silently miscount null measures, so refuse
      val df = spark.read.parquet(s"$sf/lineitem.parquet")
        .groupBy("l_returnflag").agg(avg(col("l_quantity").cast(dec)).as("a"))
      df.count()
      assert(df.queryExecution.executedPlan.toString.contains("lineitem.parquet"))
    }
  }

  test("HAVING above the aggregate survives the rewrite; results exact") {
    // HAVING is a Filter ABOVE the Aggregate — the rule rewrites the
    // aggregate underneath and the filter applies to identical output
    def q() = query().filter(col("sum_qty") > lit(new java.math.BigDecimal(1000)) &&
      col("n") > 10)
    val direct = canon(q())
    withMv {
      val df = q()
      assert(scansRollup(df), df.queryExecution.executedPlan.toString)
      assert(canon(df) == direct)
    }
  }

  test("grouping sets / rollup() / cube() refuse cleanly (aggregate sits over Expand)") {
    withMv {
      for (shape <- Seq("ROLLUP", "CUBE", "GROUPING SETS ((l_returnflag), ())")) {
        val grouping = if (shape.startsWith("GROUPING")) shape
                       else s"$shape(l_returnflag)"
        spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("li_gs")
        val df = spark.sql(
          s"""SELECT l_returnflag, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
             |FROM li_gs GROUP BY $grouping""".stripMargin)
        df.count()
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("lineitem.parquet") && !plan.contains("mv_rollup"),
          s"$shape must NOT rewrite (grand-total rows are not derivable " +
            s"from a fixed-grain rollup without re-deriving grouping ids):\n$plan")
      }
    }
  }

  test("full-table aggregate (no grouping) also rewrites") {
    def q() = spark.read.parquet(s"$sf/lineitem.parquet")
      .agg(sum(col("l_quantity").cast(dec)).as("q"), count(lit(1)).as("n"))
    val direct = canon(q())
    withMv {
      val df = q()
      assert(scansRollup(df), df.queryExecution.executedPlan.toString)
      assert(canon(df) == direct)
    }
  }
}
