package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 soak driver (SCALE_SOAK protocol, one-off shapes that are
  * not registered queries):
  *
  *   1. JoinView dim MASS-update at 1× and 10× fact size — the worst
  *      case the broadcast-semi rewrite must survive: a single dim
  *      commit that changes 100% of keys, forcing the full referencing
  *      fact slice through the dim-touched path.
  *   2. Retention/attribution under user skew (1% of users own ~50% of
  *      events) at sf0.01 and sf0.1 — the product-metric ops' only
  *      uniform-fixture blind spot.
  *   3. Batched BPE at k=256: wall clock vs ROUND count (m = 128/64/32
  *      → 2/4/8 rounds) at fixed k — the driver-trip axis claim.
  *
  * Usage: sbt "Test/runMain graft.R12SoakMain [1|2|3|all]"
  */
object R12SoakMain {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("all")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-r12-soak")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (which == "1" || which == "all") joinViewMassUpdate(spark)
    if (which == "2" || which == "all") skewedProductMetrics(spark)
    if (which == "3" || which == "all") batchedBpeRounds(spark)
    spark.stop()
  }

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def joinViewMassUpdate(spark: SparkSession): Unit = {
    import graft.pipeline.{JoinView, ManifestStore, MorStore}
    import graft.schema.TableConfig
    for (factRows <- Seq(200000L, 2000000L)) {
      val t = java.nio.file.Files.createTempDirectory("jvsoak").toString
      val factCfg = TableConfig("soak.fact", null, Seq("id"))
      val dimCfg = TableConfig("soak.dim", null, Seq("ck"))
      val viewCfg = TableConfig("soak.view", null, Seq("id"))
      val fact = new ManifestStore(spark, s"$t/fact", "p")
      val dim = new ManifestStore(spark, s"$t/dim", "dp")
      val view = new MorStore(spark, s"$t/view", "p", viewCfg)
      val nKeys = 2000
      fact.upsert(spark.range(factRows).select(
        col("id"), (col("id") % nKeys).as("ck"),
        concat(lit("p"), pmod(col("id"), lit(16)).cast("string")).as("p"),
        (col("id") * 3 % 1000).cast("double").as("v")), factCfg)
      dim.upsert(spark.range(nKeys).select(
        col("id").as("ck"), lit("d1").as("dp"),
        concat(lit("seg"), col("id").cast("string")).as("seg")), dimCfg)
      val (_, boot) = time {
        JoinView.maintain(spark, s"$t/view", view, fact, dim, Seq("id"), "ck")
      }
      // one commit rewrites EVERY dim row — 100% of keys changed
      dim.upsert(spark.range(nKeys).select(
        col("id").as("ck"), lit("d1").as("dp"),
        concat(lit("SEG"), col("id").cast("string")).as("seg")), dimCfg)
      val (_, mass) = time {
        JoinView.maintain(spark, s"$t/view", view, fact, dim, Seq("id"), "ck")
      }
      val n = view.read.get.filter(col("seg").startsWith("SEG")).count()
      println(f"SOAK|jv_mass_update|fact=$factRows|boot=$boot%.2f|mass_tick=$mass%.2f|rows_refreshed=$n")
      require(n == factRows, s"mass update must refresh every fact row, got $n")
    }
  }

  private def skewedProductMetrics(spark: SparkSession): Unit = {
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      // 1% of users absorb ~half the events: events with an even
      // event_id collapse onto user_id % (maxUser/100)
      val ev = Tables.events(spark, sf)
      val maxUser = ev.agg(max("user_id")).head.getLong(0)
      val hot = math.max(1L, maxUser / 100L)
      val skewed = ev.withColumn("user_id",
        when(pmod(col("event_id"), lit(2)) === 0, pmod(col("user_id"), lit(hot)))
          .otherwise(col("user_id")))
        .localCheckpoint(true)
      val retTimes = (1 to 3).map { _ =>
        time(graft.ops.Retention.retentionMatrix(skewed, "user_id", "ts",
          periodDays = 7, maxPeriods = 12).count())._2
      }
      val attTimes = (1 to 3).map { _ =>
        time(graft.ops.Attribution.linearAttribution(skewed,
          "event_id", "user_id", "ts", "event_type", "value",
          touchTypes = Seq("view", "click"), convType = "purchase",
          lookback = "24 hours").count())._2
      }
      println(f"SOAK|w_retention_skew|$sf|${retTimes.sorted.apply(1)}%.2f")
      println(f"SOAK|w_attribution_skew|$sf|${attTimes.sorted.apply(1)}%.2f")
    }
  }

  private def batchedBpeRounds(spark: SparkSession): Unit = {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    // JIT/scan warmup so the first measured config doesn't absorb it
    graft.llm.Bpe.trainMergesBatched(docs, "text", k = 16, m = 16).count()
    for (m <- Seq(128, 64, 32)) {
      val (df, sec) = time {
        val r = graft.llm.Bpe.trainMergesBatched(docs, "text", k = 256, m = m)
        (r.count(), r.agg(max("round")).head.getInt(0))
      }
      println(f"SOAK|bpe_batched_k256|m=$m|rounds=${df._2}|merges=${df._1}|$sec%.2f")
    }
  }
}
