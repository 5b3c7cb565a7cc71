package graft.pipeline

import graft.SparkSpec
import graft.schema.TableConfig
import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Incremental materialized-join-view maintenance: delta folding from
  * both sides' change feeds, steady-state skips, crash idempotence. */
class JoinViewSpec extends SparkSpec {
  import spark.implicits._

  private val factCfg = TableConfig("jv.fact", null, Seq("id"))
  private val dimCfg = TableConfig("jv.dim", null, Seq("ck"))
  private val viewCfg = TableConfig("jv.view", null, Seq("id"))

  private def setup() = {
    val t = Files.createTempDirectory("jv").toString
    val fact = new ManifestStore(spark, s"$t/fact", "p")
    val dim = new ManifestStore(spark, s"$t/dim", "dp")
    val view = new MorStore(spark, s"$t/view", "p", viewCfg)
    (t, fact, dim, view)
  }

  private def tick(t: String, view: MorStore, fact: ManifestStore, dim: ManifestStore) =
    JoinView.maintain(spark, s"$t/view", view, fact, dim, Seq("id"), "ck")

  private def recompute(fact: ManifestStore, dim: ManifestStore) =
    fact.read.get.join(dim.read.get, Seq("ck"), "left")

  test("bootstrap tick builds the full view; later ticks fold deltas") {
    val (t, fact, dim, view) = setup()
    fact.upsert(Seq((1L, 10L, "p1", 5.0), (2L, 20L, "p1", 6.0), (3L, 10L, "p2", 7.0))
      .toDF("id", "ck", "p", "v"), factCfg)
    dim.upsert(Seq((10L, "d1", "gold"), (20L, "d1", "silver")).toDF("ck", "dp", "seg"), dimCfg)
    tick(t, view, fact, dim)
    assertSameRows(view.read.get.select("id", "ck", "v", "seg"),
      recompute(fact, dim).select("id", "ck", "v", "seg"))

    // fact-side delta: restate id=1, insert id=4
    fact.upsert(Seq((1L, 10L, "p1", 50.0), (4L, 20L, "p2", 8.0)).toDF("id", "ck", "p", "v"), factCfg)
    tick(t, view, fact, dim)
    assertSameRows(view.read.get.select("id", "ck", "v", "seg"),
      recompute(fact, dim).select("id", "ck", "v", "seg"))

    // dim-side delta: seg change for ck=10 must reach ids 1 and 3
    dim.upsert(Seq((10L, "d1", "platinum")).toDF("ck", "dp", "seg"), dimCfg)
    tick(t, view, fact, dim)
    val segs = view.read.get.select("id", "seg").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(segs == Map(1L -> "platinum", 2L -> "silver", 3L -> "platinum", 4L -> "silver"))
  }

  test("fact deletes tombstone view rows; dim deletes null the dim columns") {
    val (t, fact, dim, view) = setup()
    fact.upsert(Seq((1L, 10L, "p1", 5.0), (2L, 20L, "p2", 6.0)).toDF("id", "ck", "p", "v"), factCfg)
    dim.upsert(Seq((10L, "d1", "gold"), (20L, "d1", "silver")).toDF("ck", "dp", "seg"), dimCfg)
    tick(t, view, fact, dim)
    // delete fact id=1 by replacing partition p1 with nothing
    fact.replacePartitions(fact.read.get.filter(lit(false)), Seq("p1"))
    // delete dim ck=20 the same way
    dim.replacePartitions(dim.read.get.filter(lit(false)), Seq("d1")) // drops both dims!
    dim.upsert(Seq((10L, "d1", "gold")).toDF("ck", "dp", "seg"), dimCfg) // re-add ck=10 unchanged
    tick(t, view, fact, dim)
    val rows = view.read.get.select("id", "seg").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(rows == Seq((2L, None))) // id=1 gone; id=2 keeps fact row, dim nulled
  }

  test("a CURSORED view survives its first delete-bearing tick (tombstones carry the cursor)") {
    // regression: maintainMulti shipped only (partition, keys) on the
    // delete side, but a MorStore with a cursorField requires the
    // cursor on tombstones too — the first delete-bearing tick threw.
    // The fact CDF pre-image carries the cursor; it must flow through.
    val t = Files.createTempDirectory("jvc").toString
    val cursoredViewCfg = TableConfig("jvc.view", null, Seq("id"), cursorField = Some("ts"))
    val fact = new ManifestStore(spark, s"$t/fact", "p")
    val dim = new ManifestStore(spark, s"$t/dim", "dp")
    val view = new MorStore(spark, s"$t/view", "p", cursoredViewCfg)
    fact.upsert(Seq((1L, 10L, "p1", 5.0, 100L), (2L, 20L, "p2", 6.0, 100L))
      .toDF("id", "ck", "p", "v", "ts"), factCfg)
    dim.upsert(Seq((10L, "d1", "gold"), (20L, "d1", "silver")).toDF("ck", "dp", "seg"), dimCfg)
    tick(t, view, fact, dim)
    // delete id=1 (empty-replace its partition) AND restate id=2 — the
    // tick folds refresh rows and tombstones through applyDelta together
    fact.replacePartitions(fact.read.get.filter(lit(false)), Seq("p1"))
    fact.upsert(Seq((2L, 20L, "p2", 60.0, 200L)).toDF("id", "ck", "p", "v", "ts"), factCfg)
    tick(t, view, fact, dim)
    val rows = view.read.get.select("id", "v", "seg").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(rows == Seq((2L, 60.0, "silver")))
  }

  test("tombstone column selection FAILS LOUDLY when the delete side lacks the cursor") {
    // under desc_nulls_last a NULL-cursor tombstone loses to any live
    // cursored row — the delete would silently never land. The tick
    // must refuse instead of substituting NULL.
    val ok = JoinView.tombstoneCols("p", Seq("id"), Some("ts"), Set("p", "id", "ts", "v"))
    assert(ok == Seq("p", "id", "ts"))
    val e = intercept[IllegalArgumentException] {
      JoinView.tombstoneCols("p", Seq("id"), Some("ts"), Set("p", "id", "v"))
    }
    assert(e.getMessage.contains("ts") && e.getMessage.contains("refusing the tick"))
    // a cursor-less view never demands one
    assert(JoinView.tombstoneCols("p", Seq("id"), None, Set("p", "id")) == Seq("p", "id"))
  }

  test("long-running view: segment fan-in stays bounded by compaction (30 ticks)") {
    // every tick appends a delta segment; without the post-fold
    // compactHot() cadence a long-lived view's read fan-in grows one
    // segment per tick forever — the unbounded-cadence failure the
    // 100-tick soak measures at 10×
    val (t, fact, dim, view) = setup()
    dim.upsert(Seq((10L, "d1", "gold"), (20L, "d1", "silver")).toDF("ck", "dp", "seg"), dimCfg)
    var maxSegs = 0
    for (i <- 0 until 30) {
      val id = (i % 12).toLong
      fact.upsert(Seq((id, if (id % 2 == 0) 10L else 20L, s"p${id % 3}", i.toDouble))
        .toDF("id", "ck", "p", "v"), factCfg)
      tick(t, view, fact, dim)
      maxSegs = math.max(maxSegs, view.liveSegments)
    }
    // default compactSegments = 8 over 3 partitions: fan-in must stay
    // within partitions × (threshold + 1), never track tick count
    assert(maxSegs <= 3 * 9, s"fan-in hit $maxSegs — compaction cadence not engaging")
    assert(view.liveSegments < 30)
    assertSameRows(view.read.get.select("id", "ck", "v", "seg"),
      recompute(fact, dim).select("id", "ck", "v", "seg"))
  }

  test("steady state: a tick with no changes reads NOTHING from either store") {
    val (t, fact, dim, view) = setup()
    fact.upsert(Seq((1L, 10L, "p1", 5.0)).toDF("id", "ck", "p", "v"), factCfg)
    dim.upsert(Seq((10L, "d1", "gold")).toDF("ck", "dp", "seg"), dimCfg)
    tick(t, view, fact, dim)
    // break every data segment in both stores — any read would now fail
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hide(root: String): Seq[(Path, Path)] =
      fs.listStatus(new Path(root)).filter(_.getPath.getName.startsWith("seg_")).toSeq
        .map { s =>
          val to = new Path(root, "x_" + s.getPath.getName)
          fs.rename(s.getPath, to); (s.getPath, to)
        }
    val hidden = hide(s"$t/fact") ++ hide(s"$t/dim")
    val (f, dv) = tick(t, view, fact, dim) // must not touch a single data file
    assert((f, dv) == (1, 1))
    hidden.foreach { case (orig, to) => fs.rename(to, orig) }
  }

  test("a fact-only tick never reads untouched fact partitions") {
    val (t, fact, dim, view) = setup()
    fact.upsert(Seq((1L, 10L, "p1", 5.0), (2L, 10L, "p2", 6.0)).toDF("id", "ck", "p", "v"), factCfg)
    dim.upsert(Seq((10L, "d1", "gold")).toDF("ck", "dp", "seg"), dimCfg)
    tick(t, view, fact, dim)
    // the delta touches only p1; p2's segment is re-pointed... verify by
    // hiding the ORIGINAL segment once p1's upsert re-points p1 away from it.
    fact.upsert(Seq((1L, 10L, "p1", 50.0)).toDF("id", "ck", "p", "v"), factCfg)
    // with no dim change the only fact read is the CDF, and the CDF's
    // scope is the changed partition set — p1 alone
    val changed = fact.changes(1, fact.latestManifestVersion.get, Seq("id"))
      .select("p").distinct().collect().map(_.getString(0)).toSeq
    assert(changed == Seq("p1"))
    tick(t, view, fact, dim)
    assertSameRows(view.read.get.select("id", "v", "seg"),
      recompute(fact, dim).select("id", "v", "seg"))
  }

  test("re-folding the same delta is idempotent (crash before marker advance)") {
    val (t, fact, dim, view) = setup()
    fact.upsert(Seq((1L, 10L, "p1", 5.0)).toDF("id", "ck", "p", "v"), factCfg)
    dim.upsert(Seq((10L, "d1", "gold")).toDF("ck", "dp", "seg"), dimCfg)
    tick(t, view, fact, dim)
    fact.upsert(Seq((1L, 10L, "p1", 9.0), (2L, 10L, "p1", 3.0)).toDF("id", "ck", "p", "v"), factCfg)
    tick(t, view, fact, dim)
    val after = canon(view.read.get.select("id", "v", "seg"))
    // crash simulation: rewind the marker to before the second tick and
    // re-fold the identical delta
    JoinView.rewind(spark, s"$t/view", 1, 1)
    tick(t, view, fact, dim)
    assert(canon(view.read.get.select("id", "v", "seg")) == after)
    assert(JoinView.foldedVersions(spark, s"$t/view") == (2, 1))
  }

  test("streaming binding: the view stays current across a drained CDC feed") {
    val (t, fact, dim, view) = setup()
    dim.upsert(Seq((10L, "d1", "gold"), (20L, "d1", "silver")).toDF("ck", "dp", "seg"), dimCfg)
    val inbox = s"$t/inbox"
    Seq((1L, 10L, "p1", 5.0), (2L, 20L, "p2", 6.0)).toDF("id", "ck", "p", "v")
      .repartition(2).write.mode("append").parquet(inbox)
    val schema = spark.read.parquet(inbox).schema
    def drain(): Unit = JoinView.maintainStreaming(spark,
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(inbox),
      s"$t/view", view, fact, factCfg, dim, Seq("id"), "ck", s"$t/ckpt")
    drain()
    assertSameRows(view.read.get.select("id", "ck", "v", "seg"),
      recompute(fact, dim).select("id", "ck", "v", "seg"))
    // a dim change lands between drains; the next drained batch's tick
    // must propagate it alongside the new facts
    dim.upsert(Seq((10L, "d1", "platinum")).toDF("ck", "dp", "seg"), dimCfg)
    Seq((3L, 10L, "p1", 7.0)).toDF("id", "ck", "p", "v")
      .write.mode("append").parquet(inbox)
    drain()
    assertSameRows(view.read.get.select("id", "ck", "v", "seg"),
      recompute(fact, dim).select("id", "ck", "v", "seg"))
    assert(view.read.get.filter(col("seg") === "platinum").count() == 2) // ids 1 and 3
  }

  test("dim MASS-update: replacing every dim row in one commit still folds correctly") {
    // the nightly snapshot-refresh case: 100% of dim keys "change" —
    // the tick must re-join the whole referencing fact slice (here: all
    // of it) through the broadcast semi path, not a driver literal list
    val (t, fact, dim, view) = setup()
    val n = 500
    fact.upsert((1 to n).map(i => (i.toLong, (i % 50).toLong, s"p${i % 4}", i.toDouble))
      .toDF("id", "ck", "p", "v"), factCfg)
    dim.upsert((0 until 50).map(k => (k.toLong, "d1", s"seg$k")).toDF("ck", "dp", "seg"), dimCfg)
    tick(t, view, fact, dim)
    // one commit rewrites EVERY dim row with a new attribute value
    dim.upsert((0 until 50).map(k => (k.toLong, "d1", s"SEG$k")).toDF("ck", "dp", "seg"), dimCfg)
    tick(t, view, fact, dim)
    assertSameRows(view.read.get.select("id", "ck", "v", "seg"),
      recompute(fact, dim).select("id", "ck", "v", "seg"))
    assert(view.read.get.filter(col("seg").startsWith("SEG")).count() == n)
  }

  test("the dim-touched fact slice is a broadcast LEFT SEMI join, never an IN literal") {
    import org.apache.spark.sql.functions.lit
    val fact = (1 to 100).map(i => (i.toLong, (i % 10).toLong)).toDF("id", "ck")
    val keys = (0 until 10).map(k => Tuple1(k.toLong)).toDF("ck")
    val touched = JoinView.dimTouchedFact(fact, keys, "ck")
    val plan = touched.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"dim-touched scan must be a broadcast semi-join:\n$plan")
    assert(!touched.queryExecution.optimizedPlan.toString.contains(" IN ("),
      s"no literal IN list allowed:\n${touched.queryExecution.optimizedPlan}")
    assertSameRows(touched.select("id", "ck"), fact.select("id", "ck")) // every ck is in keys
  }

  test("multi-dim view: fact ⟕ dimA ⟕ dimB folds deltas from every side") {
    val t = Files.createTempDirectory("jvm").toString
    val factCfg = TableConfig("jvm.fact", null, Seq("id"))
    val dimACfg = TableConfig("jvm.dimA", null, Seq("ck"))
    val dimBCfg = TableConfig("jvm.dimB", null, Seq("pk"))
    val fact = new ManifestStore(spark, s"$t/fact", "p")
    val dimA = new ManifestStore(spark, s"$t/dimA", "dp")
    val dimB = new ManifestStore(spark, s"$t/dimB", "bp")
    val view = new MorStore(spark, s"$t/view", "p", TableConfig("jvm.view", null, Seq("id")))
    def tick() = JoinView.maintainMulti(spark, s"$t/view", view, fact,
      Seq((dimA, "ck"), (dimB, "pk")), Seq("id"))
    def recompute() = fact.read.get
      .join(dimA.read.get, Seq("ck"), "left")
      .join(dimB.read.get, Seq("pk"), "left")
      .select("id", "v", "seg", "rank")
    fact.upsert(Seq((1L, 10L, 100L, "p1", 5.0), (2L, 20L, 100L, "p1", 6.0),
        (3L, 10L, 200L, "p2", 7.0)).toDF("id", "ck", "pk", "p", "v"), factCfg)
    dimA.upsert(Seq((10L, "d1", "gold"), (20L, "d1", "silver")).toDF("ck", "dp", "seg"), dimACfg)
    dimB.upsert(Seq((100L, "b1", 1), (200L, "b1", 2)).toDF("pk", "bp", "rank"), dimBCfg)
    assert(tick() == Seq(1, 1, 1))
    assertSameRows(view.read.get.select("id", "v", "seg", "rank"), recompute())

    // one tick carrying a fact restatement AND a dimA update: each
    // refreshed row must see BOTH dims' current state, deduped
    fact.upsert(Seq((1L, 10L, 100L, "p1", 50.0)).toDF("id", "ck", "pk", "p", "v"), factCfg)
    dimA.upsert(Seq((10L, "d1", "platinum")).toDF("ck", "dp", "seg"), dimACfg)
    assert(tick() == Seq(2, 2, 1))
    assertSameRows(view.read.get.select("id", "v", "seg", "rank"), recompute())

    // dimB MASS update (every key) while dimA is untouched
    dimB.upsert(Seq((100L, "b1", 11), (200L, "b1", 12)).toDF("pk", "bp", "rank"), dimBCfg)
    assert(tick() == Seq(2, 2, 2))
    assertSameRows(view.read.get.select("id", "v", "seg", "rank"), recompute())
    assert(view.read.get.filter(col("rank") >= 11).count() == 3)

    // steady state: same versions back, nothing to fold
    assert(tick() == Seq(2, 2, 2))
  }

  test("multi-dim streaming binding: dims changed between drains both propagate") {
    val t = Files.createTempDirectory("jvms").toString
    val factCfg = TableConfig("jvms.fact", null, Seq("id"))
    val fact = new ManifestStore(spark, s"$t/fact", "p")
    val dimA = new ManifestStore(spark, s"$t/dimA", "dp")
    val dimB = new ManifestStore(spark, s"$t/dimB", "bp")
    val view = new MorStore(spark, s"$t/view", "p", TableConfig("jvms.view", null, Seq("id")))
    dimA.upsert(Seq((10L, "d1", "gold")).toDF("ck", "dp", "seg"),
      TableConfig("jvms.dimA", null, Seq("ck")))
    dimB.upsert(Seq((100L, "b1", 1)).toDF("pk", "bp", "rank"),
      TableConfig("jvms.dimB", null, Seq("pk")))
    val inbox = s"$t/inbox"
    Seq((1L, 10L, 100L, "p1", 5.0)).toDF("id", "ck", "pk", "p", "v")
      .write.mode("append").parquet(inbox)
    val schema = spark.read.parquet(inbox).schema
    def drain(): Unit = JoinView.maintainStreamingMulti(spark,
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(inbox),
      s"$t/view", view, fact, factCfg,
      Seq((dimA, "ck"), (dimB, "pk")), Seq("id"), s"$t/ckpt")
    drain()
    def recompute() = fact.read.get
      .join(dimA.read.get, Seq("ck"), "left")
      .join(dimB.read.get, Seq("pk"), "left")
      .select("id", "v", "seg", "rank")
    assertSameRows(view.read.get.select("id", "v", "seg", "rank"), recompute())
    // BOTH dims change between drains; the next drained batch's tick
    // must fold both alongside the new fact rows
    dimA.upsert(Seq((10L, "d1", "platinum")).toDF("ck", "dp", "seg"),
      TableConfig("jvms.dimA", null, Seq("ck")))
    dimB.upsert(Seq((100L, "b1", 11)).toDF("pk", "bp", "rank"),
      TableConfig("jvms.dimB", null, Seq("pk")))
    Seq((2L, 10L, 100L, "p1", 7.0)).toDF("id", "ck", "pk", "p", "v")
      .write.mode("append").parquet(inbox)
    drain()
    assertSameRows(view.read.get.select("id", "v", "seg", "rank"), recompute())
    assert(view.read.get.filter(col("seg") === "platinum" && col("rank") === 11).count() == 2)
  }

  test("multi-dim view refuses clashing non-key columns ACROSS dims") {
    val t = Files.createTempDirectory("jvc").toString
    val fact = new ManifestStore(spark, s"$t/fact", "p")
    val dimA = new ManifestStore(spark, s"$t/dimA", "dp")
    val dimB = new ManifestStore(spark, s"$t/dimB", "bp")
    val view = new MorStore(spark, s"$t/view", "p", TableConfig("jvc.view", null, Seq("id")))
    fact.upsert(Seq((1L, 10L, 100L, "p1")).toDF("id", "ck", "pk", "p"),
      TableConfig("jvc.fact", null, Seq("id")))
    dimA.upsert(Seq((10L, "d1", "gold")).toDF("ck", "dp", "seg"),
      TableConfig("jvc.dimA", null, Seq("ck")))
    dimB.upsert(Seq((100L, "b1", "clash")).toDF("pk", "bp", "seg"), // seg again
      TableConfig("jvc.dimB", null, Seq("pk")))
    val e = intercept[IllegalArgumentException] {
      JoinView.maintainMulti(spark, s"$t/view", view, fact,
        Seq((dimA, "ck"), (dimB, "pk")), Seq("id"))
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("colliding non-key columns between fact and dim are refused") {
    val (t, fact, dim, view) = setup()
    fact.upsert(Seq((1L, 10L, "p1", 5.0)).toDF("id", "ck", "p", "v"), factCfg)
    dim.upsert(Seq((10L, "d1", 1.0)).toDF("ck", "dp", "v"), dimCfg) // v collides
    val e = intercept[IllegalArgumentException] { tick(t, view, fact, dim) }
    assert(e.getMessage.contains("disjoint"))
  }
}
