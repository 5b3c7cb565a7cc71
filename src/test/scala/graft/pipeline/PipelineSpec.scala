package graft.pipeline

import graft.SparkSpec
import graft.meta.MetaStore
import graft.schema.{MergeGuard, SchemaRegistry, TableConfig}
import graft.sources.WatermarkStore
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** End-to-end E1 slice: window → normalize → validate → stage → merge →
  * watermark → metadata, including overlapping-window replay convergence
  * (the backdate-DAG property). */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = TableConfig("ods.items",
    SchemaRegistry.structOf("item_id" -> "Int64", "updated" -> "datetime",
      "status" -> "string"),
    keys = Seq("item_id"), cursorField = Some("updated"),
    guard = MergeGuard.TargetOlder("updated"))

  private def src = Seq(
    (1L, Timestamp.valueOf("2024-01-02 10:00:00"), "created"),
    (1L, Timestamp.valueOf("2024-01-12 10:00:00"), "shipped"),
    (2L, Timestamp.valueOf("2024-01-11 09:00:00"), "created"),
    (2L, Timestamp.valueOf("2024-01-18 09:00:00"), "delivered"),
    (3L, Timestamp.valueOf("2024-01-25 00:00:00"), "created\rdirty")
  ).toDF("item_id", "updated", "status")

  private def layout() = {
    val t = Files.createTempDirectory("pipe").toString
    IncrementalPipeline.Layout(s"$t/staging", s"$t/ods", s"$t/meta", s"$t/wm")
  }

  test("overlapping windows converge; replay is a no-op; bookkeeping written") {
    val lay = layout()
    IncrementalPipeline.runWindow(spark, cfg, lay, src, "2024-01-01 00:00:00", "2024-01-15 00:00:00")
    IncrementalPipeline.runWindow(spark, cfg, lay, src, "2024-01-10 00:00:00", "2024-01-20 00:00:00")
    // replay window 1 (backdate) — must not regress item 2 to 'created'
    IncrementalPipeline.runWindow(spark, cfg, lay, src, "2024-01-01 00:00:00", "2024-01-15 00:00:00")

    val state = IncrementalPipeline.state(spark, lay).get
    assert(canon(state.select("item_id", "status")) == Seq(
      Seq("1", "shipped"), Seq("2", "delivered")).sortBy(_.mkString("|")))

    assert(new WatermarkStore(spark, lay.watermarkPath).get(cfg.name)
      .contains("2024-01-15 00:00:00")) // last run's end
    val meta = new MetaStore(spark, lay.metaPath).taskResults
    assert(meta.count() == 3 && meta.filter(col("isSuccess")).count() == 3)
  }

  test("normalization inside the pipeline scrubs control chars") {
    val lay = layout()
    IncrementalPipeline.runWindow(spark, cfg, lay, src, "2024-01-20 00:00:00", "2024-02-01 00:00:00")
    val state = IncrementalPipeline.state(spark, lay).get
    assert(canon(state.filter(col("item_id") === 3).select("status")) == Seq(Seq("createddirty")))
  }

  test("TableStore versions advance and prune keeps the latest") {
    val root = Files.createTempDirectory("store").toString + "/t"
    val store = new TableStore(spark, root)
    assert(store.read.isEmpty)
    store.snapshot(Seq((1L, "a")).toDF("k", "v"))
    store.upsert(Seq((1L, "b"), (2L, "c")).toDF("k", "v"),
      TableConfig("t", null, Seq("k")))
    assert(store.versions == Seq(1, 2))
    assert(canon(store.read.get) == Seq(Seq("1", "b"), Seq("2", "c")))
    store.snapshot(Seq((9L, "z")).toDF("k", "v"))
    store.prune(keep = 1)
    assert(store.versions == Seq(3))
  }

  test("TableStore: a torn staging dir is invisible to readers and swept") {
    val root = Files.createTempDirectory("store-torn").toString + "/t"
    val store = new TableStore(spark, root)
    store.snapshot(Seq((1L, "a")).toDF("k", "v"))
    // simulate a crash mid-write of v=2: a staging dir with partial junk
    val torn = new java.io.File(s"$root/.tmp_v=2")
    assert(torn.mkdirs())
    java.nio.file.Files.write(torn.toPath.resolve("part-junk"), Array[Byte](1, 2, 3))
    // readers still see only the committed version
    assert(store.versions == Seq(1))
    assert(canon(store.read.get) == Seq(Seq("1", "a")))
    // the next snapshot sweeps the orphan and commits cleanly as v=2
    store.snapshot(Seq((2L, "b")).toDF("k", "v"))
    assert(store.versions == Seq(1, 2))
    assert(canon(store.read.get) == Seq(Seq("2", "b")))
    assert(!torn.exists())
  }

  test("TableStore.append: O(batch) bytes — the delta version holds ONLY the batch") {
    val root = Files.createTempDirectory("store-append").toString + "/t"
    val store = new TableStore(spark, root)
    store.snapshot((1L to 1000L).map(i => (i, s"v$i")).toDF("k", "v"))
    store.append(Seq((2001L, "a"), (2002L, "b")).toDF("k", "v"))
    assert(store.versions == Seq(1, 2))
    // the append version directory contains the batch alone — the proof
    // the commit wrote O(batch), not a full-table rewrite
    assert(spark.read.parquet(s"$root/v=2").count() == 2)
    assert(store.read.get.count() == 1002)
    // a second append chains: v=3 holds only its batch, read unions all
    store.append(Seq((3001L, "c")).toDF("k", "v"))
    assert(spark.read.parquet(s"$root/v=3").count() == 1)
    assert(store.read.get.count() == 1003)
    // a snapshot compacts: the chain ends, read sees only the new full
    store.snapshot(Seq((1L, "x")).toDF("k", "v"))
    assert(store.read.get.count() == 1)
  }

  test("TableStore.append: first write degrades to a snapshot; torn append invisible") {
    val root = Files.createTempDirectory("store-append2").toString + "/t"
    val store = new TableStore(spark, root)
    store.append(Seq((1L, "a")).toDF("k", "v")) // no parent → full version
    assert(canon(store.read.get) == Seq(Seq("1", "a")))
    // crash mid-append: staged dir with marker never renamed
    val torn = new java.io.File(s"$root/.tmp_v=2")
    assert(torn.mkdirs())
    java.nio.file.Files.write(torn.toPath.resolve("_delta_parent"), "1".getBytes)
    assert(store.versions == Seq(1))
    assert(canon(store.read.get) == Seq(Seq("1", "a")))
    store.append(Seq((2L, "b")).toDF("k", "v")) // sweeps the orphan, commits v=2
    assert(store.versions == Seq(1, 2))
    assert(canon(store.read.get) == Seq(Seq("1", "a"), Seq("2", "b")))
  }

  test("TableStore.prune is chain-aware: a kept append head keeps its ancestry") {
    val root = Files.createTempDirectory("store-chain").toString + "/t"
    val store = new TableStore(spark, root)
    store.snapshot(Seq((1L, "a")).toDF("k", "v"))   // v1 full
    store.append(Seq((2L, "b")).toDF("k", "v"))     // v2 ← v1
    store.append(Seq((3L, "c")).toDF("k", "v"))     // v3 ← v2
    store.snapshot(Seq((10L, "x")).toDF("k", "v"))  // v4 full (compaction)
    store.append(Seq((11L, "y")).toDF("k", "v"))    // v5 ← v4
    store.prune(keep = 2) // heads v4,v5; chain {4,5}; v1..v3 go
    assert(store.versions == Seq(4, 5))
    assert(canon(store.read.get) == Seq(Seq("10", "x"), Seq("11", "y")))
    // pruning to ONE head still keeps the head's parent alive
    store.prune(keep = 1)
    assert(store.versions == Seq(4, 5))
    assert(canon(store.read.get) == Seq(Seq("10", "x"), Seq("11", "y")))
  }

  test("TableStore.compact collapses the chain; bounded append auto-compacts") {
    val root = Files.createTempDirectory("store-compact").toString + "/t"
    val store = new TableStore(spark, root)
    store.snapshot(Seq((1L, "a")).toDF("k", "v"))       // v1 full
    store.append(Seq((2L, "b")).toDF("k", "v"))         // v2 ← v1
    store.append(Seq((3L, "c")).toDF("k", "v"))         // v3 ← v2
    assert(store.chainLength == 3)
    val before = canon(store.read.get)
    // compact: one new FULL version, same rows, chain length back to 1
    store.compact()
    assert(store.chainLength == 1)
    assert(canon(store.read.get) == before)
    // the compacted version is self-contained — pruning to it alone works
    store.prune(keep = 1)
    assert(store.versions.length == 1)
    assert(canon(store.read.get) == before)

    // bounded append: chain grows to maxChain, then one append compacts
    store.append(Seq((4L, "d")).toDF("k", "v"), maxChain = 2) // chain 2
    assert(store.chainLength == 2)
    store.append(Seq((5L, "e")).toDF("k", "v"), maxChain = 2) // 3 > 2 → compact
    assert(store.chainLength == 1)
    assert(canon(store.read.get) ==
      Seq(Seq("1", "a"), Seq("2", "b"), Seq("3", "c"), Seq("4", "d"), Seq("5", "e")))
  }

  test("TableStore.readAt time-travels to any surviving version") {
    val root = Files.createTempDirectory("store-tt").toString + "/t"
    val store = new TableStore(spark, root)
    store.snapshot(Seq((1L, "a")).toDF("k", "v"))   // v1
    store.append(Seq((2L, "b")).toDF("k", "v"))     // v2 ← v1
    store.snapshot(Seq((9L, "z")).toDF("k", "v"))   // v3 full
    assert(canon(store.readAt(1)) == Seq(Seq("1", "a")))
    assert(canon(store.readAt(2)) == Seq(Seq("1", "a"), Seq("2", "b"))) // chain resolved
    assert(canon(store.readAt(3)) == Seq(Seq("9", "z")))
    assert(canon(store.read.get) == canon(store.readAt(3)))
    val e = intercept[IllegalArgumentException](store.readAt(7))
    assert(e.getMessage.contains("does not exist"))
  }

  test("TableStore.compact crash-mid-compact leaves the chain readable") {
    val root = Files.createTempDirectory("store-compact-torn").toString + "/t"
    val store = new TableStore(spark, root)
    store.snapshot(Seq((1L, "a")).toDF("k", "v"))
    store.append(Seq((2L, "b")).toDF("k", "v"))
    // simulate a crash mid-compaction: the would-be full v=3 never renamed
    val torn = new java.io.File(s"$root/.tmp_v=3")
    assert(torn.mkdirs())
    java.nio.file.Files.write(torn.toPath.resolve("part-junk"), Array[Byte](7))
    // readers keep resolving the intact chain — old state, never mixed
    assert(store.chainLength == 2)
    assert(canon(store.read.get) == Seq(Seq("1", "a"), Seq("2", "b")))
    // retried compaction sweeps the orphan and commits
    store.compact()
    assert(store.chainLength == 1)
    assert(canon(store.read.get) == Seq(Seq("1", "a"), Seq("2", "b")))
  }

  test("failed window logs a failure row and rethrows") {
    val lay = layout()
    // (renaming or dropping the cursor would NOT fail — Spark resolves
    // filters through projections into the child's attributes; only a
    // source that never had the column fails)
    val bad = Seq((1L, "created")).toDF("item_id", "status")
    intercept[Exception] {
      IncrementalPipeline.runWindow(spark, cfg, lay, bad, "2024-01-01 00:00:00", "2024-01-15 00:00:00")
    }
    val meta = new MetaStore(spark, lay.metaPath).taskResults
    assert(meta.count() == 1 && meta.filter(!col("isSuccess")).count() == 1)
  }
}
