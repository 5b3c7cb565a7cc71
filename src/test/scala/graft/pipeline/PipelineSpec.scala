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
