package graft.sources

import graft.SparkSpec
import graft.schema.{SchemaRegistry, TableConfig}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("cursorWindow is half-open: start row in, end row out") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("cur", "v")
    val out = Windowed.cursorWindow(df, "cur", lit(2L), lit(4L))
    assert(canon(out) == Seq(Seq("2", "b"), Seq("3", "c")))
  }

  test("intCursorWindow handles yyyymmdd ints") {
    val df = Seq(20240109, 20240110, 20240119, 20240120).toDF("d")
    val out = Windowed.intCursorWindow(df, "d", 20240110, 20240120)
    assert(canon(out) == Seq(Seq("20240110"), Seq("20240119")))
  }

  test("WatermarkStore: get empty, set, latest-wins on update") {
    val dir = Files.createTempDirectory("wm").toString + "/wm"
    val wm = new WatermarkStore(spark, dir)
    assert(wm.get("t1").isEmpty)
    wm.set("t1", "2024-01-01T00:00:00")
    wm.set("t2", "2024-02-02T00:00:00")
    wm.set("t1", "2024-01-15T00:00:00")
    assert(wm.get("t1").contains("2024-01-15T00:00:00"))
    assert(wm.get("t2").contains("2024-02-02T00:00:00"))
  }

  test("Staging: overwrite truncate-reloads and verifies count; M5 manual suffix") {
    val cfg = TableConfig("bccp.item", SchemaRegistry.structOf("k" -> "Int64"), Seq("k"))
    assert(Staging.stagingName(cfg) == "bccp_item")
    assert(Staging.stagingName(cfg, manual = true) == "bccp_item_manual")
    val dir = Files.createTempDirectory("stg").toString
    val p = Staging.stagingPath(dir, cfg)
    assert(Staging.overwrite(Seq(1L, 2L, 3L).toDF("k"), p) == 3L)
    // truncate-reload: second load replaces, not appends
    assert(Staging.overwrite(Seq(9L).toDF("k"), p) == 1L)
    assert(Staging.read(spark, p).count() == 1L)
  }
}
