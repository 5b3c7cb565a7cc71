package graft.streaming

import graft.SparkSpec
import graft.pipeline.TableStore
import graft.schema.{MergeGuard, TableConfig}
import java.nio.file.Files
import java.sql.Timestamp

/** Structured Streaming micro-batch CDC: AvailableNow drain + idempotent
  * merge per batch + checkpointed resume. */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = TableConfig("ods.stream_items", null, Seq("k"),
    cursorField = Some("ts"), guard = MergeGuard.TargetOlder("ts"))

  test("AvailableNow drain merges batches; resume picks up only new files") {
    val t = Files.createTempDirectory("stream").toString
    val inbox = s"$t/inbox"; val ckpt = s"$t/ckpt"; val tableRoot = s"$t/table"
    val store = new TableStore(spark, tableRoot)

    val batch1 = Seq(("a", Timestamp.valueOf("2024-01-01 00:00:00"), 1),
                     ("b", Timestamp.valueOf("2024-01-02 00:00:00"), 2))
      .toDF("k", "ts", "v")
    batch1.write.mode("append").parquet(inbox)
    val stream1 = StreamOps.fileStream(spark, inbox, batch1.schema)
    StreamOps.mergeAvailable(stream1, store, cfg, ckpt)
    assert(canon(store.read.get.select("k", "v")) == Seq(Seq("a", "1"), Seq("b", "2")))

    // second drop: newer 'a', stale 'b', new 'c'
    Seq(("a", Timestamp.valueOf("2024-01-05 00:00:00"), 10),
        ("b", Timestamp.valueOf("2023-12-01 00:00:00"), 99),
        ("c", Timestamp.valueOf("2024-01-03 00:00:00"), 3))
      .toDF("k", "ts", "v").write.mode("append").parquet(inbox)
    StreamOps.mergeAvailable(StreamOps.fileStream(spark, inbox, batch1.schema), store, cfg, ckpt)
    assert(canon(store.read.get.select("k", "v")) == Seq(
      Seq("a", "10"), Seq("b", "2"), Seq("c", "3")).sortBy(_.mkString("|")))
  }

  test("watermarked windowed counts over a drained stream") {
    val t = Files.createTempDirectory("stream2").toString
    val inbox = s"$t/inbox"
    val data = Seq(("x", Timestamp.valueOf("2024-01-01 00:10:00")),
                   ("x", Timestamp.valueOf("2024-01-01 23:50:00")),
                   ("y", Timestamp.valueOf("2024-01-02 01:00:00")))
      .toDF("k", "ts")
    data.write.parquet(inbox)
    val counts = StreamOps.windowedCounts(
      StreamOps.fileStream(spark, inbox, data.schema), "ts", "1 day", "1 day", Seq("k"))
    val q = counts.writeStream.format("memory").queryName("wc")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(canon(spark.table("wc").select("k", "n")) == Seq(
      Seq("x", "2"), Seq("y", "1")).sortBy(_.mkString("|")))
  }
}
