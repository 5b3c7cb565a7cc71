package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, 1, 2)
  private val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 9, 9)
  private val media = Seq(
    (1L, "image", png), (2L, "image", jpeg), (3L, "image", Array[Byte](1, 2, 3))
  ).toDF("media_id", "kind", "content")

  test("sniffFormat reads magic bytes; extractMeta adds size+hash+format") {
    val out = Multimodal.extractMeta(media)
    val byId = out.select("media_id", "format", "byte_size").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(byId(1L) == (("png", 10L)))
    assert(byId(2L) == (("jpeg", 6L)))
    assert(byId(3L) == (("unknown", 3L)))
    assert(out.select("content_hash").distinct().count() == 3)
  }

  test("decodeImageStub: deterministic per content, streams via mapPartitions") {
    val f1 = Multimodal.decodeImageStub(spark, media).collect().sortBy(_.media_id)
    val f2 = Multimodal.decodeImageStub(spark, media).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(f => f.width >= 16 && f.height >= 16 && f.channels == 3))
    assert(f1.forall(f => f.mean_luma >= 0.0 && f.mean_luma <= 1.0))
  }

  test("frameSampleIndexes explodes every-Nth frame indexes") {
    val vids = Seq((1L, 2.0)).toDF("media_id", "duration_sec") // 2s @ 10fps = frames 0..19
    val out = Multimodal.frameSampleIndexes(vids, fps = 10.0, "duration_sec", everyNth = 5)
      .select("frame_index").as[Long].collect().sorted
    assert(out sameElements Array(0L, 5L, 10L, 15L))
  }
}
