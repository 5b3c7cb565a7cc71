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

  test("decodeImage: real PNG pixels decode to exact features") {
    val imgs = Seq(
      (1L, Multimodal.solidPng(16, 9, 255, 0, 0)),
      (2L, Multimodal.solidPng(3, 4, 128, 128, 128))).toDF("media_id", "content")
    val out = Multimodal.decodeImage(spark, imgs).collect().sortBy(_.media_id)
    assert(out(0) == Multimodal.ImageFeatures(1L, decoded = true,
      Some(16), Some(9), Some(3), Some(0.299 * 255 / 255.0 / 1.0)) ||
      (out(0).width.contains(16) && out(0).height.contains(9) &&
       out(0).channels.contains(3) &&
       math.abs(out(0).mean_luma.get - 0.299) < 1e-9))
    assert(out(1).width.contains(3) && out(1).height.contains(4) &&
      math.abs(out(1).mean_luma.get - 128.0 / 255.0) < 1e-9)
  }

  test("decodeImage: JPEG decodes (JDK codec); junk and truncated bytes fail honestly") {
    val img = new java.awt.image.BufferedImage(24, 18, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val cases = Seq(
      (1L, bos.toByteArray),                        // real JPEG
      (2L, "just some text".getBytes("UTF-8")),     // not an image at all
      (3L, png),                                    // magic bytes only, truncated body
      (4L, null.asInstanceOf[Array[Byte]])          // NULL payload
    ).toDF("media_id", "content")
    val byId = Multimodal.decodeImage(spark, cases).collect().map(f => f.media_id -> f).toMap
    assert(byId(1L).decoded && byId(1L).width.contains(24) && byId(1L).height.contains(18))
    assert(!byId(2L).decoded && byId(2L).width.isEmpty)
    assert(!byId(3L).decoded)
    assert(!byId(4L).decoded)
    // determinism across runs (replay-stable features)
    val again = Multimodal.decodeImage(spark, cases).collect().map(f => f.media_id -> f).toMap
    assert(again == byId)
  }

  test("decodeImage: header-declared huge dimensions rejected before allocation") {
    // take a real tiny PNG and patch the IHDR width/height fields (bytes
    // 16-23, big-endian) to declare 60000×60000 — a classic decompression
    // bomb shape: tiny payload, multi-GB decoded pixel buffer
    val bomb = Multimodal.solidPng(4, 4, 1, 2, 3).clone()
    val dim = 60000
    for (i <- 0 until 4) {
      bomb(16 + i) = ((dim >> (24 - 8 * i)) & 0xFF).toByte
      bomb(20 + i) = ((dim >> (24 - 8 * i)) & 0xFF).toByte
    }
    val cases = Seq((1L, bomb), (2L, Multimodal.solidPng(4, 4, 1, 2, 3)))
      .toDF("media_id", "content")
    val byId = Multimodal.decodeImage(spark, cases).collect().map(f => f.media_id -> f).toMap
    assert(!byId(1L).decoded && byId(1L).width.isEmpty)   // capped, not decoded
    assert(byId(2L).decoded && byId(2L).width.contains(4)) // legit twin still fine
    // tight explicit cap rejects even the legit image
    val capped = Multimodal.decodeImage(spark, cases, maxPixels = 8L)
      .collect().map(f => f.media_id -> f).toMap
    assert(!capped(2L).decoded)
  }

  test("resizeImage: solid colors scale exactly; corrupt payloads fail soft") {
    val media = Seq(
      (1L, Multimodal.solidPng(40, 30, 255, 0, 0)),
      (2L, Multimodal.solidPng(3, 3, 128, 128, 128)), // UPSCALE path (3×3 → 8×8)
      (9L, Array[Byte](1, 2, 3))).toDF("media_id", "content")
    val out = Multimodal.resizeImage(spark, media, targetW = 8, targetH = 8)
      .collect().map(r => r.media_id -> r).toMap
    assert(out(1L).ok && out(1L).width.contains(8) && out(1L).height.contains(8))
    assert(math.abs(out(1L).mean_luma.get - 0.299) < 1e-3)
    assert(out(2L).ok && math.abs(out(2L).mean_luma.get - 128.0 / 255) < 1e-3)
    assert(out(1L).png_bytes.exists(_ > 0))
    assert(!out(9L).ok && out(9L).png_bytes.isEmpty)
    // the declared-dimension OOM guard holds on the resize path too
    val capped = Multimodal.resizeImage(spark,
      Seq((3L, Multimodal.solidPng(10, 10, 1, 2, 3))).toDF("media_id", "content"),
      8, 8, maxPixels = 8L).collect().head
    assert(!capped.ok)
  }

  test("audioMeta: WAV headers parse exactly, MP3 CBR estimates, junk fails honestly") {
    val rows = Seq(
      (1L, Multimodal.silentWav(44100, 2, 16, 44100)),        // exactly 1 s
      (2L, Multimodal.silentWav(16000, 1, 16, 8000)),         // 0.5 s mono
      (3L, Multimodal.fakeMp3(128, 44100, stereo = true, nFrames = 10)),
      (4L, Multimodal.fakeMp3(64, 32000, stereo = false, nFrames = 5, id3Bytes = 100)),
      (9L, "not audio".getBytes("UTF-8")),
      (10L, Array.empty[Byte])
    ).toDF("media_id", "content")
    val out = Multimodal.audioMeta(spark, rows).collect().map(r => r.media_id -> r).toMap
    assert(out(1L).decoded && out(1L).container.contains("wav") &&
      out(1L).sample_rate.contains(44100) && out(1L).channels.contains(2) &&
      out(1L).bits_per_sample.contains(16) && out(1L).duration_ms.contains(1000L))
    assert(out(2L).duration_ms.contains(500L) && out(2L).channels.contains(1))
    // mp3: frame size 144·128000/44100 = 417 B, 10 frames → 4170 B →
    // 4170·8/128 kbps = 260 ms (CBR estimate, floor)
    assert(out(3L).decoded && out(3L).container.contains("mp3") &&
      out(3L).sample_rate.contains(44100) && out(3L).channels.contains(2) &&
      out(3L).bits_per_sample.isEmpty && out(3L).duration_ms.contains(260L))
    // the ID3v2 tag is skipped via its sync-safe size, not scanned over
    assert(out(4L).decoded && out(4L).sample_rate.contains(32000) &&
      out(4L).channels.contains(1) && out(4L).duration_ms.contains(180L))
    assert(!out(9L).decoded && out(9L).container.isEmpty)
    assert(!out(10L).decoded)
  }

  test("frameSampleIndexes explodes every-Nth frame indexes") {
    val vids = Seq((1L, 2.0)).toDF("media_id", "duration_sec") // 2s @ 10fps = frames 0..19
    val out = Multimodal.frameSampleIndexes(vids, fps = 10.0, "duration_sec", everyNth = 5)
      .select("frame_index").as[Long].collect().sorted
    assert(out sameElements Array(0L, 5L, 10L, 15L))
  }
}
