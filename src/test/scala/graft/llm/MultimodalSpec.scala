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

  test("audioMeta: Xing VBR header yields the exact frame-count duration, not the CBR estimate") {
    val rows = Seq(
      // 500 frames × 1152 / 44100 = 13061 ms — the byte length (3 tiny
      // frames) would CBR-estimate ~78 ms, provably wrong for VBR
      (1L, Multimodal.fakeVbrMp3(44100, stereo = true, totalFrames = 500)),
      (2L, Multimodal.fakeVbrMp3(32000, stereo = false, totalFrames = 125)),
      // an Info tag without the frames flag falls back to CBR honestly
      (3L, {
        val b = Multimodal.fakeVbrMp3(44100, stereo = true, totalFrames = 500)
        val off = 4 + 32
        java.nio.ByteBuffer.wrap(b, off, 8).put("Info".getBytes("US-ASCII")).putInt(0)
        b
      })).toDF("media_id", "content")
    val out = Multimodal.audioMeta(spark, rows).collect().map(r => r.media_id -> r).toMap
    assert(out(1L).decoded && out(1L).duration_ms.contains(500L * 1152 * 1000 / 44100))
    assert(out(2L).duration_ms.contains(125L * 1152 * 1000 / 32000) &&
      out(2L).channels.contains(1))
    val cbrBytes = Multimodal.fakeMp3(128, 44100, stereo = true, nFrames = 3).length.toLong
    assert(out(3L).decoded && out(3L).duration_ms.contains(cbrBytes * 8 * 1000 / 128000))
  }

  test("audioMeta: corrupt RIFF chunk sizes terminate (no hang) and fail honestly") {
    // a chunk size field of 0xFFFFFFF8 made the old Int-arithmetic
    // advance ZERO — the walk pinned at the chunk forever; payloads are
    // untrusted, so the contract is decoded=false in bounded time
    def riffWithChunkSize(sz: Long): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(56)
        .put("WAVE".getBytes("US-ASCII"))
        .put("junk".getBytes("US-ASCII")).putInt(sz.toInt) // corrupt size
      b.array()
    }
    val rows = Seq(
      (1L, riffWithChunkSize(0xFFFFFFF8L)),  // advance would be exactly 0
      (2L, riffWithChunkSize(0xFFFFFFF7L)),  // odd: pad made it 0 too
      (3L, riffWithChunkSize(0x7FFFFFFFL)),  // Int-overflow advance
      (4L, Multimodal.silentWav(8000, 1, 8, 800))) // healthy control
      .toDF("media_id", "content")
    val out = Multimodal.audioMeta(spark, rows).collect().map(r => r.media_id -> r).toMap
    assert(!out(1L).decoded && !out(2L).decoded && !out(3L).decoded)
    assert(out(4L).decoded && out(4L).duration_ms.contains(100L))
  }

  test("videoMeta: MP4 moov/mvhd/tkhd parse exactly; junk and corrupt boxes fail honestly") {
    val rows = Seq(
      // 1000 ticks at timescale 600 → 1666 ms; 1920×1080 video + 1 audio track
      (1L, Multimodal.fakeMp4(600, 1000, Seq((1920, 1080)), audioTracks = 1)),
      // timescale 90000, 90000 ticks → exactly 1000 ms, single 640×480 track
      (2L, Multimodal.fakeMp4(90000, 90000, Seq((640, 480)))),
      // audio-only mp4: duration parses, no video dimensions
      (3L, Multimodal.fakeMp4(1000, 2500, Seq.empty, audioTracks = 2)),
      (9L, "not a video".getBytes("UTF-8")),
      (10L, Multimodal.silentWav(8000, 1, 8, 100)), // audio bytes are not mp4
      // corrupt: valid ftyp then a box whose size field is garbage —
      // the walk must stop, not loop or overflow
      (11L, {
        val good = Multimodal.fakeMp4(600, 600, Seq((8, 8)))
        val b = good.take(24) ++ Array[Byte](0xFF.toByte, 0xFF.toByte, 0xFF.toByte,
          0xF8.toByte) ++ "moov".getBytes("US-ASCII") ++ Array.fill[Byte](8)(0)
        b
      })).toDF("media_id", "content")
    val out = Multimodal.videoMeta(spark, rows).collect().map(r => r.media_id -> r).toMap
    assert(out(1L).decoded && out(1L).container.contains("mp4") &&
      out(1L).duration_ms.contains(1666L) && out(1L).width.contains(1920) &&
      out(1L).height.contains(1080) && out(1L).track_count.contains(2))
    assert(out(2L).duration_ms.contains(1000L) && out(2L).width.contains(640) &&
      out(2L).height.contains(480) && out(2L).track_count.contains(1))
    assert(out(3L).decoded && out(3L).duration_ms.contains(2500L) &&
      out(3L).width.isEmpty && out(3L).height.isEmpty && out(3L).track_count.contains(2))
    assert(!out(9L).decoded && !out(10L).decoded && !out(11L).decoded)
    // determinism (replay-stable features)
    val again = Multimodal.videoMeta(spark, rows).collect().map(r => r.media_id -> r).toMap
    assert(again == out)
  }

  test("videoMeta: 64-bit largesize and to-end (size=0) boxes parse; truncated largesize fails soft") {
    val base = Multimodal.fakeMp4(600, 1200, Seq((320, 240))) // 2000 ms
    val ftypLen = java.nio.ByteBuffer.wrap(base.take(4)).getInt
    val ftyp = base.take(ftypLen)
    val moov = base.drop(ftypLen) // [size:4]["moov"][content]
    val moovContent = moov.drop(8)
    // re-wrap moov with a 64-bit largesize header: size=1, type, u64 size
    def largesize(content: Array[Byte], typ: String): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(16 + content.length)
      bb.putInt(1).put(typ.getBytes("US-ASCII")).putLong(16L + content.length).put(content)
      bb.array()
    }
    // to-end moov: size=0 means the box extends to EOF
    val toEnd = {
      val bb = java.nio.ByteBuffer.allocate(8 + moovContent.length)
      bb.putInt(0).put("moov".getBytes("US-ASCII")).put(moovContent)
      bb.array()
    }
    val rows = Seq(
      (1L, ftyp ++ largesize(moovContent, "moov")),
      (2L, ftyp ++ toEnd),
      // largesize header truncated mid-u64: the walk must stop, honest fail
      (3L, ftyp ++ Array[Byte](0, 0, 0, 1) ++ "moov".getBytes("US-ASCII") ++
        Array[Byte](0, 0, 0))).toDF("media_id", "content")
    val out = Multimodal.videoMeta(spark, rows).collect().map(r => r.media_id -> r).toMap
    assert(out(1L).decoded && out(1L).duration_ms.contains(2000L) &&
      out(1L).width.contains(320) && out(1L).height.contains(240))
    assert(out(2L).decoded && out(2L).duration_ms.contains(2000L) &&
      out(2L).track_count.contains(1))
    assert(!out(3L).decoded)
  }

  test("videoMeta: crafted largesize near 2^63 cannot wrap the walk backwards (no hang)") {
    val base = Multimodal.fakeMp4(600, 1200, Seq((320, 240)))
    val ftypLen = java.nio.ByteBuffer.wrap(base.take(4)).getInt
    val ftyp = base.take(ftypLen)
    // size=1 box whose u64 largesize is 2^63-8: o + sz overflows Long to
    // a negative `next` that passes `next > end` — the walk must stop
    // (honest partial), not cycle or emit garbage bounds
    def evil(sz: Long): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(32)
      bb.putInt(1).put("moov".getBytes("US-ASCII")).putLong(sz)
      bb.put(Array.fill[Byte](16)(0x41))
      bb.array()
    }
    val rows = Seq(
      (1L, ftyp ++ evil(Long.MaxValue - 7L)), // overflow wrap
      (2L, ftyp ++ evil(Long.MinValue)),      // negative sz (< hdr guard)
      (3L, ftyp ++ evil(16L))                 // exact-header box: advances, parse fails soft
    ).toDF("media_id", "content")
    val fut = scala.concurrent.Future(
      Multimodal.videoMeta(spark, rows).collect())(scala.concurrent.ExecutionContext.global)
    val out = scala.concurrent.Await.result(fut, scala.concurrent.duration.Duration(60, "s"))
      .map(r => r.media_id -> r).toMap
    assert(out.values.forall(!_.decoded))
  }

  test("frameSampleIndexes explodes every-Nth frame indexes") {
    val vids = Seq((1L, 2.0)).toDF("media_id", "duration_sec") // 2s @ 10fps = frames 0..19
    val out = Multimodal.frameSampleIndexes(vids, fps = 10.0, "duration_sec", everyNth = 5)
      .select("frame_index").as[Long].collect().sorted
    assert(out sameElements Array(0L, 5L, 10L, 15L))
  }

  test("imagePhash: integer aHash/dHash over the decoded thumbnail — known split geometry") {
    // left half dark (20), right half bright (200): aHash sets exactly
    // the right-half block bits; dHash fires only at the dark→bright
    // column transition (bx=3) in every row
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) {
      val v = if (x < 8) 20 else 200
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val r = Multimodal.imagePhash(spark,
      Seq((1L, bos.toByteArray)).toDF("media_id", "content"), grid = 8)
      .collect().head
    assert(r.ok)
    val expectA = (0 until 8).flatMap(by => (4 until 8).map(bx => by * 8 + bx))
      .foldLeft(0L)((a, i) => a | (1L << i))
    assert(r.ahash.contains(expectA), s"ahash ${r.ahash} != $expectA")
    val expectD = (0 until 8).map(by => by * 7 + 3)
      .foldLeft(0L)((a, i) => a | (1L << i))
    assert(r.dhash.contains(expectD), s"dhash ${r.dhash} != $expectD")
  }

  test("audioFingerprint: integer energy-envelope bits from decoded PCM — known geometry") {
    // first half silent, second half full-scale: envelope bits set
    // exactly on the loud half's blocks
    val n = 2048
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(1.toShort).putInt(8000)
      .putInt(16000).putShort(2.toShort).putShort(16.toShort)
      .put("data".getBytes("US-ASCII")).putInt(2 * n)
    (0 until n).foreach(i => bb.putShort(if (i < n / 2) 0 else 20000))
    val r = Multimodal.audioFingerprint(spark,
      Seq((1L, bb.array())).toDF("media_id", "content")).collect().head
    assert(r.ok && r.n_samples.contains(n))
    val expect = (32 until 64).foldLeft(0L)((a, i) => a | (1L << i))
    assert(r.afp.contains(expect), s"afp ${r.afp} != $expect")
  }

  test("audioFingerprint near-dup: one perturbed sample stays within hamming 3; non-PCM fails soft") {
    val rows = Seq((1L, "w1", false), (2L, "w1", true), (3L, "w2", false))
      .toDF("doc_id", "seed", "pert")
    val media = Multimodal.syntheticPcmWav(spark, rows,
      "doc_id", "seed", "pert", nSamples = 2048)
    val h = Multimodal.audioFingerprint(spark, media).collect()
      .map(r => r.media_id -> r.afp.get).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1L), h(2L)) <= 3,
      s"perturbed twin drifted to hamming ${ham(h(1L), h(2L))}")
    assert(ham(h(1L), h(3L)) > 3, "unrelated streams must not read as near-dups")
    // exact copy hashes identically
    val twin = Multimodal.audioFingerprint(spark, Multimodal.syntheticPcmWav(
      spark, Seq((9L, "w1", false)).toDF("doc_id", "seed", "pert"),
      "doc_id", "seed", "pert", 2048)).collect().head
    assert(twin.afp.get == h(1L))
    // honest fallbacks: junk bytes, MP3 (no PCM to decode), >2-channel
    // WAV (no defined downmix), and a stream shorter than the block grid
    val bad = Seq(
      (90L, "not audio".getBytes("UTF-8")),
      (91L, Multimodal.fakeMp3(128, 44100, stereo = false, nFrames = 4)),
      (92L, Multimodal.silentWav(8000, channels = 3, bitsPerSample = 16, nSamples = 256)),
      (93L, Multimodal.silentWav(8000, channels = 1, bitsPerSample = 16, nSamples = 16)))
      .toDF("media_id", "content")
    val rs = Multimodal.audioFingerprint(spark, bad).collect()
    assert(rs.forall(r => !r.ok && r.afp.isEmpty), rs.mkString(","))
  }

  test("stereo WAV downmixes (l+r)/2 truncating toward zero; stereo twin fingerprints as its mono source") {
    // hand-built frames pin the ROUNDING: (3,4)→3 and (−3,−4)→−3 (Java
    // integer division truncates toward zero — floor would give −4)
    val frames = Seq((3, 4), (-3, -4), (100, 200), (-32768, -32768))
    val wav = Multimodal.silentWav(8000, channels = 2, bitsPerSample = 16,
      nSamples = frames.length)
    val bb = java.nio.ByteBuffer.wrap(wav, 44, 4 * frames.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    frames.foreach { case (l, r) => bb.putShort(l.toShort).putShort(r.toShort) }
    assert(Multimodal.wavPcm16MonoSamples(wav).get.toSeq ==
      Seq(3, -3, 150, -32768))
    // mono decode is bit-identical to the historical contract
    val mono = Multimodal.silentWav(8000, 1, 16, 3)
    java.nio.ByteBuffer.wrap(mono, 44, 6).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(7.toShort).putShort((-9).toShort).putShort(32767.toShort)
    assert(Multimodal.wavPcm16MonoSamples(mono).get.toSeq == Seq(7, -9, 32767))
    // the fixture's planted stereo twin (base±d frames, clamp at the
    // rim) fingerprints IDENTICALLY to the seed's mono stream — the
    // green-query property, asserted at the operator level
    val rows = Seq((1L, "w1", false, false), (2L, "w1", false, true))
      .toDF("doc_id", "seed", "pert", "st")
    val media = Multimodal.syntheticPcmWav(spark, rows,
      "doc_id", "seed", "pert", nSamples = 2048, stereoCol = "st")
    val h = Multimodal.audioFingerprint(spark, media).collect()
      .map(r => r.media_id -> r).toMap
    assert(h(1L).ok && h(2L).ok && h(1L).afp == h(2L).afp,
      s"stereo twin must hash as its mono downmix: ${h(1L).afp} vs ${h(2L).afp}")
    // and the stereo payload really is 2-channel with differing sides
    val meta = Multimodal.audioMeta(spark,
      media.filter(col("media_id") === 2L)).collect().head
    assert(meta.channels.contains(2))
  }

  test("dHash survives a vertical brightness ramp that breaks aHash") {
    // same seed, one row ramped +5·y (base range 0..179 keeps every
    // pixel ≤ 254 — no wrap): horizontal neighbor order is untouched,
    // so dHash is bit-identical, while the mean-relative aHash flips
    val rows = Seq((1L, "rb", false, 0L), (2L, "rb", false, 5L))
      .toDF("doc_id", "seed", "pert", "ramp")
    val media = Multimodal.syntheticGrayMedia(spark, rows,
      "doc_id", "seed", "pert", 16, 16, valueMod = 180, rampCol = "ramp")
    val h = Multimodal.imagePhash(spark, media).collect()
      .map(r => r.media_id -> r).toMap
    assert(h(1L).dhash == h(2L).dhash,
      s"ramp must not move dHash: ${h(1L).dhash} vs ${h(2L).dhash}")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1L).ahash.get, h(2L).ahash.get) > 3,
      "the ramp must break the mean-relative aHash (else the query proves nothing)")
    // a wrapping ramp refuses loudly instead of scrambling neighbor order
    val wrap = Seq((3L, "rb", false, 20L)).toDF("doc_id", "seed", "pert", "ramp")
    intercept[org.apache.spark.SparkException] {
      Multimodal.syntheticGrayMedia(spark, wrap,
        "doc_id", "seed", "pert", 16, 16, valueMod = 180, rampCol = "ramp")
        .collect()
    }
  }

  test("imagePhash near-dup: a one-pixel perturbation stays within hamming 3; distinct images are far") {
    val rows = Seq((1L, "s1", false), (2L, "s1", true), (3L, "s2", false))
      .toDF("doc_id", "seed", "pert")
    val media = Multimodal.syntheticGrayMedia(spark, rows,
      "doc_id", "seed", "pert", 16, 16)
    val h = Multimodal.imagePhash(spark, media).collect()
      .map(r => r.media_id -> r.ahash.get).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1L), h(2L)) <= 3,
      s"perturbed twin drifted to hamming ${ham(h(1L), h(2L))}")
    assert(ham(h(1L), h(3L)) > 3 && ham(h(2L), h(3L)) > 3,
      "unrelated images must not read as near-dups")
    // an exact copy (same seed, unperturbed) hashes identically
    val twin = Multimodal.imagePhash(spark, Multimodal.syntheticGrayMedia(
      spark, Seq((9L, "s1", false)).toDF("doc_id", "seed", "pert"),
      "doc_id", "seed", "pert", 16, 16)).collect().head
    assert(twin.ahash.get == h(1L))
    // non-decodable payloads and sub-grid images surface as ok=false
    val bad = Multimodal.imagePhash(spark,
      Seq((90L, "not an image".getBytes("UTF-8"))).toDF("media_id", "content"))
      .collect().head
    assert(!bad.ok && bad.ahash.isEmpty && bad.dhash.isEmpty)
    val tiny = Multimodal.imagePhash(spark,
      Seq((91L, Multimodal.solidPng(4, 4, 10, 10, 10))).toDF("media_id", "content"),
      grid = 8).collect().head
    assert(!tiny.ok)
  }

  /** Hand-built mono Y4M: header + per-frame `FRAME\n` + raw luma. */
  private def monoY4m(w: Int, h: Int, frames: Seq[Array[Int]],
                      header: String = ""): Array[Byte] = {
    val hd = (if (header.nonEmpty) header
              else s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 Cmono\n").getBytes("US-ASCII")
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(hd)
    frames.foreach { f =>
      bos.write("FRAME\n".getBytes("US-ASCII"))
      f.foreach(v => bos.write(v & 0xFF))
    }
    bos.toByteArray
  }

  test("videoFingerprint: temporal envelope bits from decoded Y4M luma — known geometry") {
    // 8 frames of a 2×2 mono stream: first half dark (10), second half
    // bright (200) — envelope bits set exactly on the bright half
    val frames = (0 until 8).map(f => Array.fill(4)(if (f < 4) 10 else 200))
    val r = Multimodal.videoFingerprint(spark,
      Seq((1L, monoY4m(2, 2, frames))).toDF("media_id", "content"),
      blocks = 8).collect().head
    assert(r.ok && r.n_frames.contains(8) &&
      r.width.contains(2) && r.height.contains(2))
    val expect = (4 until 8).foldLeft(0L)((a, i) => a | (1L << i))
    assert(r.vfp.contains(expect), s"vfp ${r.vfp} != $expect")
  }

  test("videoFingerprint reads only the luma plane: 4:2:0 and 4:4:4 twins hash like mono") {
    val frames = (0 until 8).map(f => Array.fill(4)(if (f < 4) 10 else 200))
    def withChroma(cs: String, chromaBytesPerFrame: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(s"YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C$cs\n".getBytes("US-ASCII"))
      frames.foreach { f =>
        bos.write("FRAME\n".getBytes("US-ASCII"))
        f.foreach(v => bos.write(v & 0xFF))
        (0 until chromaBytesPerFrame).foreach(i => bos.write((i * 37 + 5) & 0xFF))
      }
      bos.toByteArray
    }
    val media = Seq(
      (1L, monoY4m(2, 2, frames)),
      (2L, withChroma("420", 2)),  // (2/2)·(2/2)·2 chroma bytes
      (3L, withChroma("444", 8))   // 2·2·2 chroma bytes
    ).toDF("media_id", "content")
    val fps = Multimodal.videoFingerprint(spark, media, blocks = 8).collect()
      .map(r => r.media_id -> r).toMap
    assert(fps.values.forall(_.ok))
    assert(fps(2L).vfp == fps(1L).vfp && fps(3L).vfp == fps(1L).vfp,
      "chroma bytes must not leak into the luma fingerprint")
  }

  test("videoFingerprint near-dup: one perturbed pixel stays within hamming 3; fallbacks honest") {
    val rows = Seq((1L, "v1", 0L, false), (2L, "v1", 0L, true), (3L, "v2", 0L, false))
      .toDF("doc_id", "seed", "off", "pert")
    val media = Multimodal.syntheticY4m(spark, rows,
      "doc_id", "seed", "off", "pert", width = 4, height = 4, nFrames = 64)
    val h = Multimodal.videoFingerprint(spark, media).collect()
      .map(r => r.media_id -> r.vfp.get).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1L), h(2L)) <= 3,
      s"perturbed twin drifted to hamming ${ham(h(1L), h(2L))}")
    assert(ham(h(1L), h(3L)) > 3, "unrelated streams must not read as near-dups")
    // exact copy (same seed, offset 0, unperturbed) hashes identically
    val twin = Multimodal.videoFingerprint(spark, Multimodal.syntheticY4m(
      spark, Seq((9L, "v1", 0L, false)).toDF("doc_id", "seed", "off", "pert"),
      "doc_id", "seed", "off", "pert", 4, 4, 64)).collect().head
    assert(twin.vfp.get == h(1L))
    // honest fallbacks: junk, wrong magic, odd-dimension 4:2:0, unknown
    // colorspace, fewer frames than blocks
    val dark = Array.fill(4)(10)
    val bad = Seq(
      (90L, "not a video".getBytes("UTF-8")),
      (91L, monoY4m(2, 2, Seq(dark), header = "YUV4MPEG3 W2 H2 F25:1 Cmono\n")),
      (92L, monoY4m(3, 3, Seq(Array.fill(9)(10)),
        header = "YUV4MPEG2 W3 H3 F25:1 C420\n")),
      (93L, monoY4m(2, 2, Seq(dark), header = "YUV4MPEG2 W2 H2 F25:1 C411\n")),
      (94L, monoY4m(2, 2, (0 until 8).map(_ => dark))) // 8 frames < 64 blocks
    ).toDF("media_id", "content")
    val rs = Multimodal.videoFingerprint(spark, bad).collect()
    assert(rs.forall(r => !r.ok && r.vfp.isEmpty), rs.mkString(","))
    // a truncated trailing frame is dropped; the complete prefix keeps
    // its meaning (n_frames counts only whole frames)
    val full = monoY4m(2, 2, (0 until 9).map(_ => dark))
    val cut = java.util.Arrays.copyOf(full, full.length - 2)
    val partial = Multimodal.videoFingerprint(spark,
      Seq((95L, cut)).toDF("media_id", "content"), blocks = 8).collect().head
    assert(partial.ok && partial.n_frames.contains(8))
    // MID-STREAM corruption is NOT truncation: garbage where a FRAME
    // marker should sit makes every later boundary guesswork, so the
    // payload refuses outright instead of fingerprinting as a valid
    // shorter video (truncation keeps the complete prefix; corruption
    // keeps nothing)
    val corrupt = full.clone()
    val hdrLen = new String(full, "ISO-8859-1").indexOf('\n') + 1
    val frameBytes = 6 + 4 // "FRAME\n" + 2x2 mono luma
    corrupt(hdrLen + 2 * frameBytes) = 'X'.toByte // garbage at frame 2's marker
    val broken = Multimodal.videoFingerprint(spark,
      Seq((96L, corrupt)).toDF("media_id", "content"), blocks = 2).collect().head
    assert(!broken.ok && broken.vfp.isEmpty,
      "mid-stream marker garbage must refuse, not truncate")
  }

  test("videoFramePhash: per-frame aHash with known split geometry; everyNth samples") {
    // frame 0: left half dark / right bright; frame 1 inverted; frames
    // 2,3 repeat — 8×8 at grid 8 makes bit i = pixel i > frame mean
    def split(leftDark: Boolean): Array[Int] =
      (0 until 64).map { i => val x = i % 8
        if ((x < 4) == leftDark) 20 else 200 }.toArray
    val frames = Seq(split(true), split(false), split(true), split(false))
    val rows = Multimodal.videoFramePhash(spark,
      Seq((1L, monoY4m(8, 8, frames))).toDF("media_id", "content"),
      grid = 8, everyNth = 2).collect().sortBy(_.frame_index)
    assert(rows.map(_.frame_index).toSeq == Seq(0, 2), "everyNth=2 keeps frames 0 and 2")
    val rightBits = (0 until 64).filter(i => i % 8 >= 4)
      .foldLeft(0L)((a, i) => a | (1L << i))
    assert(rows.forall(_.fhash == rightBits), rows.mkString(","))
    // undecodable payloads emit no rows (flatMap, not fake signatures)
    assert(Multimodal.videoFramePhash(spark,
      Seq((2L, "junk".getBytes("UTF-8"))).toDF("media_id", "content")).isEmpty)
  }

  test("frameClipPairs finds an embedded clip at its one consistent offset; df cap drops stop-hashes") {
    // base (1) = frames 0..23 of seed c1; clip (2) = frames 7..30 of c1
    // (17 aligned matches at offset 7); 3 is unrelated; 4 = exact copy
    // of the base
    val rows = Seq((1L, "c1", 0L, false), (2L, "c1", 7L, false),
      (3L, "c2", 0L, false), (4L, "c1", 0L, false))
      .toDF("doc_id", "seed", "off", "pert")
    val media = Multimodal.syntheticY4m(spark, rows,
      "doc_id", "seed", "off", "pert", width = 8, height = 8, nFrames = 24)
    val frames = Multimodal.videoFramePhash(spark, media, grid = 8).toDF()
    val pairs = Dedup.frameClipPairs(frames, "media_id", "frame_index",
        "fhash", minFrames = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // (1,2) and (2,4) align at ±7; (1,4) aligns everywhere at offset 0
    assert(pairs == Set((1L, 2L, 7L, 17L), (2L, 4L, -7L, 17L), (1L, 4L, 0L, 24L)),
      pairs.toString)
    // df cap 2: frames 7..23 of the base stream occur in docs 1, 2 AND 4
    // (df 3 → stop-hashes, dropped); frames 0..6 occur only in 1 and 4 —
    // the (1,4) pair keeps exactly that evidence, (1,2) loses all of it
    val capped = Dedup.frameClipPairs(frames, "media_id", "frame_index",
        "fhash", minFrames = 5, maxHashDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(capped == Set((1L, 4L, 0L, 7L)), capped.toString)
  }
}
