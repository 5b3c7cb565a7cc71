package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video carried as opaque
  * `binary` columns with typed metadata alongside (the lakehouse pattern —
  * content-addressed bytes + extracted features as ordinary columns).
  *
  * Everything metadata-level (size, fingerprint, container format from
  * magic bytes) is pure `Column` expressions over the binary — codegen,
  * pushdown-friendly, scales as a narrow map. The actual pixel/sample
  * decode needs a native library that is NOT in this container, so
  * [[decodeImageStub]] ships the real Spark plumbing (typed row shape,
  * mapPartitions batching, encoder) around a clearly-marked deterministic
  * fake; swapping in a real decoder changes one function body, not the
  * pipeline.
  */
object Multimodal {

  /** The typed media row: opaque payload + declared metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),      // image | audio | video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("filename", StringType, nullable = true),
      StructField("declared_format", StringType, nullable = true))), nullable = true)))

  /** Container format sniffed from magic bytes — real, decode-free feature
    * extraction over the binary column. */
  def sniffFormat(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val magic8 = hex(substring(content, 1, 8))
    val magic4 = hex(substring(content, 1, 4))
    val magic3 = hex(substring(content, 1, 3))
    when(content.isNull, lit(null).cast(StringType))
      .when(magic8 === "89504E470D0A1A0A", "png")
      .when(magic3 === "FFD8FF", "jpeg")
      .when(magic4 === "47494638", "gif")
      .when(magic4 === "52494646", "riff")        // wav/avi/webp container
      .when(magic4 === "664C6143", "flac")
      .when(hex(substring(content, 5, 4)) === "66747970", "mp4")
      .otherwise("unknown")
  }

  /** Decode-free metadata extraction: byte size, 64-bit content
    * fingerprint, sniffed format. */
  def extractMeta(media: DataFrame, contentCol: String = "content"): DataFrame =
    media
      .withColumn("byte_size", when(col(contentCol).isNull, 0L).otherwise(length(col(contentCol)).cast(LongType)))
      .withColumn("content_hash", xxhash64(col(contentCol)))
      .withColumn("format", sniffFormat(col(contentCol)))

  /** Decoded-image feature row produced by the decode stage. `decoded =
    * false` (all features None) marks payloads no available codec accepts —
    * the honest fallback instead of fake features. */
  final case class ImageFeatures(media_id: Long, decoded: Boolean,
                                 width: Option[Int], height: Option[Int],
                                 channels: Option[Int], mean_luma: Option[Double])

  /** REAL image decode via `javax.imageio` (PNG/JPEG/GIF/BMP ship in the
    * JDK — no native library needed): width, height, raster band count,
    * and Rec.601 mean luma over the sRGB-converted pixels. Runs inside
    * `mapPartitions` so a heavier codec set initializes once per partition
    * and rows stream — nothing collects. Exotic codecs (no ImageIO reader)
    * come back `decoded = false` rather than fabricated.
    *
    * Per-pixel `getRGB` keeps the luma deterministic across platforms
    * (ImageIO converts any color model to sRGB ints); a throughput-tuned
    * variant would read the raster buffer directly per color-model.
    *
    * Payloads are UNTRUSTED (landing-directory files): the header is read
    * first via `ImageReader.getWidth/getHeight` — which parses only
    * metadata — and anything declaring more than `maxPixels` is rejected
    * as `decoded = false` BEFORE `ImageIO.read` would allocate
    * width×height pixels. A crafted 100-byte PNG declaring 2^31×2^31
    * therefore cannot OOM the executor. */
  /** Guarded decode shared by [[decodeImage]] and [[resizeImage]]: the
    * header-declared dimension check runs BEFORE `reader.read` would
    * allocate width×height pixels, so a crafted tiny payload declaring
    * 2^31×2^31 cannot OOM the executor. Any failure → null. */
  private def readGuarded(bytes: Array[Byte], cap: Long): java.awt.image.BufferedImage =
    try {
      if (bytes == null || bytes.isEmpty) null
      else {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) null
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis)
              val dw = reader.getWidth(0).toLong
              val dh = reader.getHeight(0).toLong
              if (dw <= 0 || dh <= 0 || dw * dh > cap) null
              else reader.read(0)
            } finally reader.dispose()
          }
        } finally if (iis != null) iis.close()
      }
    } catch { case _: Exception => null }

  def decodeImage(spark: SparkSession, media: DataFrame,
                  maxPixels: Long = 64L * 1024 * 1024): Dataset[ImageFeatures] = {
    import spark.implicits._
    val cap = maxPixels
    media.select(col("media_id").cast(LongType), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = readGuarded(bytes, cap)
          if (img == null) ImageFeatures(id, decoded = false, None, None, None, None)
          else {
            val w = img.getWidth; val h = img.getHeight
            var sum = 0.0; var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                sum += 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
                       0.114 * (rgb & 0xFF)
                x += 1
              }
              y += 1
            }
            ImageFeatures(id, decoded = true, Some(w), Some(h),
              Some(img.getRaster.getNumBands),
              Some(sum / (w.toLong * h) / 255.0))
          }
        }
      }
  }

  /** Deterministic solid-color PNG bytes — planted test media whose decoded
    * features are knowable in advance (PNG is lossless, so a solid (r,g,b)
    * decodes back to exactly (r,g,b) and mean luma is the color's luma). */
  def solidPng(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < height) { var x = 0; while (x < width) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Parsed audio header row. `decoded = false` (all fields None) marks
    * payloads that are not a recognizable WAV/MP3 stream — the same
    * honest fallback as [[ImageFeatures]]. `bits_per_sample` is
    * PCM-only (None for MP3); `duration_ms` is exact for WAV (data
    * bytes / byte rate) and a constant-bitrate estimate for MP3
    * (stream bytes × 8 / frame-header bitrate — the standard CBR
    * estimate; VBR needs a Xing table, which is a decode-level
    * concern). */
  final case class AudioFeatures(media_id: Long, decoded: Boolean,
                                 container: Option[String], sample_rate: Option[Int],
                                 channels: Option[Int], bits_per_sample: Option[Int],
                                 duration_ms: Option[Long])

  private def leInt(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
  private def leShort(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def ascii(b: Array[Byte], o: Int, n: Int): String =
    new String(b, o, n, "US-ASCII")

  /** RIFF/WAVE header walk: chunk list from offset 12, `fmt ` gives
    * (format, channels, sample rate, byte rate, bits), `data` gives the
    * payload size the exact duration derives from. Truncated or
    * non-RIFF bytes → None. HEADER-ONLY — sample data is never
    * touched, so cost is O(1) per row regardless of payload size. */
  private def parseWav(id: Long, b: Array[Byte]): Option[AudioFeatures] = {
    if (b.length < 44 || ascii(b, 0, 4) != "RIFF" || ascii(b, 8, 4) != "WAVE") return None
    var o = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // channels, sampleRate, byteRate, bits
    var dataSize: Option[Long] = None
    while (o + 8 <= b.length && (fmt.isEmpty || dataSize.isEmpty)) {
      val cid = ascii(b, o, 4); val sz = leInt(b, o + 4).toLong & 0xFFFFFFFFL
      if (cid == "fmt " && o + 24 <= b.length)
        fmt = Some((leShort(b, o + 10), leInt(b, o + 12), leInt(b, o + 16), leShort(b, o + 22)))
      if (cid == "data") dataSize = Some(sz)
      // advance in LONG arithmetic: a corrupt size field near 2^32
      // truncated to Int made the old `8 + sz.toInt` advance zero or
      // negative — the walk pinned at `o` forever on adversarial bytes
      // (payloads are untrusted landing-dir content; the contract is
      // decoded=false, never a hang). Chunks are word-aligned.
      val next = o.toLong + 8L + sz + (sz & 1L)
      o = if (next > Int.MaxValue.toLong) b.length else next.toInt
    }
    for ((ch, sr, byteRate, bits) <- fmt; ds <- dataSize
         if ch > 0 && sr > 0 && byteRate > 0)
      yield AudioFeatures(id, decoded = true, Some("wav"), Some(sr), Some(ch),
        Some(bits), Some(ds * 1000L / byteRate))
  }

  private val Mp3BitrateKbpsV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
  private val Mp3SampleRateV1 = Array(44100, 48000, 32000, 0)

  /** MPEG-1 Layer III frame-header parse after an optional ID3v2 skip
    * (tag size is sync-safe 7-bit bytes). Yields sample rate, channel
    * mode, and the duration: EXACT when the first frame carries a
    * Xing/Info VBR header (frame count × 1152 samples ÷ rate — the
    * standard VBR contract; the CBR byte estimate is wrong on VBR
    * streams, sometimes by 2×), otherwise the standard CBR estimate
    * streamBytes×8/bitrate. Anything but a clean 0xFFE sync at the
    * expected offset → None. */
  private def parseMp3(id: Long, b: Array[Byte]): Option[AudioFeatures] = {
    var o = 0
    if (b.length >= 10 && ascii(b, 0, 3) == "ID3") {
      val tagSize = ((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
        ((b(8) & 0x7F) << 7) | (b(9) & 0x7F)
      o = 10 + tagSize
    }
    if (o + 4 > b.length) return None
    val h0 = b(o) & 0xFF; val h1 = b(o + 1) & 0xFF
    val h2 = b(o + 2) & 0xFF; val h3 = b(o + 3) & 0xFF
    // sync + MPEG-1 (bits 4-3 = 11) + Layer III (bits 2-1 = 01)
    if (h0 != 0xFF || (h1 & 0xFE) != 0xFA) return None
    val bitrateKbps = Mp3BitrateKbpsV1L3((h2 >> 4) & 0xF)
    val sampleRate = Mp3SampleRateV1((h2 >> 2) & 0x3)
    if (bitrateKbps == 0 || sampleRate == 0) return None
    val channels = if (((h3 >> 6) & 0x3) == 3) 1 else 2 // mode 3 = single channel
    // Xing/Info header sits after the side info: 17 bytes (mono) / 32
    // (stereo) past the 4-byte frame header for MPEG-1
    val xingOff = o + 4 + (if (channels == 1) 17 else 32)
    val vbrDur: Option[Long] =
      if (xingOff + 12 <= b.length &&
          (ascii(b, xingOff, 4) == "Xing" || ascii(b, xingOff, 4) == "Info") &&
          (beInt(b, xingOff + 4) & 0x1) != 0) {
        val frames = beInt(b, xingOff + 8).toLong & 0xFFFFFFFFL
        Some(frames * 1152L * 1000L / sampleRate) // 1152 samples per MPEG-1 L3 frame
      } else None
    val streamBytes = (b.length - o).toLong
    Some(AudioFeatures(id, decoded = true, Some("mp3"), Some(sampleRate),
      Some(channels), None,
      Some(vbrDur.getOrElse(streamBytes * 8L * 1000L / (bitrateKbps * 1000L)))))
  }

  /** Audio header metadata over opaque binary payloads — WAV exactly,
    * MP3 as the standard CBR estimate, anything else `decoded = false`.
    * mapPartitions like the image path: per-row imperative byte walks
    * with O(1) state, streaming — never collects, never reads past the
    * header bytes it needs. */
  def audioMeta(spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.select(col("media_id").cast(LongType), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val parsed =
            if (bytes == null || bytes.length < 4) None
            else try parseWav(id, bytes).orElse(parseMp3(id, bytes))
                 catch { case _: Exception => None }
          parsed.getOrElse(AudioFeatures(id, decoded = false, None, None, None, None, None))
        }
      }
  }

  /** Deterministic silent PCM WAV — planted test audio whose header
    * metadata (and exact duration) is knowable in advance, the audio
    * twin of [[solidPng]]. */
  def silentWav(sampleRate: Int, channels: Int, bitsPerSample: Int,
                nSamples: Int): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val dataSize = nSamples * blockAlign
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign).putShort(blockAlign.toShort)
      .putShort(bitsPerSample.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    bb.array()
  }

  /** Deterministic CBR MPEG-1 Layer III byte stream (frame headers +
    * zero payload, optionally behind an ID3v2 tag) — planted MP3 whose
    * estimated duration is exactly streamBytes×8/bitrate. */
  def fakeMp3(bitrateKbps: Int, sampleRate: Int, stereo: Boolean,
              nFrames: Int, id3Bytes: Int = 0): Array[Byte] = {
    val bIdx = Mp3BitrateKbpsV1L3.indexOf(bitrateKbps)
    val sIdx = Mp3SampleRateV1.indexOf(sampleRate)
    require(bIdx > 0 && sIdx >= 0 && sIdx < 3, "not a valid MPEG-1 L3 rate pair")
    val frameSize = 144 * bitrateKbps * 1000 / sampleRate
    val tag =
      if (id3Bytes == 0) Array.empty[Byte]
      else {
        val t = new Array[Byte](10 + id3Bytes)
        t(0) = 'I'; t(1) = 'D'; t(2) = '3'; t(3) = 4
        t(6) = ((id3Bytes >> 21) & 0x7F).toByte; t(7) = ((id3Bytes >> 14) & 0x7F).toByte
        t(8) = ((id3Bytes >> 7) & 0x7F).toByte; t(9) = (id3Bytes & 0x7F).toByte
        t
      }
    val frames = new Array[Byte](frameSize * nFrames)
    var f = 0
    while (f < nFrames) {
      val o = f * frameSize
      frames(o) = 0xFF.toByte; frames(o + 1) = 0xFB.toByte
      frames(o + 2) = ((bIdx << 4) | (sIdx << 2)).toByte
      frames(o + 3) = (if (stereo) 0x00 else 0xC0).toByte
      f += 1
    }
    tag ++ frames
  }

  /** Deterministic VBR MPEG-1 Layer III stream: a first frame carrying
    * a Xing header declaring `totalFrames`, then zero-payload frames —
    * planted VBR audio whose exact duration (totalFrames × 1152 /
    * sampleRate) is knowable in advance; the stream's BYTE length is
    * deliberately inconsistent with it, so a CBR estimate would be
    * provably wrong. */
  def fakeVbrMp3(sampleRate: Int, stereo: Boolean, totalFrames: Int,
                 declaredKbps: Int = 128): Array[Byte] = {
    val base = fakeMp3(declaredKbps, sampleRate, stereo, nFrames = 3)
    val out = base.clone()
    val xingOff = 4 + (if (stereo) 32 else 17)
    require(xingOff + 12 <= out.length, "first frame too small for a Xing header")
    val bb = java.nio.ByteBuffer.wrap(out, xingOff, 12)
    bb.put("Xing".getBytes("US-ASCII")).putInt(0x1).putInt(totalFrames)
    out
  }

  /** Parsed MP4 container metadata row — the video twin of
    * [[AudioFeatures]]. `decoded = false` marks payloads that are not a
    * recognizable ISO-BMFF stream. `duration_ms` comes from
    * `moov/mvhd` (movie duration ÷ timescale); `width`/`height` are the
    * FIRST video track's `tkhd` presentation size (16.16 fixed-point;
    * audio tracks declare 0×0 and are skipped); `track_count` counts
    * `trak` boxes. Header-only like the audio path — sample data
    * (`mdat`) is never touched, so cost is O(boxes), not O(payload). */
  final case class VideoFeatures(media_id: Long, decoded: Boolean,
                                 container: Option[String], duration_ms: Option[Long],
                                 width: Option[Int], height: Option[Int],
                                 track_count: Option[Int])

  private def beInt(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) | ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)
  private def beLong(b: Array[Byte], o: Int): Long =
    (beInt(b, o).toLong << 32) | (beInt(b, o + 4).toLong & 0xFFFFFFFFL)

  /** ISO-BMFF box walk over `[start, end)`: (type, content start,
    * content end) per box, honoring 64-bit `largesize` (size==1) and
    * to-end boxes (size==0). Long-arithmetic advance with a strict
    * progress check — corrupt size fields STOP the walk (honest
    * partial) instead of pinning or overflowing, the same untrusted-
    * payload discipline as [[parseWav]]. */
  private def mp4Boxes(b: Array[Byte], start: Int, end: Int): Seq[(String, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var o = start
    while (o + 8 <= end) {
      val sz32 = beInt(b, o).toLong & 0xFFFFFFFFL
      val typ = ascii(b, o + 4, 4)
      var hdr = 8L; var sz = sz32
      if (sz32 == 1L) {
        if (o + 16 > end) return out.toSeq
        sz = beLong(b, o + 8); hdr = 16L
      } else if (sz32 == 0L) sz = (end - o).toLong
      // a crafted 64-bit largesize near 2^63 overflows `o + sz` to a
      // negative `next` that passes `next > end` and jumps the walk
      // backwards on toInt — `next <= o` rejects any non-advancing or
      // wrapped offset, restoring the strict-progress contract
      val next = o.toLong + sz
      if (sz < hdr || next <= o || next > end) return out.toSeq
      out += ((typ, (o + hdr).toInt, next.toInt))
      o = next.toInt
    }
    out.toSeq
  }

  /** `moov`-level header parse: `mvhd` (v0/v1) yields the movie
    * duration; each `trak`'s `tkhd` yields its 16.16 presentation
    * size. No `ftyp`+`moov`, or an unusable `mvhd` → None. */
  private def parseMp4(id: Long, b: Array[Byte]): Option[VideoFeatures] = {
    if (b.length < 12 || ascii(b, 4, 4) != "ftyp") return None
    val top = mp4Boxes(b, 0, b.length)
    val moov = top.collectFirst { case ("moov", s, e) => (s, e) }.getOrElse(return None)
    val inMoov = mp4Boxes(b, moov._1, moov._2)
    val dur = inMoov.collectFirst { case ("mvhd", s, e) =>
      val v = b(s) & 0xFF
      if (v == 0 && e - s >= 20) {
        val ts = beInt(b, s + 12).toLong & 0xFFFFFFFFL
        val d = beInt(b, s + 16).toLong & 0xFFFFFFFFL
        if (ts > 0) Some(d * 1000L / ts) else None
      } else if (v == 1 && e - s >= 32) {
        val ts = beInt(b, s + 20).toLong & 0xFFFFFFFFL
        val d = beLong(b, s + 24)
        if (ts > 0 && d >= 0) Some(d * 1000L / ts) else None
      } else None
    }.flatten
    if (dur.isEmpty) return None
    val traks = inMoov.filter(_._1 == "trak")
    val wh = traks.iterator.flatMap { case (_, s, e) =>
      mp4Boxes(b, s, e).collectFirst { case ("tkhd", ts, te) =>
        val v = b(ts) & 0xFF
        val whOff = if (v == 1) 88 else 76 // fixed tkhd field layout per version
        if (te - ts >= whOff + 8) {
          val w = beInt(b, ts + whOff) >>> 16; val h = beInt(b, ts + whOff + 4) >>> 16
          if (w > 0 && h > 0) Some((w, h)) else None
        } else None
      }.flatten
    }.nextOption()
    Some(VideoFeatures(id, decoded = true, Some("mp4"), dur,
      wh.map(_._1), wh.map(_._2), Some(traks.size)))
  }

  /** Video container metadata over opaque binary payloads — MP4/ISO-BMFF
    * headers exactly, anything else `decoded = false`. Same shape and
    * justification as [[audioMeta]]: per-row imperative byte walks with
    * O(1) state inside mapPartitions, streaming, header-only. */
  def videoMeta(spark: SparkSession, media: DataFrame): Dataset[VideoFeatures] = {
    import spark.implicits._
    media.select(col("media_id").cast(LongType), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val parsed =
            if (bytes == null || bytes.length < 12) None
            else try parseMp4(id, bytes) catch { case _: Exception => None }
          parsed.getOrElse(VideoFeatures(id, decoded = false, None, None, None, None, None))
        }
      }
  }

  /** Deterministic minimal ISO-BMFF bytes (`ftyp` + `moov` with `mvhd`
    * and one `trak`/`tkhd` per track; no media data) — planted test
    * video whose header metadata is knowable in advance, the video twin
    * of [[silentWav]]. `videoTracks` are (width, height) pairs;
    * `audioTracks` adds that many 0×0 tracks. */
  def fakeMp4(timescale: Int, durationTicks: Int, videoTracks: Seq[(Int, Int)],
              audioTracks: Int = 0): Array[Byte] = {
    def box(typ: String, content: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + content.length)
      bb.putInt(8 + content.length).put(typ.getBytes("US-ASCII")).put(content)
      bb.array()
    }
    val ftyp = box("ftyp", {
      val bb = java.nio.ByteBuffer.allocate(16)
      bb.put("isom".getBytes("US-ASCII")).putInt(512)
        .put("isom".getBytes("US-ASCII")).put("iso2".getBytes("US-ASCII"))
      bb.array()
    })
    val mvhd = box("mvhd", {
      val bb = java.nio.ByteBuffer.allocate(100) // v0 mvhd content is exactly 100 bytes
      bb.putInt(0)                               // version 0 + flags
        .putInt(0).putInt(0)                     // creation, modification
        .putInt(timescale).putInt(durationTicks)
        .putInt(0x00010000)                      // rate 1.0
      bb.position(36)                            // identity matrix
      bb.putInt(0x00010000).putInt(0).putInt(0)
        .putInt(0).putInt(0x00010000).putInt(0)
        .putInt(0).putInt(0).putInt(0x40000000)
      bb.position(96); bb.putInt(videoTracks.size + audioTracks + 1) // next track id
      bb.array()
    })
    def trak(trackId: Int, w: Int, h: Int): Array[Byte] =
      box("trak", box("tkhd", {
        val bb = java.nio.ByteBuffer.allocate(84) // v0 tkhd content is exactly 84 bytes
        bb.putInt(7)                              // version 0, flags: enabled|in-movie|in-preview
          .putInt(0).putInt(0)                    // creation, modification
          .putInt(trackId).putInt(0)              // track id, reserved
          .putInt(durationTicks)
        bb.position(40)                           // identity matrix
        bb.putInt(0x00010000).putInt(0).putInt(0)
          .putInt(0).putInt(0x00010000).putInt(0)
          .putInt(0).putInt(0).putInt(0x40000000)
        bb.putInt(w << 16).putInt(h << 16)        // 16.16 fixed-point presentation size
        bb.array()
      }))
    val traks = videoTracks.zipWithIndex.map { case ((w, h), i) => trak(i + 1, w, h) } ++
      (0 until audioTracks).map(i => trak(videoTracks.size + i + 1, 0, 0))
    val moov = box("moov", (mvhd +: traks).reduce(_ ++ _))
    ftyp ++ moov
  }

  /** Frame-sampling plumbing for video: every Nth frame index up to a
    * duration — the explode shape a real frame extractor feeds. */
  def frameSampleIndexes(media: DataFrame, fps: Double, durationSecCol: String,
                         everyNth: Int): DataFrame =
    media.withColumn("frame_index",
      explode(sequence(lit(0L),
        greatest((col(durationSecCol) * fps).cast(LongType) - 1, lit(0L)),
        lit(everyNth.toLong))))

  final case class ResizedImage(media_id: Long, ok: Boolean,
                                width: Option[Int], height: Option[Int],
                                mean_luma: Option[Double], png_bytes: Option[Int])

  /** REAL image resize (the thumbnail/normalize step of a vision-data
    * pipeline): guarded decode, nearest-neighbor scale to
    * `targetW`×`targetH` (deterministic — no interpolation kernel to
    * disagree about; for the planted solid-color media EVERY kernel
    * agrees exactly anyway), PNG re-encode. Emits the resized
    * dimensions, mean luma, and re-encoded size; undecodable payloads
    * → ok=false. Same mapPartitions justification as [[decodeImage]]:
    * per-row imperative codec work with O(1) state. */
  def resizeImage(spark: SparkSession, media: DataFrame,
                  targetW: Int, targetH: Int,
                  maxPixels: Long = 64L * 1024 * 1024): Dataset[ResizedImage] = {
    require(targetW > 0 && targetH > 0, "target dimensions must be positive")
    import spark.implicits._
    val cap = maxPixels
    media.select(col("media_id").cast(LongType), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = readGuarded(bytes, cap)
          if (img == null) ResizedImage(id, ok = false, None, None, None, None)
          else {
            val out = new java.awt.image.BufferedImage(
              targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
              g.drawImage(img, 0, 0, targetW, targetH, null)
            } finally g.dispose()
            var sum = 0.0; var y = 0
            while (y < targetH) {
              var x = 0
              while (x < targetW) {
                val rgb = out.getRGB(x, y)
                sum += 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
                       0.114 * (rgb & 0xFF)
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            ResizedImage(id, ok = true, Some(targetW), Some(targetH),
              Some(sum / (targetW.toLong * targetH) / 255.0), Some(bos.size()))
          }
        }
      }
  }

  // ── perceptual hashing (image near-dup dedup) ─────────────────────────

  /** One image's perceptual-hash row. `ok = false` marks payloads no
    * codec accepts or images smaller than the hash grid. */
  final case class PhashRow(media_id: Long, ok: Boolean,
                            ahash: Option[Long], dhash: Option[Long])

  /** Perceptual hashes over the decoded thumbnail — the image leg of
    * the dedup family (text has five; this is the content-level
    * near-dup screen the header-metadata walk cannot give). Decode
    * (guarded, untrusted bytes), integer Rec.601 luma per pixel
    * (299r + 587g + 114b, per-mille — NO floating point anywhere, so
    * the hash is bit-replayable by any engine), box-downsample to a
    * `grid`×`grid` thumbnail by integer block sums, then:
    *
    *   - '''aHash''' (average hash): bit(by·grid+bx) = 1 iff the
    *     block's mean luma exceeds the image mean — compared as the
    *     exact cross-product `blockSum·totalCount > totalSum·blockCount`
    *     (BigInt, no division, no ties-by-rounding).
    *   - '''dHash''' (difference hash): bit(by·(grid−1)+bx) = 1 iff the
    *     right neighbor block outshines the left — gradient direction,
    *     robust to global brightness shifts.
    *
    * Near-dup admission composes with the SimHash banding machinery
    * verbatim ([[Dedup.simhashPairsFromSignatures]] over the `ahash`
    * column): banded candidates by pigeonhole, exact Hamming verify —
    * never all-pairs, the 100 TB shape. Runs in `mapPartitions` (codec
    * work); one pass per image, O(pixels). */
  def imagePhash(spark: SparkSession, media: DataFrame, grid: Int = 8,
                 maxPixels: Long = 64L * 1024 * 1024): Dataset[PhashRow] = {
    import spark.implicits._
    require(grid >= 2 && grid * grid <= 64, "grid² must fit a 64-bit hash")
    val (g, cap) = (grid, maxPixels)
    media.select(col("media_id").cast(LongType), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = readGuarded(bytes, cap)
          if (img == null || img.getWidth < g || img.getHeight < g)
            PhashRow(id, ok = false, None, None)
          else {
            val w = img.getWidth; val h = img.getHeight
            val bs = new Array[Long](g * g); val bc = new Array[Long](g * g)
            var y = 0
            while (y < h) {
              val by = y * g / h; var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val lum = 299L * ((rgb >> 16) & 0xFF) +
                  587L * ((rgb >> 8) & 0xFF) + 114L * (rgb & 0xFF)
                val i = by * g + x * g / w
                bs(i) += lum; bc(i) += 1; x += 1
              }
              y += 1
            }
            val ts = BigInt(bs.sum); val tc = BigInt(bc.sum)
            var ah = 0L; var dh = 0L; var i = 0
            while (i < g * g) {
              if (BigInt(bs(i)) * tc > ts * bc(i)) ah |= 1L << i
              i += 1
            }
            var by = 0
            while (by < g) {
              var bx = 0
              while (bx < g - 1) {
                val l = by * g + bx; val r = l + 1
                if (BigInt(bs(r)) * bc(l) > BigInt(bs(l)) * bc(r))
                  dh |= 1L << (by * (g - 1) + bx)
                bx += 1
              }
              by += 1
            }
            PhashRow(id, ok = true, Some(ah), Some(dh))
          }
        }
      }
  }

  // ── audio content fingerprinting (audio near-dup dedup) ──────────────

  /** PCM16 sample decode with a MONO view: the chunk walk of
    * [[parseWav]] plus the `data` payload as signed samples. Mono
    * streams decode bit-identically to the historical contract; STEREO
    * streams downmix each L/R frame in integer arithmetic —
    * `(l + r) / 2` with Java integer division, i.e. TRUNCATION TOWARD
    * ZERO on an odd sum (so +3/+4 → +3 but −3/−4 → −3; the rounding is
    * part of the replayable contract, document it wherever the mix is
    * re-derived). Stereo is the common corpus case; refusing it forced
    * fail-soft on half of real-world WAV. More than two channels,
    * non-PCM, or non-16-bit still → None (the honest fallback — a
    * fingerprint over bytes we can't interpret would be garbage).
    * Sample count is bounded by the input byte length; nothing
    * allocates beyond it. */
  private[llm] def wavPcm16MonoSamples(b: Array[Byte]): Option[Array[Int]] = {
    if (b == null || b.length < 44 ||
        ascii(b, 0, 4) != "RIFF" || ascii(b, 8, 4) != "WAVE") return None
    var o = 12; var fmtOk = false; var seenFmt = false; var nCh = 0
    var dataOff = -1; var dataLen = 0
    while (o + 8 <= b.length && (!seenFmt || dataOff < 0)) {
      val cid = ascii(b, o, 4); val sz = leInt(b, o + 4).toLong & 0xFFFFFFFFL
      if (cid == "fmt " && o + 24 <= b.length) {
        seenFmt = true
        nCh = leShort(b, o + 10)
        fmtOk = leShort(b, o + 8) == 1 && (nCh == 1 || nCh == 2) &&
          leShort(b, o + 22) == 16
      }
      if (cid == "data") {
        dataOff = o + 8
        dataLen = math.min(sz, (b.length - o - 8).toLong).toInt
      }
      val next = o.toLong + 8L + sz + (sz & 1L)
      o = if (next > Int.MaxValue.toLong) b.length else next.toInt
    }
    def signed(off: Int): Int = {
      val s = leShort(b, off); if (s >= 32768) s - 65536 else s
    }
    if (!fmtOk || dataOff < 0) None
    else if (nCh == 1) Some(Array.tabulate(dataLen / 2)(i => signed(dataOff + 2 * i)))
    else Some(Array.tabulate(dataLen / 4) { i =>
      (signed(dataOff + 4 * i) + signed(dataOff + 4 * i + 2)) / 2
    })
  }

  /** One audio stream's content fingerprint. `ok = false` marks
    * payloads that are not decodable PCM16 mono/stereo WAV or are
    * shorter than the block grid. */
  final case class AudioFpRow(media_id: Long, ok: Boolean,
                              afp: Option[Long], n_samples: Option[Int])

  /** Energy-envelope fingerprint over DECODED samples — the audio leg
    * of the content-dedup family ([[imagePhash]]'s exact pattern one
    * modality over): decode PCM16 WAV (mono directly; STEREO through
    * the integer L/R downmix — `(l+r)/2` truncating toward zero — so a
    * stereo encoding of a mono stream fingerprints IDENTICALLY to it),
    * box-downsample the absolute-amplitude envelope into `blocks`
    * integer block sums, bit(b) = 1 iff block b's mean energy exceeds
    * the stream mean (exact cross-multiplied integers,
    * engine-replayable). Robust to uniform gain the same way aHash is
    * robust to brightness; near-dup admission composes with
    * [[Dedup.simhashPairsFromSignatures]] / [[PhashIndexStore]] over
    * the `afp` column (both operate on any 64-bit signature).
    * Non-WAV/compressed payloads come back `ok = false` —
    * fingerprinting MP3 content would need a real decoder, which is
    * exactly the stub boundary the multimodal family documents. */
  def audioFingerprint(spark: SparkSession, media: DataFrame,
                       blocks: Int = 64): Dataset[AudioFpRow] = {
    import spark.implicits._
    require(blocks >= 2 && blocks <= 64, "blocks must fit a 64-bit fingerprint")
    val nb = blocks
    media.select(col("media_id").cast(LongType), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          wavPcm16MonoSamples(bytes) match {
            case Some(s) if s.length >= nb =>
              val bs = new Array[Long](nb); val bc = new Array[Long](nb)
              var i = 0
              while (i < s.length) {
                val blk = (i.toLong * nb / s.length).toInt
                bs(blk) += math.abs(s(i)); bc(blk) += 1; i += 1
              }
              val ts = BigInt(bs.sum); val tc = BigInt(bc.sum)
              var fp = 0L; var b = 0
              while (b < nb) {
                if (BigInt(bs(b)) * tc > ts * bc(b)) fp |= 1L << b
                b += 1
              }
              AudioFpRow(id, ok = true, Some(fp), Some(s.length))
            case _ => AudioFpRow(id, ok = false, None, None)
          }
        }
      }
  }

  /** Deterministic synthetic PCM16 WAV per row — the audio fingerprint
    * test/oracle fixture (the WAV twin of [[syntheticGrayMedia]]):
    * sample i of a row with seed `s` is the first four hex chars of
    * `md5("<s>:<i>")` (0..65535) minus 32768, replayable in any engine
    * with a standard md5. Rows with `perturbCol` true get sample 0
    * shifted by +12345 mod 2^16 — a planted NEAR-duplicate of the same
    * seed's base stream.
    *
    * `stereoCol` (a boolean column name; "" = all mono) plants STEREO
    * twins: a stereo row encodes frame i as `(base+d, base−d)` where
    * `d` is hex chars 5-6 of the same md5 mod 50, zeroed when either
    * side would leave the signed 16-bit range — so the L/R channels
    * genuinely differ, but the integer downmix `(l+r)/2 = base`
    * reconstructs the seed's mono stream EXACTLY (the sum is even by
    * construction; no truncation ambiguity in the fixture, though the
    * decoder's contract truncates toward zero on odd sums). */
  def syntheticPcmWav(spark: SparkSession, rows: DataFrame,
                      idCol: String, seedCol: String, perturbCol: String,
                      nSamples: Int, sampleRate: Int = 8000,
                      stereoCol: String = ""): DataFrame = {
    import spark.implicits._
    val (n, sr) = (nSamples, sampleRate)
    val stereoC =
      if (stereoCol.isEmpty) lit(false) else col(stereoCol).cast(BooleanType)
    rows.select(col(idCol).cast(LongType), col(seedCol).cast(StringType),
        col(perturbCol).cast(BooleanType), stereoC)
      .as[(Long, String, Boolean, Boolean)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, seed, pert, stereo) =>
          val ch = if (stereo) 2 else 1
          val dataBytes = 2 * ch * n
          val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
            .put("WAVE".getBytes("US-ASCII"))
            .put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1.toShort).putShort(ch.toShort).putInt(sr)
            .putInt(sr * 2 * ch).putShort((2 * ch).toShort).putShort(16.toShort)
            .put("data".getBytes("US-ASCII")).putInt(dataBytes)
          var i = 0
          while (i < n) {
            md.reset()
            val d = md.digest(s"$seed:$i".getBytes("UTF-8"))
            var raw = ((d(0) & 0xFF) << 8) | (d(1) & 0xFF)
            if (pert && i == 0) raw = (raw + 12345) % 65536
            val base = raw - 32768
            if (!stereo) bb.putShort(base.toShort)
            else {
              val spread = (d(2) & 0xFF) % 50
              val dd = if (base + spread > 32767 || base - spread < -32768) 0
                       else spread
              bb.putShort((base + dd).toShort).putShort((base - dd).toShort)
            }
            i += 1
          }
          (id, bb.array())
        }
      }.toDF("media_id", "content")
  }

  // ── video content fingerprinting (video near-dup dedup + clip match) ──

  /** Parsed Y4M stream geometry: presentation size, frame rate, and the
    * byte offset of each complete frame's LUMA plane inside the payload.
    * Offsets only — consumers read pixels straight off the input array,
    * so the parse itself allocates O(frames), never O(pixels). */
  private final case class Y4mStream(width: Int, height: Int,
                                     fpsNum: Int, fpsDen: Int,
                                     lumaOffsets: Array[Int])

  /** YUV4MPEG2 (Y4M) header + frame walk — the video twin of
    * [[parseWav]]/[[mp4Boxes]]: a REAL public uncompressed-video format
    * (mjpegtools/ffmpeg interchange; ASCII `YUV4MPEG2` parameter line,
    * then `FRAME\n` + raw planar YCbCr per frame) that needs no native
    * codec, so the CONTENT path is genuinely decodable here — compressed
    * codecs (H.264 etc.) stay behind the documented stub boundary exactly
    * like MP3 does for audio. Only the luma plane is consumed (chroma is
    * skipped by size), which reads mono, 4:2:0, 4:2:2 and 4:4:4 streams
    * uniformly. Untrusted-payload discipline as everywhere in this file:
    * declared dimensions are capped BEFORE any per-pixel work, malformed
    * parameters / odd-dimension 4:2:0 / unknown colorspaces → None, and a
    * truncated trailing frame STOPS the walk (honest partial — complete
    * frames keep their meaning, the same fail-soft contract as
    * [[parseWav]] and [[mp4Boxes]]). Truncation and CORRUPTION are
    * distinguished at the frame marker: bytes that END mid-`FRAME`
    * header are a clean EOF cut (partial ok), but bytes that DISAGREE
    * with the marker are mid-stream garbage — the stream's frame
    * boundaries are unknowable past that point, so the whole payload
    * refuses (None) rather than fingerprinting as a valid shorter
    * video. */
  private def parseY4m(b: Array[Byte], maxPixels: Long,
                       maxFrames: Int): Option[Y4mStream] = {
    val magic = "YUV4MPEG2"
    if (b == null || b.length < magic.length + 1 ||
        ascii(b, 0, magic.length) != magic) return None
    var nl = magic.length
    while (nl < b.length && b(nl) != '\n') nl += 1
    if (nl >= b.length || nl > 512) return None // parameter line is short ASCII
    var w = -1; var h = -1; var fn = -1; var fd = -1; var cs = "420"
    ascii(b, 0, nl).split(' ').drop(1).foreach { tok =>
      if (tok.nonEmpty) tok.charAt(0) match {
        case 'W' => w = tok.drop(1).toIntOption.getOrElse(-1)
        case 'H' => h = tok.drop(1).toIntOption.getOrElse(-1)
        case 'F' => tok.drop(1).split(':') match {
          case Array(n, d) =>
            fn = n.toIntOption.getOrElse(-1); fd = d.toIntOption.getOrElse(-1)
          case _ => fn = -1
        }
        case 'C' => cs = tok.drop(1)
        case _ => () // I (interlacing), A (aspect), X (extensions): irrelevant to luma
      }
    }
    if (w <= 0 || h <= 0 || fn <= 0 || fd <= 0 ||
        w.toLong * h > maxPixels) return None
    val luma = w * h
    val chroma: Int =
      if (cs == "mono") 0
      else if (cs.startsWith("420")) {
        if (w % 2 != 0 || h % 2 != 0) return None
        (w / 2) * (h / 2) * 2
      } else if (cs.startsWith("422")) {
        if (w % 2 != 0) return None
        (w / 2) * h * 2
      } else if (cs.startsWith("444")) luma * 2
      else return None // 411/alpha/bit-depth-tagged variants: honest refusal
    val frameSize = luma + chroma
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    var o = nl + 1
    while (o < b.length && offs.size < maxFrames) {
      // frame header: "FRAME" + optional parameters + '\n'. The marker
      // bytes that ARE present must agree with "FRAME": a clean EOF cut
      // mid-marker is truncation (partial ok below), but a disagreeing
      // byte is mid-stream corruption — every later frame boundary is
      // guesswork, so refuse the payload outright
      val avail = math.min(5, b.length - o)
      if (ascii(b, o, avail) != "FRAME".take(avail)) return None
      if (o + 5 > b.length) return y4mPartial(offs, w, h, fn, fd)
      var e = o + 5
      // an unterminated-but-overlong parameter run is not a truncation
      // artifact (the line would have ended within 512 bytes) — corrupt
      if (e - o > 512) return None
      while (e < b.length && b(e) != '\n') {
        e += 1
        if (e - o > 512) return None
      }
      if (e >= b.length) return y4mPartial(offs, w, h, fn, fd)
      val dataStart = e + 1
      if (dataStart.toLong + frameSize > b.length) return y4mPartial(offs, w, h, fn, fd)
      offs += dataStart
      o = dataStart + frameSize
    }
    y4mPartial(offs, w, h, fn, fd)
  }
  private def y4mPartial(offs: scala.collection.mutable.ArrayBuffer[Int],
                     w: Int, h: Int, fn: Int, fd: Int): Option[Y4mStream] =
    if (offs.isEmpty) None else Some(Y4mStream(w, h, fn, fd, offs.toArray))

  /** One video stream's content fingerprint. `ok = false` marks payloads
    * that are not decodable Y4M or carry fewer complete frames than the
    * block grid. */
  final case class VideoFpRow(media_id: Long, ok: Boolean,
                              vfp: Option[Long], n_frames: Option[Int],
                              width: Option[Int], height: Option[Int])

  /** Temporal luma-envelope fingerprint over DECODED frames — the video
    * leg of the content-dedup family, completing the trio
    * ([[imagePhash]] spatial / [[audioFingerprint]] temporal-audio /
    * this temporal-video): per frame, the luma-plane sum (one integer);
    * box-downsample the frame-sum sequence into `blocks` block sums;
    * bit(b) = 1 iff block b's mean outshines the stream mean — the exact
    * cross-multiplied integer compare of its two siblings, so the hash
    * is engine-replayable bit for bit. Robust to uniform brightness the
    * way the envelope is to gain; near-dup admission composes with
    * [[Dedup.simhashPairsFromSignatures]] / [[PhashIndexStore]] over the
    * `vfp` column (both are 64-bit-signature generic). Codec work in
    * `mapPartitions`; one pass per video, O(pixels). */
  def videoFingerprint(spark: SparkSession, media: DataFrame,
                       blocks: Int = 64,
                       maxPixels: Long = 64L * 1024 * 1024,
                       maxFrames: Int = 1 << 20): Dataset[VideoFpRow] = {
    import spark.implicits._
    require(blocks >= 2 && blocks <= 64, "blocks must fit a 64-bit fingerprint")
    val (nb, cap, mf) = (blocks, maxPixels, maxFrames)
    media.select(col("media_id").cast(LongType), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          (try parseY4m(bytes, cap, mf) catch { case _: Exception => None }) match {
            case Some(st) if st.lumaOffsets.length >= nb =>
              val n = st.lumaOffsets.length
              val bs = new Array[Long](nb); val bc = new Array[Long](nb)
              var f = 0
              while (f < n) {
                val off = st.lumaOffsets(f)
                var s = 0L; var i = 0; val px = st.width * st.height
                while (i < px) { s += bytes(off + i) & 0xFF; i += 1 }
                val blk = (f.toLong * nb / n).toInt
                bs(blk) += s; bc(blk) += 1; f += 1
              }
              val ts = BigInt(bs.sum); val tc = BigInt(bc.sum)
              var fp = 0L; var b = 0
              while (b < nb) {
                if (BigInt(bs(b)) * tc > ts * bc(b)) fp |= 1L << b
                b += 1
              }
              VideoFpRow(id, ok = true, Some(fp), Some(n),
                Some(st.width), Some(st.height))
            case _ => VideoFpRow(id, ok = false, None, None, None, None)
          }
        }
      }
  }

  /** One sampled frame's spatial hash: [[imagePhash]]'s aHash computed
    * over a single video frame's luma plane. */
  final case class FrameHashRow(media_id: Long, frame_index: Int, fhash: Long)

  /** Per-frame perceptual hashes over a sampled frame grid — the
    * signature relation that [[graft.llm.Dedup.frameClipPairs]] consumes
    * for embedded-CLIP detection (a time-shifted copy shares frame
    * hashes at one consistent offset even when whole-stream fingerprints
    * disagree). Every `everyNth`-th complete frame gets the exact
    * [[imagePhash]] aHash over its luma plane (integer block sums,
    * cross-multiplied mean compare — engine-replayable). Undecodable
    * payloads and frames smaller than the grid emit no rows (flatMap —
    * the honest fallback; a dedup candidate generator must never invent
    * signatures). */
  def videoFramePhash(spark: SparkSession, media: DataFrame,
                      grid: Int = 8, everyNth: Int = 1,
                      maxPixels: Long = 64L * 1024 * 1024,
                      maxFrames: Int = 1 << 20): Dataset[FrameHashRow] = {
    import spark.implicits._
    require(grid >= 2 && grid * grid <= 64, "grid² must fit a 64-bit hash")
    require(everyNth >= 1, "everyNth must be positive")
    val (g, step, cap, mf) = (grid, everyNth, maxPixels, maxFrames)
    media.select(col("media_id").cast(LongType), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          (try parseY4m(bytes, cap, mf) catch { case _: Exception => None }) match {
            case Some(st) if st.width >= g && st.height >= g =>
              val (w, h) = (st.width, st.height)
              Iterator.range(0, st.lumaOffsets.length, step).map { f =>
                val off = st.lumaOffsets(f)
                val bs = new Array[Long](g * g); val bc = new Array[Long](g * g)
                var y = 0
                while (y < h) {
                  val by = y * g / h; var x = 0
                  while (x < w) {
                    bs(by * g + x * g / w) += bytes(off + y * w + x) & 0xFF
                    bc(by * g + x * g / w) += 1; x += 1
                  }
                  y += 1
                }
                val ts = BigInt(bs.sum); val tc = BigInt(bc.sum)
                var fh = 0L; var i = 0
                while (i < g * g) {
                  if (BigInt(bs(i)) * tc > ts * bc(i)) fh |= 1L << i
                  i += 1
                }
                FrameHashRow(id, f, fh)
              }
            case _ => Iterator.empty
          }
        }
      }
  }

  /** Deterministic synthetic mono Y4M per row — the video fingerprint
    * test/oracle fixture (the video twin of [[syntheticGrayMedia]] /
    * [[syntheticPcmWav]]): luma of pixel (x,y) in OUTPUT frame f of a
    * row with seed `s` and frame offset `k` is the first four hex chars
    * of `md5("<s>:<f+k>:<x>:<y>")` mod 256 — so a row reusing another
    * row's seed with `k > 0` is an embedded CLIP of it (its frame f IS
    * the base stream's frame f+k), and `k = 0` with the same seed is an
    * exact copy. Rows with `perturbCol` true get pixel (0,0) of frame 0
    * shifted by +40 mod 256 — a planted NEAR-duplicate. Replayable in
    * any engine with a standard md5. */
  def syntheticY4m(spark: SparkSession, rows: DataFrame,
                   idCol: String, seedCol: String, offsetCol: String,
                   perturbCol: String, width: Int, height: Int,
                   nFrames: Int, fpsNum: Int = 25, fpsDen: Int = 1): DataFrame = {
    import spark.implicits._
    val (w, h, n) = (width, height, nFrames)
    val header = s"YUV4MPEG2 W$w H$h F$fpsNum:$fpsDen Ip A1:1 Cmono\n"
      .getBytes("US-ASCII")
    val fhdr = "FRAME\n".getBytes("US-ASCII")
    rows.select(col(idCol).cast(LongType), col(seedCol).cast(StringType),
        col(offsetCol).cast(LongType), col(perturbCol).cast(BooleanType))
      .as[(Long, String, Long, Boolean)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, seed, k, pert) =>
          val bb = java.nio.ByteBuffer.allocate(
            header.length + n * (fhdr.length + w * h))
          bb.put(header)
          var f = 0
          while (f < n) {
            bb.put(fhdr)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                md.reset()
                val d = md.digest(s"$seed:${f + k}:$x:$y".getBytes("UTF-8"))
                var v = (((d(0) & 0xFF) << 8) | (d(1) & 0xFF)) % 256
                if (pert && f == 0 && x == 0 && y == 0) v = (v + 40) % 256
                bb.put(v.toByte)
                x += 1
              }
              y += 1
            }
            f += 1
          }
          (id, bb.array())
        }
      }.toDF("media_id", "content")
  }

  /** Deterministic synthetic grayscale PNG per row — the phash test/
    * oracle fixture: pixel (x,y) of a row with seed `s` is the first
    * four hex chars of `md5("<s>:<x>:<y>")` mod 256 (gray = that value
    * on all three RGB channels, so the integer luma is exactly
    * 1000·v), replayable in any engine with a standard md5 (DuckDB:
    * `CAST('0x' || substring(md5(s||':'||x||':'||y), 1, 4) AS BIGINT)
    * % 256`). Rows with `perturbCol` true get pixel (0,0) shifted by
    * +40 mod 256 — a planted NEAR-duplicate of the same seed's base
    * image. PNG is lossless and `TYPE_INT_RGB` bypasses gray-colorspace
    * gamma, so the decode returns these exact values. Codec work in
    * `mapPartitions`; O(w·h) md5s per row.
    *
    * `valueMod` narrows the base range (md5 mod `valueMod`) and
    * `rampCol` (a LONG column; "" = none) adds a VERTICAL brightness
    * ramp `+ramp·y` on top — the global-illumination-gradient fixture
    * for the aHash-vs-dHash robustness query (a ramp shifts every
    * row's absolute luma but not horizontal neighbor order). The
    * caller keeps `valueMod − 1 + ramp·(height−1) ≤ 255`; wrap-around
    * would scramble neighbor order and the generator refuses it.
    * Defaults reproduce the historical bytes exactly. */
  def syntheticGrayMedia(spark: SparkSession, rows: DataFrame,
                         idCol: String, seedCol: String, perturbCol: String,
                         width: Int, height: Int,
                         valueMod: Int = 256, rampCol: String = ""): DataFrame = {
    import spark.implicits._
    require(valueMod >= 1 && valueMod <= 256, "valueMod must be in 1..256")
    val (w, h, vm) = (width, height, valueMod)
    val rampC = if (rampCol.isEmpty) lit(0L) else col(rampCol).cast(LongType)
    rows.select(col(idCol).cast(LongType), col(seedCol).cast(StringType),
        col(perturbCol).cast(BooleanType), rampC)
      .as[(Long, String, Boolean, Long)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, seed, pert, ramp) =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              md.reset()
              val d = md.digest(s"$seed:$x:$y".getBytes("UTF-8"))
              var v = ((((d(0) & 0xFF) << 8) | (d(1) & 0xFF)) % vm +
                (if (pert && x == 0 && y == 0) 40 else 0)) % 256
              v += (ramp * y).toInt
              require(v <= 255,
                s"ramp $ramp wraps pixel ($x,$y)=$v past 255 — shrink valueMod or the ramp")
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
      }.toDF("media_id", "content")
  }
}
