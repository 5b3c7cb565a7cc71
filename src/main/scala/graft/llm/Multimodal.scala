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
}
