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

  /** Decoded-image feature row produced by the decode stage. */
  final case class ImageFeatures(media_id: Long, width: Int, height: Int,
                                 channels: Int, mean_luma: Double)

  /** STUB decode — the per-partition batch shape of a real decoder without
    * the native image library (not present in this container). Features
    * are a deterministic function of the bytes so tests are stable; a real
    * implementation replaces ONLY the body of `decodeOne`. The
    * mapPartitions boundary is the real design: decode amortizes per-batch
    * (library init once per partition), rows stream, nothing collects. */
  def decodeImageStub(spark: SparkSession, media: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.select(col("media_id").cast(LongType), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real impl: val decoder = NativeImageLib.init() — once per partition
        def decodeOne(id: Long, bytes: Array[Byte]): ImageFeatures = {
          val b = if (bytes == null) Array.empty[Byte] else bytes
          // STUB: deterministic fake derived from content, NOT real pixels
          val h = b.foldLeft(1469598103934665603L)((acc, x) => (acc ^ x) * 1099511628211L)
          ImageFeatures(id,
            width = 16 + math.floorMod(h, 1024).toInt,
            height = 16 + math.floorMod(h >> 10, 1024).toInt,
            channels = 3,
            mean_luma = math.floorMod(h >> 20, 256).toDouble / 255.0)
        }
        it.map { case (id, bytes) => decodeOne(id, bytes) }
      }
  }

  /** Frame-sampling plumbing for video: every Nth frame index up to a
    * duration — the explode shape a real frame extractor feeds. */
  def frameSampleIndexes(media: DataFrame, fps: Double, durationSecCol: String,
                         everyNth: Int): DataFrame =
    media.withColumn("frame_index",
      explode(sequence(lit(0L),
        greatest((col(durationSecCol) * fps).cast(LongType) - 1, lit(0L)),
        lit(everyNth.toLong))))
}
