package graft.sources

import graft.ops.Normalize
import graft.schema.TableConfig
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Banner/trailer-aware delimited-file ingestion (SURVEY.md §2.1 S7).
  *
  * The reference streams Excel rows with openpyxl, skipping `header_rows`
  * banner lines and `end_skip` trailer lines, coercing each cell with
  * range guards, dropping rows missing required keys, and appending an
  * `etl_date` (pns_to_ods_optimize.py:95-229). The Excel container is an
  * input-format detail; the operator semantics are banner/trailer skip +
  * typed coercion + key filter, reproduced here over delimited text
  * (see [[Xlsx]] for the real .xlsx container path).
  *
  * Line positions come from the Hadoop text reader's per-file BYTE OFFSETS
  * (monotone in line order within a file), so banner/trailer trim reduces
  * to two per-file offset thresholds. Only the skinny (file, offset) pairs
  * shuffle to compute those thresholds; the line text itself never
  * shuffles, and the whole read is a CONSTANT number of jobs regardless of
  * file count (a landing directory with thousands of daily drops — the
  * reference's per-day fan-out, ftp_downloader.py:41-57 — previously paid
  * two sequential driver-launched jobs per file).
  */
object TabularFile {

  /** Data files under a path (or the path itself when it's a file), with
    * Spark's hidden-file rules: `_SUCCESS` markers, `.crc` sidecars and
    * dotfiles are not data. Shared by the delimited and .xlsx readers so
    * their listing semantics cannot drift. */
  private[sources] def listDataFiles(spark: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).toSeq.filter(_.isFile)
        .map(_.getPath)
        .filterNot(pp => pp.getName.startsWith("_") || pp.getName.startsWith("."))
        .map(_.toString).sorted
    else Seq(path)
  }

  /** (file, byteOffset, line) rows for a set of text files — one
    * distributed scan via the classic TextInputFormat (whose default
    * PathFilter skips `_`/`.` files exactly like Spark's own file index). */
  private[sources] def linesWithOffsets(spark: SparkSession, files: Seq[String]): DataFrame = {
    import org.apache.hadoop.io.{LongWritable, Text}
    import org.apache.hadoop.mapred.{FileInputFormat, FileSplit, JobConf, TextInputFormat}
    val jobConf = new JobConf(spark.sparkContext.hadoopConfiguration)
    // setInputPaths handles special characters in paths (a raw
    // comma-joined string would split a path containing ',')
    FileInputFormat.setInputPaths(jobConf, files.map(new org.apache.hadoop.fs.Path(_)): _*)
    val rows = spark.sparkContext
      .hadoopRDD(jobConf, classOf[TextInputFormat], classOf[LongWritable], classOf[Text],
        spark.sparkContext.defaultParallelism)
      .asInstanceOf[org.apache.spark.rdd.HadoopRDD[LongWritable, Text]]
      .mapPartitionsWithInputSplit { (split, it) =>
        val file = split.asInstanceOf[FileSplit].getPath.toString
        // Text/LongWritable objects are REUSED by the record reader — copy
        it.map { case (off, line) =>
          org.apache.spark.sql.Row(file, off.get(), line.toString)
        }
      }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("__file", StringType), StructField("__off", LongType),
      StructField("value", StringType))))
  }

  def read(spark: SparkSession, path: String, cfg: TableConfig,
           headerRows: Int = 1, trailerRows: Int = 0,
           requiredKeys: Seq[String] = Nil, delimiter: String = ",",
           withEtlDate: Boolean = false): DataFrame = {
    // banner/trailer positions are PER FILE: a landing directory holds
    // many files (S8 lands one per source drop), and a global row index
    // would keep later files' banners and earlier files' trailers.
    val files = listDataFiles(spark, path)
    if (files.isEmpty) {
      // keep the empty-result schema identical to the non-empty path's
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], cfg.schema)
      return if (withEtlDate) empty.withColumn("etl_date", current_timestamp()) else empty
    }

    // byte offsets are monotone line positions only on UNCOMPRESSED files;
    // a splittable-compressed file's record reader reports codec-dependent
    // positions whose cross-split ordering (and uniqueness) is not
    // guaranteed. Compressed drops take the per-file indexed fallback —
    // they are the exception in a landing directory, not the bulk case.
    val codecs = new org.apache.hadoop.io.compress.CompressionCodecFactory(
      spark.sparkContext.hadoopConfiguration)
    val (plain, compressed) = files.partition(f =>
      codecs.getCodec(new org.apache.hadoop.fs.Path(f)) == null)

    // per-file trim thresholds: the offset of the LAST banner line and the
    // FIRST trailer line. Only (file, offset) longs go through the window
    // shuffle; the thresholds (one row per file) broadcast back onto the
    // untouched parallel text scan.
    val offsetTrimmed: Option[DataFrame] = if (plain.isEmpty) None else Some {
      val lines = linesWithOffsets(spark, plain)
      val byOff = Window.partitionBy("__file").orderBy(col("__off").asc)
      val byOffDesc = Window.partitionBy("__file").orderBy(col("__off").desc)
      val bounds = lines.select(col("__file"), col("__off"))
        .withColumn("__ri", row_number().over(byOff))
        .withColumn("__rj", row_number().over(byOffDesc))
        .groupBy("__file")
        .agg(max(when(col("__ri") <= headerRows, col("__off"))).as("__lo"),
             min(when(col("__rj") <= trailerRows, col("__off"))).as("__hi"))
      lines.join(broadcast(bounds), Seq("__file"))
        .filter((col("__lo").isNull || col("__off") > col("__lo")) &&
                (col("__hi").isNull || col("__off") < col("__hi")))
        .select("value")
    }
    val legacyTrimmed: Option[DataFrame] = if (compressed.isEmpty) None else Some {
      compressed.map { file =>
        val fl = spark.read.text(file)
        val n = fl.count()
        spark.createDataFrame(
          fl.rdd.zipWithIndex()
            .filter { case (_, i) => i >= headerRows && i < n - trailerRows }
            .map(_._1),
          StructType(Seq(StructField("value", StringType))))
      }.reduce(_ union _)
    }
    val text = (offsetTrimmed.toSeq ++ legacyTrimmed.toSeq).reduce(_ union _)

    // parse positionally against the declared schema, all columns as
    // strings first (reference reads cells raw then coerces)
    val rawSchema = StructType(cfg.schema.fields.map(f => StructField(f.name, StringType)))
    val parsed = text
      .select(from_csv(col("value"), rawSchema,
        Map("delimiter" -> delimiter, "mode" -> "PERMISSIVE")).as("r"))
      .select(col("r.*"))

    finish(parsed, cfg, requiredKeys, withEtlDate)
  }

  /** JSON-lines landing-zone read with CORRUPT-ROW QUARANTINE: every
    * line either parses against the declared schema or lands — verbatim
    * — in the returned quarantine frame, so a poisoned drop never
    * silently shrinks (the reference's per-batch Soda count reconcile
    * catches loss after the fact; the quarantine names the rows). The
    * declared schema is authoritative: extra JSON fields are ignored,
    * missing ones read as NULL (additive producer evolution needs no
    * reader change).
    *
    * Returns (good rows, quarantined raw lines, release hook). The
    * parsed frame is LAZILY cached before the corrupt-column split —
    * Spark refuses raw-file filters on the internal corrupt column, and
    * the InMemoryRelation is what satisfies that check. The cache keeps
    * lineage: an evicted or lost block recomputes from the landing
    * bytes (same file → same parse), so executor loss never kills the
    * frames — the fault-tolerance property an eager localCheckpoint
    * (non-recomputable blocks) would silently give up on the primary
    * ingest path. Call `release()` once both frames are consumed so a
    * repeated landing cadence doesn't pin executor memory. */
  def readJsonl(spark: SparkSession, path: String, cfg: TableConfig,
                requiredKeys: Seq[String] = Nil,
                withEtlDate: Boolean = false): JsonlRead = {
    val corruptCol = "__corrupt"
    val withCorrupt = StructType(
      cfg.schema.fields :+ StructField(corruptCol, StringType))
    val raw = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
      .cache()
    val good = raw.filter(col(corruptCol).isNull).drop(corruptCol)
    val quarantine = raw.filter(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("raw_line"))
    JsonlRead(finish(good, cfg, requiredKeys, withEtlDate), quarantine,
      () => { raw.unpersist(); () })
  }

  /** Result of [[readJsonl]]: the parsed good rows, the quarantined raw
    * lines, and the hook that drops the shared parse cache once both
    * are consumed. */
  final case class JsonlRead(good: DataFrame, quarantine: DataFrame,
                             release: () => Unit)

  /** Shared post-parse tail (also used by [[Xlsx]]): scrub, coerce to the
    * declared schema (malformed cells null out like the reference's
    * per-cell guards), drop rows missing required keys, stamp etl_date. */
  private[sources] def finish(parsed: DataFrame, cfg: TableConfig,
                              requiredKeys: Seq[String], withEtlDate: Boolean): DataFrame = {
    val coerced = Normalize.coerce(Normalize.scrubStrings(parsed), cfg.schema)
    val filtered = requiredKeys.foldLeft(coerced)((d, k) => d.filter(col(k).isNotNull))
    if (withEtlDate) filtered.withColumn("etl_date", current_timestamp()) else filtered
  }
}
