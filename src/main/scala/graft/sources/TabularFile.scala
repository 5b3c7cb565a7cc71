package graft.sources

import graft.ops.Normalize
import graft.schema.TableConfig
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Banner/trailer-aware delimited-file ingestion (SURVEY.md §2.1 S7).
  *
  * The reference streams Excel rows with openpyxl, skipping `header_rows`
  * banner lines and `end_skip` trailer lines, coercing each cell with
  * range guards, dropping rows missing required keys, and appending an
  * `etl_date` (pns_to_ods_optimize.py:95-229). The Excel container is an
  * input-format detail; the operator semantics are banner/trailer skip +
  * typed coercion + key filter, reproduced here over delimited text.
  *
  * Line-position logic needs a global row index, which a distributed scan
  * doesn't have for free — `zipWithIndex` pays one extra pass to size
  * partitions, then everything else stays a narrow pipeline (`from_csv`
  * parses inside codegen; malformed cells null out via [[Normalize.coerce]]
  * exactly like the reference's per-cell guards).
  */
object TabularFile {

  def read(spark: SparkSession, path: String, cfg: TableConfig,
           headerRows: Int = 1, trailerRows: Int = 0,
           requiredKeys: Seq[String] = Nil, delimiter: String = ",",
           withEtlDate: Boolean = false): DataFrame = {
    // banner/trailer positions are PER FILE: a landing directory holds
    // many files (S8 lands one per source drop), and a global row index
    // would keep later files' banners and earlier files' trailers. Each
    // file gets its own indexed trim; union stays lazy and distributed.
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files: Seq[String] =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq.filter(_.isFile)
          .map(_.getPath)
          // same hidden-file rule as Spark's own file index: _SUCCESS
          // markers, .crc sidecars, dotfiles are not data
          .filterNot(pp => pp.getName.startsWith("_") || pp.getName.startsWith("."))
          .map(_.toString).sorted
      else Seq(path)

    def trimmedBody(file: String) = {
      val lines = spark.read.text(file)
      val n = lines.count()
      lines.rdd.zipWithIndex()
        .filter { case (_, i) => i >= headerRows && i < n - trailerRows }
        .map(_._1)
    }
    if (files.isEmpty) {
      // keep the empty-result schema identical to the non-empty path's
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], cfg.schema)
      return if (withEtlDate) empty.withColumn("etl_date", current_timestamp()) else empty
    }
    val body = files.map(trimmedBody).reduce(_ union _)
    val text = spark.createDataFrame(body, StructType(Seq(StructField("value", StringType))))

    // parse positionally against the declared schema, all columns as
    // strings first (reference reads cells raw then coerces)
    val rawSchema = StructType(cfg.schema.fields.map(f => StructField(f.name, StringType)))
    val parsed = text
      .select(from_csv(col("value"), rawSchema,
        Map("delimiter" -> delimiter, "mode" -> "PERMISSIVE")).as("r"))
      .select(col("r.*"))

    val coerced = Normalize.coerce(Normalize.scrubStrings(parsed), cfg.schema)
    val filtered = requiredKeys.foldLeft(coerced)((d, k) => d.filter(col(k).isNotNull))
    if (withEtlDate) filtered.withColumn("etl_date", current_timestamp()) else filtered
  }
}
