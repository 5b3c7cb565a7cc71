package graft.sources

import graft.schema.TableConfig
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental CDC-window extraction (SURVEY.md §2.8, S1–S3/P4).
  *
  * The reference generates `WHERE cursor >= :start AND cursor < :end` into
  * every source query (casreport_to_ods.py:252-301, bccp_to_ods.py:185-210)
  * — a half-open `[start, end)` window on the table's cursor column. Here
  * the predicate is a plain Catalyst filter, so it pushes down to the scan
  * (parquet row-group pruning / JDBC WHERE) instead of being string-spliced
  * into SQL. At cluster scale the same call reads a date-partitioned table
  * and the filter prunes partitions.
  */
object Windowed {

  /** Half-open cursor window: start inclusive, end exclusive — the boundary
    * semantics every reference pipeline depends on for no-gap/no-overlap
    * scheduling. */
  def cursorWindow(df: DataFrame, cursorField: String, start: Column, end: Column): DataFrame =
    df.filter(col(cursorField) >= start && col(cursorField) < end)

  def cursorWindow(df: DataFrame, cfg: TableConfig, start: Column, end: Column): DataFrame =
    cursorWindow(df, cfg.cursorField.getOrElse(
      throw new IllegalArgumentException(s"${cfg.name}: no cursorField configured")),
      start, end)

  /** Int-typed `yyyymmdd` cursor variant (casreport_to_ods.py:272-283). */
  def intCursorWindow(df: DataFrame, cursorField: String, startYmd: Int, endYmd: Int): DataFrame =
    df.filter(col(cursorField) >= startYmd && col(cursorField) < endYmd)

  /** 'yyyy-MM-dd[ HH:mm:ss]' → LocalDateTime (midnight when date-only).
    * The single normalization point for string window bounds — used by
    * both the zone conversion below and `Tables.eventsWindow`'s nanos
    * literal, so the accepted formats cannot drift apart. */
  def parseBound(t: String): java.time.LocalDateTime = {
    val norm = if (t.contains(" ") || t.contains("T")) t.replace(' ', 'T') else t + "T00:00:00"
    java.time.LocalDateTime.parse(norm)
  }

  /** Convert a wall-clock 'yyyy-MM-dd[ HH:mm:ss]' bound in `zone` to the
    * equivalent UTC 'yyyy-MM-dd HH:mm:ss' string — the reference anchors
    * every cursor window in `Asia/Ho_Chi_Minh` local time before comparing
    * to naive (UTC-stored) DB timestamps (casreport_to_ods.py:79-86). The
    * conversion is a driver-side constant, so downstream filters stay
    * literal comparisons that push down to the scan. */
  def zonedToUtc(t: String, zone: String): String =
    parseBound(t)
      .atZone(java.time.ZoneId.of(zone))
      .withZoneSameInstant(java.time.ZoneOffset.UTC)
      .toLocalDateTime
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))

  /** [[cursorWindow]] with bounds given as wall-clock datetimes in `zone`
    * (converted to UTC instants before the literal comparison — pushdown
    * preserved). Use for the reference's ICT-day windows. */
  def zonedCursorWindow(df: DataFrame, cursorField: String,
                        start: String, end: String, zone: String): DataFrame =
    cursorWindow(df, cursorField,
      lit(zonedToUtc(start, zone)).cast("timestamp"),
      lit(zonedToUtc(end, zone)).cast("timestamp"))
}

/** Per-table incremental watermark store (SURVEY.md §2.8: "model as
  * incremental batch with a watermark table"; the dbt incremental
  * `max(dbt_updated_at)` guard, dim_casreport_services.sql:25-28).
  *
  * Watermarks are tiny (one row per table) — a driver-side read is correct
  * at any scale. Persistence is an append-only parquet log compacted on
  * read (latest row per table wins), so concurrent pipelines never lose a
  * watermark to a read-modify-write race on the file.
  */
final class WatermarkStore(spark: SparkSession, path: String) {
  import org.apache.spark.sql.types._

  private val schema = StructType(Seq(
    StructField("table_name", StringType, nullable = false),
    StructField("watermark", StringType, nullable = false),
    StructField("logged_at", TimestampType, nullable = false)))

  private def log: DataFrame =
    if (new java.io.File(path).exists) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Latest recorded watermark for a table (lexicographic timestamps —
    * store ISO-8601 or zero-padded numerics). */
  def get(table: String): Option[String] =
    log.filter(col("table_name") === table)
      .orderBy(col("logged_at").desc)
      .select("watermark").limit(1)
      .collect().headOption.map(_.getString(0))

  def set(table: String, watermark: String): Unit = {
    import spark.implicits._
    Seq((table, watermark)).toDF("table_name", "watermark")
      .withColumn("logged_at", current_timestamp())
      .write.mode("append").parquet(path)
  }
}
