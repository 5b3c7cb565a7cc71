package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, TimestampType}
import java.util.Properties

/** JDBC extraction/publish (SURVEY.md §2.1 S1–S4, S13).
  *
  * The reference string-splices `WHERE cursor >= :start AND cursor < :end`
  * into per-source SQL and pulls rows through fetchmany(50k) pandas batches
  * (casreport_to_ods.py:252-360, bccp_to_ods.py:185-263). Spark-first, the
  * window is a Catalyst filter on a JDBC relation — the JDBC source
  * compiles it into the remote WHERE clause (visible as PushedFilters in
  * the scan), and `partitionColumn` splits the read into parallel range
  * queries, replacing the manual batch loop entirely.
  */
object Jdbc {

  /** Plain table handle. `columns` projects early (P1 — the reference
    * never SELECT *'s a source). */
  def table(spark: SparkSession, url: String, table: String,
            columns: Seq[String] = Nil, props: Properties = new Properties): DataFrame = {
    val df = spark.read.jdbc(url, table, props)
    if (columns.isEmpty) df else df.select(columns.map(col).toSeq: _*)
  }

  /** S1/S2/S3 — cursor-windowed scan, half-open `[start, end)`. Bounds are
    * literal strings cast to `cursorType` (timestamp cursors and int
    * `yyyymmdd` cursors both occur in the reference). The filter pushes to
    * the source; with `numPartitions > 1` the same bounds drive Spark's
    * JDBC range partitioning — parallel extraction instead of the
    * reference's serial fetchmany loop. */
  def windowRead(spark: SparkSession, url: String, tbl: String,
                 cursorField: String, start: String, end: String,
                 cursorType: DataType = TimestampType,
                 columns: Seq[String] = Nil, numPartitions: Int = 1,
                 props: Properties = new Properties): DataFrame = {
    val base =
      if (numPartitions <= 1) spark.read.jdbc(url, tbl, props)
      else spark.read
        .option("partitionColumn", cursorField)
        .option("numPartitions", numPartitions)
        .option("lowerBound", start)
        .option("upperBound", end)
        .jdbc(url, tbl, props)
    Windowed.cursorWindow(
      if (columns.isEmpty) base else base.select(columns.map(col).toSeq: _*),
      cursorField, lit(start).cast(cursorType), lit(end).cast(cursorType))
  }

  /** S4 — count probe (`SELECT count(1) WHERE cursor BETWEEN`,
    * optimize_compute.py:27-57): the same pushed window, aggregated. */
  def countProbe(spark: SparkSession, url: String, tbl: String,
                 cursorField: String, start: String, end: String,
                 cursorType: DataType = TimestampType,
                 props: Properties = new Properties): Long =
    windowRead(spark, url, tbl, cursorField, start, end, cursorType, props = props).count()

  /** S13 — reverse-ETL publish (ods_to_llb.py:126-198's insert_rows). */
  def publish(df: DataFrame, url: String, tbl: String,
              mode: String = "append", props: Properties = new Properties): Unit =
    df.write.mode(mode).jdbc(url, tbl, props)

  /** V4 — connectivity probe, the reference's `SqlSensor SELECT 1`
    * (bccp_dag.py:40-57). Driver-side, no Spark job. */
  def probe(url: String, props: Properties = new Properties): Boolean =
    try {
      val conn = java.sql.DriverManager.getConnection(url, props)
      try conn.isValid(5) finally conn.close()
    } catch { case _: Exception => false }
}
