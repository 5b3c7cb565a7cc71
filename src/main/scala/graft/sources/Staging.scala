package graft.sources

import graft.schema.TableConfig
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Staged batch loading (SURVEY.md §2.1 S9–S13) — the Spark restatement of
  * the reference's CSV→MinIO→`COPY`→truncate-reload staging path
  * (casreport_to_ods.py:345-423). One parquet overwrite replaces the whole
  * batch-file + COPY + TRUNCATE machinery; `mode("overwrite")` IS S12's
  * truncate-reload semantic, and the returned count is S10's
  * `SELECT COUNT(*)` load verification.
  */
object Staging {

  /** M5 — staging-table switch: scheduled runs load `staging.x`, manual
    * backfills load `staging.x_manual` (bccp_item.sql:1-5;
    * bccp_to_ods.py:309,342). */
  def stagingName(cfg: TableConfig, manual: Boolean = false): String =
    cfg.name.replace('.', '_') + (if (manual) "_manual" else "")

  def stagingPath(root: String, cfg: TableConfig, manual: Boolean = false): String =
    s"$root/${stagingName(cfg, manual)}"

  /** S9+S10+S12 — truncate-reload the staging table and verify the count.
    * Returns rows written (compared upstream against the source count probe
    * S4, reference optimize_compute.py:27-57). */
  def overwrite(df: DataFrame, path: String): Long = {
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path).count()
  }

  /** S13 — reverse-ETL publish. The reference pushes marts back to MSSQL via
    * batched insert_rows (ods_to_llb.py:126-198); against a real warehouse
    * this is `df.write.jdbc(url, table, props)`. File-based harness: a
    * partitioned parquet publish with the same overwrite contract. */
  def publish(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Long = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
    df.sparkSession.read.parquet(path).count()
  }

  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)
}
