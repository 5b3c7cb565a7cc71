package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support — co-located joins without a shuffle
  * (SURVEY.md §4 / the 100 TB design notes: "reuse a partitioning across
  * stages").
  *
  * Writing both sides of a recurring join bucketed AND sorted by the join
  * key means every future join between them is shuffle-free: Spark reads
  * matching buckets pair-wise and sort-merge-joins them in place. For the
  * ODS shape — a big fact re-merged every 5 minutes against a big target —
  * bucketing the durable table on the business key removes the dominant
  * recurring shuffle.
  */
object Bucketing {

  /** Persist as a bucketed, sorted managed table (bucketing requires the
    * table catalog — plain parquet paths cannot carry bucket metadata). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, mode: String = "overwrite"): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True when a join between two same-bucketed tables planned without a
    * shuffle (used by specs/ops to validate layout assumptions). */
  def joinIsShuffleFree(joined: DataFrame): Boolean = {
    joined.count()
    !joined.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
  }
}
