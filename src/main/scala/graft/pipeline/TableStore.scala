package graft.pipeline

import graft.merge.MergeEngine
import graft.schema.TableConfig
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet table store — the durable ODS layer under the merge
  * algebra (SURVEY.md §2.6).
  *
  * A merge's output cannot overwrite the parquet directory it is still
  * reading, so each write lands in a fresh `v=N` subdirectory and readers
  * take the highest committed version — snapshot isolation by pointer
  * swap, the minimal file-layout ACID story without a table format.
  *
  * Scale note (stated, deliberate): [[upsert]] rewrites the full table per
  * merge — correct algebra, simplest durable layout. For time-partitioned
  * facts at the 5-minute cadence use [[PartitionedStore]], whose merge
  * reads and rewrites ONLY the partitions a batch touches; a
  * transactional format (Delta/Iceberg) refines that further to
  * file-level pruning. The merge ALGORITHM is identical in all three —
  * only the sink swaps.
  */
final class TableStore(spark: SparkSession, root: String) {

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def versions: Seq[Int] = {
    val p = new Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toInt).sorted
  }

  def latestVersion: Option[Int] = versions.lastOption

  def read: Option[DataFrame] =
    latestVersion.map(v => spark.read.parquet(s"$root/v=$v"))

  def readOrEmpty(schemaOf: DataFrame): DataFrame =
    read.getOrElse(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schemaOf.schema))

  /** M3 — snapshot replace: the new frame becomes the next version.
    *
    * Committed by ATOMIC RENAME: the frame fully materializes in a
    * `.tmp_` staging dir, then one directory rename installs `v=N`.
    * A crash mid-write leaves only an orphaned staging dir that
    * [[versions]] never lists and the next snapshot sweeps — readers
    * (and anything trusting read-back state, e.g. the streaming
    * rollup's replay stamp) can never observe a torn version. */
  def snapshot(df: DataFrame): Int = {
    val rootP = new Path(root)
    if (fs.exists(rootP)) // sweep staging dirs orphaned by earlier crashes
      fs.listStatus(rootP).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(".tmp_v="))
        .foreach(s => fs.delete(s.getPath, true))
    val v = latestVersion.getOrElse(0) + 1
    val tmp = new Path(s"$root/.tmp_v=$v")
    df.write.mode("overwrite").parquet(tmp.toString)
    if (!fs.rename(tmp, new Path(s"$root/v=$v")))
      throw new java.io.IOException(s"failed to commit version $v of $root")
    v
  }

  /** M1/M2 — keyed upsert against the latest version, committed as the
    * next version. First write = plain insert. */
  def upsert(source: DataFrame, cfg: TableConfig): Int =
    read match {
      case None         => snapshot(MergeEngine.latestPerKey(source, cfg.keys,
        cfg.cursorField.map(c => org.apache.spark.sql.functions.col(c).desc_nulls_last).toSeq))
      case Some(target) => snapshot(MergeEngine.upsert(target, source, cfg))
    }

  /** Drop all but the newest `keep` versions (vacuum). */
  def prune(keep: Int = 2): Unit =
    versions.dropRight(keep).foreach(v => fs.delete(new Path(s"$root/v=$v"), true))
}
