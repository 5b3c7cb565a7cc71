package graft.pipeline

import graft.merge.MergeEngine
import graft.schema.TableConfig
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-scoped ODS table — the scale path for the 5-minute re-merge
  * cadence (the versioned [[TableStore]] rewrites the FULL table per
  * merge; at 100 TB that is the bottleneck round 1's audit called out).
  *
  * Layout: `root/<partitionCol>=<value>/part-*.parquet` (standard Hive
  * partitioning). A merge:
  *   1. finds the partitions the source batch touches (a distinct over
  *      the batch — small);
  *   2. reads ONLY those target partitions (partition-pruned scan);
  *   3. runs the same [[MergeEngine.upsert]] algebra on that slice;
  *   4. writes the merged slice to a staging directory, then swaps the
  *      affected partition directories by backup-rename — untouched
  *      partitions are never read, rewritten, or moved.
  *
  * Failure envelope (stated): the merged output is fully materialized in
  * the staging dir before any target file moves, so executor loss during
  * the WRITE never corrupts the table; the per-partition swap itself is
  * not transactional — a driver crash mid-swap leaves a `.swap_<dir>`
  * backup beside the table (recoverCrashedSwaps self-heals on the next
  * merge) rather than silent loss. For an ATOMIC multi-partition commit
  * use [[ManifestStore]] — immutable segments + one manifest-pointer
  * rename, readers see all-old or all-new — at the price of giving up
  * the plain Hive directory layout external readers may expect. The
  * merge algebra is identical in both.
  */
final class PartitionedStore(spark: SparkSession, root: String, partitionCol: String,
                             filesPerPartition: Int = 0) extends MergeSink {
  require(filesPerPartition >= 0, "filesPerPartition must be >= 0 (0 = auto)")

  /** [[MergeSink]] binding: partition-scoped upsert — only the
    * directories a micro-batch touches are rewritten. */
  override def mergeBatch(batch: DataFrame, cfg: TableConfig): Unit = { upsert(batch, cfg); () }

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = fs.exists(new Path(root))

  def read: Option[DataFrame] =
    if (exists) Some(spark.read.option("basePath", root).parquet(root)) else None

  /** Cluster rows by their target directory before a partitioned write.
    * Without this every write task fans out into every touched partition
    * directory — shufflePartitions × partitions small files per merge
    * batch, the classic small-files failure that compounds at a 5-minute
    * cadence. A content-hash salt spreads each partition over several
    * writers so a huge partition never serializes onto one task.
    *
    * `filesPerPartition = 0` (default) sizes the salt at ~512 MB per
    * writer from `sizeHint` bytes, clamped to the shuffle-partition
    * count — a small merge batch writes one file per partition, a 100 TB
    * initial snapshot keeps full write parallelism. The hint is taken
    * from SCAN-shaped plans only (callers pass the sum of the join
    * inputs for a merge): Catalyst's size-only estimate for a join plan
    * is the PRODUCT of its children, which would saturate the clamp on
    * every 5-minute batch and reinstate the small-files fanout. Pin
    * `filesPerPartition` explicitly when no honest estimate exists. */
  private def planBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  private def clustered(df: DataFrame, sizeHint: => BigInt): DataFrame = {
    val n =
      if (filesPerPartition > 0) filesPerPartition
      else {
        val perWriter = BigInt(512L * 1024 * 1024)
        val cap = BigInt(spark.sessionState.conf.numShufflePartitions)
        ((sizeHint / perWriter + 1).min(cap).max(1)).toInt
      }
    if (n == 1) df.repartition(col(partitionCol))
    else df.repartition(col(partitionCol),
      pmod(xxhash64(df.columns.map(col): _*), lit(n.toLong)))
  }

  /** Initial load / full snapshot (M3). */
  def snapshot(df: DataFrame): Unit =
    clustered(df, planBytes(df)).write.mode("overwrite").partitionBy(partitionCol).parquet(root)

  /** Values present in a batch — drives partition pruning and the swap. */
  private def partitionValues(df: DataFrame): Seq[String] =
    df.select(col(partitionCol).cast("string")).distinct()
      .collect().map(r => Option(r.getString(0)).getOrElse("__HIVE_DEFAULT_PARTITION__")).toSeq

  /** M1/M2 — keyed upsert touching only the partitions present in the
    * source batch. Requires rows to stay in their partition (the
    * partition column is part of the business identity — true for the
    * reference's date-partitioned facts). */
  /** Restore any partition whose previous swap crashed between the backup
    * rename and the install: the live dir is missing but its `.swap_`
    * backup survives. Run before every read-for-merge so a crashed swap
    * self-heals instead of the next merge rebuilding from source alone
    * (which would discard the backed-up history). Also sweeps `.staging_`
    * dirs orphaned by a writer that died BEFORE its finally-delete ran
    * (kill -9 mid-write): they are invisible to readers (dot-prefixed),
    * but at a 5-minute merge cadence un-swept staging bytes would grow
    * without bound — any staging dir present here belongs to a dead
    * writer, since a merge deletes its own before returning and
    * concurrent writers are out of contract. */
  private def recoverCrashedSwaps(): Unit = {
    val rootP = new Path(root)
    if (!fs.exists(rootP)) return
    fs.listStatus(rootP).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(".swap_"))
      .foreach { b =>
        val live = new Path(s"$root/${b.getPath.getName.stripPrefix(".swap_")}")
        if (!fs.exists(live)) fs.rename(b.getPath, live)
        else fs.delete(b.getPath, true) // swap completed; stale backup
      }
    fs.listStatus(rootP).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(".staging_"))
      .foreach(s => fs.delete(s.getPath, true))
  }

  def upsert(source: DataFrame, cfg: TableConfig): Seq[String] = {
    if (!exists) {
      // first write takes the same latest-per-key dedup as every later
      // merge (TableStore.upsert's None branch does too): duplicate source
      // keys persisted raw would fan out every subsequent full-outer merge
      // and key uniqueness would never be restored
      val cursorOrder = cfg.cursorField.map(c => col(c).desc_nulls_last).toSeq
      val deduped = MergeEngine.latestPerKey(source, cfg.keys, cursorOrder)
      snapshot(deduped); return partitionValues(deduped)
    }
    recoverCrashedSwaps()
    val affected = partitionValues(source)
    val affectedCols = affected.filterNot(_ == "__HIVE_DEFAULT_PARTITION__")

    // partition-pruned target slice: only affected directories are scanned
    val target = read.get.filter(col(partitionCol).cast("string").isin(affectedCols: _*) ||
      (if (affected.contains("__HIVE_DEFAULT_PARTITION__")) col(partitionCol).isNull else lit(false)))
    val merged = MergeEngine.upsert(target, source, cfg)

    // materialize to staging FIRST, then swap directories. Swap by the
    // directory names Spark actually WROTE (it percent-escapes special
    // characters in partition values — reconstructing names from raw
    // values would miss e.g. `ts=…10%3A00%3A00` and lose partitions).
    // Each swap is backup-rename-delete, so a crash mid-swap leaves a
    // recoverable `.swap_` backup rather than a missing partition.
    val stage = s"$root/.staging_${java.util.UUID.randomUUID().toString.take(8)}"
    // size hint = sum of the merge's scan inputs, NOT the join plan's
    // product-shaped estimate (see clustered)
    clustered(merged, planBytes(target) + planBytes(source))
      .write.mode("overwrite").partitionBy(partitionCol).parquet(stage)
    try {
      val stagedDirs = fs.listStatus(new Path(stage)).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$partitionCol="))
      for (sd <- stagedDirs) {
        val name = sd.getPath.getName
        val dst = new Path(s"$root/$name")
        val bak = new Path(s"$root/.swap_$name")
        if (fs.exists(bak)) fs.delete(bak, true)
        // every rename is CHECKED: an unchecked false return would either
        // lose the staged merge (deleted by the finally) or nest the
        // staged dir inside a still-existing dst on HDFS semantics
        if (fs.exists(dst)) {
          if (!fs.rename(dst, bak))
            throw new java.io.IOException(
              s"failed to back up partition $name; table left untouched")
        }
        if (!fs.rename(sd.getPath, dst)) {
          // restore the backup so the table is never left without the
          // partition, then fail loudly
          if (fs.exists(bak)) fs.rename(bak, dst)
          throw new java.io.IOException(s"failed to install merged partition $name")
        }
        if (fs.exists(bak)) fs.delete(bak, true)
      }
    } finally fs.delete(new Path(stage), true)
    affected
  }

  /** M4 — replace whole partitions from the source (delete-window+insert):
    * Spark's dynamic partition overwrite does exactly this natively. */
  def overwritePartitions(source: DataFrame): Unit = {
    val conf = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(conf)
    try {
      spark.conf.set(conf, "dynamic")
      clustered(source, planBytes(source))
        .write.mode("overwrite").partitionBy(partitionCol).parquet(root)
    } finally prev.fold(spark.conf.unset(conf))(spark.conf.set(conf, _))
  }
}
