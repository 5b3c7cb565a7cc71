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
/** @param filesPerVersion writer count per committed version. 0 (the
  *   default) writes at the frame's own parallelism — right for large
  *   tables, where collapsing writers would serialize the commit. Set
  *   1 (or small) for KNOWN-SMALL stores — dimension tables, rollup
  *   states, dbt fixtures: at shuffle-partition parallelism a 10k-row
  *   snapshot otherwise lands as 32 near-empty files whose per-file
  *   task + fs cost dominates the commit, and every later read of the
  *   version chain pays the same small-files tax again (the same
  *   explicit-knob contract as [[PartitionedStore]]'s
  *   `filesPerPartition`). Uses repartition, not coalesce — coalesce
  *   would propagate the collapsed parallelism UP into the merge
  *   computation itself. */
final class TableStore(spark: SparkSession, root: String,
                       mergeBatchKeepVersions: Int = 4,
                       filesPerVersion: Int = 0) extends MergeSink {
  require(filesPerVersion >= 0, "filesPerVersion must be >= 0 (0 = frame parallelism)")

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def versions: Seq[Int] = {
    val p = new Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toInt).sorted
  }

  def latestVersion: Option[Int] = versions.lastOption

  /** Directories of the latest version's chain (ascending) — for
    * driver-side footer probes that avoid a Spark job on known-small
    * stores (e.g. the streaming fold marker). */
  private[graft] def latestChainDirs: Option[Seq[String]] =
    latestVersion.map(v => chain(v).map(x => s"$root/v=$x"))

  /** The versions whose data participates in `v`: `v` itself, then its
    * delta ancestry down to the nearest full snapshot (ascending order).
    * A full version is its own one-element chain. */
  private[pipeline] def chain(v: Int): Seq[Int] = {
    var cur = v
    var acc = List(v)
    while (fs.exists(new Path(s"$root/v=$cur/${TableStore.DeltaMarker}"))) {
      val in = fs.open(new Path(s"$root/v=$cur/${TableStore.DeltaMarker}"))
      val parent = try new String(in.readAllBytes(), "UTF-8").trim.toInt finally in.close()
      require(parent < cur, s"corrupt delta chain at v=$cur (parent $parent)")
      acc = parent :: acc
      cur = parent
    }
    acc
  }

  def read: Option[DataFrame] =
    latestVersion.map(readAt)

  /** Time travel: the table as of committed version `v` (any version
    * [[prune]] hasn't dropped — an append head resolves its whole delta
    * ancestry, so old heads stay readable as long as their chain
    * survives). Reading an old version is how a bad merge is audited or
    * a consumer pinned while a backfill lands. */
  def readAt(v: Int): DataFrame = {
    require(versions.contains(v), s"version $v of $root does not exist (have: ${versions.mkString(",")})")
    val dirs = chain(v).map(x => s"$root/v=$x")
    // version dirs are immutable (rename-committed): the head version's
    // cached schema serves the whole chain without an inference job per
    // read — at streaming cadence that job ran EVERY tick. The schema-
    // less multi-dir read took one arbitrary footer anyway, so pinning
    // the head's (the newest writer's) is strictly more deterministic.
    spark.read.schema(SegmentIO.schemaOf(spark, dirs.last)).parquet(dirs: _*)
  }

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
  def snapshot(df: DataFrame): Int = commitVersion(df, parentDelta = None)

  /** Version-additive APPEND: ONLY the batch is written — a new version
    * directory carrying a `_delta_parent` marker, so the commit is
    * O(batch) bytes where a `read.union(batch)` snapshot is O(table)
    * (dbt's append incremental strategy, terabytes-per-run wrong at
    * scale). Readers resolve the delta chain down to the nearest full
    * snapshot and scan all member directories — the standard
    * log-structured layout; a periodic [[snapshot]] (or [[upsert]])
    * compacts the chain. Same atomic staged-rename commit as
    * [[snapshot]]: the marker travels inside the staged dir, so a torn
    * append can never install a half-linked version. */
  def append(df: DataFrame): Int =
    commitVersion(df, parentDelta = latestVersion)

  /** Number of version directories a reader of the latest version scans
    * (1 for a full snapshot, chain length for an append head). */
  def chainLength: Int = latestVersion.map(chain(_).length).getOrElse(0)

  /** Collapse the current delta chain into ONE full version (small-files
    * compaction). Read amplification on an append table grows with every
    * [[append]] — each run adds a directory (and at 5-minute cadence,
    * hundreds per day), so scans degrade from one columnar sweep to a
    * many-directory union of small files. Compaction rewrites the
    * resolved chain as a single snapshot version with the same atomic
    * staged-rename commit; a crash mid-compact leaves the chain intact
    * (readers keep resolving it) and the orphaned staging dir is swept
    * by the next commit. No-op on an empty store. */
  def compact(): Option[Int] = read.map(snapshot)

  /** Append, then compact iff the resulting chain exceeds `maxChain`
    * members — amortized O(batch) writes with bounded read
    * amplification: with threshold c, a table of N bytes built from
    * B-byte batches writes N·(1 + 1/c) total bytes instead of O(N²/B)
    * for snapshot-per-run, while readers never union more than c
    * directories. Crash between the two commits is safe: the append is
    * already durable, and the skipped compaction re-triggers on the
    * next over-threshold append. */
  def append(df: DataFrame, maxChain: Int): Int = {
    val v = append(df)
    if (maxChain > 0 && chain(v).length > maxChain) compact().getOrElse(v) else v
  }

  private def commitVersion(df: DataFrame, parentDelta: Option[Int]): Int = {
    val rootP = new Path(root)
    if (fs.exists(rootP)) // sweep staging dirs orphaned by earlier crashes
      fs.listStatus(rootP).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(".tmp_v="))
        .foreach(s => fs.delete(s.getPath, true))
    val v = latestVersion.getOrElse(0) + 1
    val tmp = new Path(s"$root/.tmp_v=$v")
    val out = if (filesPerVersion > 0) df.repartition(filesPerVersion) else df
    out.write.mode("overwrite").parquet(tmp.toString)
    parentDelta.foreach { parent =>
      val out = fs.create(new Path(tmp, TableStore.DeltaMarker), true)
      try out.write(parent.toString.getBytes("UTF-8")) finally out.close()
    }
    if (!fs.rename(tmp, new Path(s"$root/v=$v")))
      throw new java.io.IOException(s"failed to commit version $v of $root")
    v
  }

  /** [[MergeSink]] binding: full-table rewrite per batch (see the trait
    * doc for when that's the right trade), then [[prune]] down to
    * `mergeBatchKeepVersions` — a streaming cadence would otherwise
    * accumulate a full table copy per micro-batch (288/day at 5
    * minutes), which is unbounded disk for zero read value. Prune after
    * a committed upsert is crash-safe (it only drops versions no
    * current reader resolution needs); direct [[upsert]] callers keep
    * manual retention control. */
  override def mergeBatch(batch: DataFrame, cfg: TableConfig): Unit = {
    upsert(batch, cfg)
    prune(keep = mergeBatchKeepVersions)
  }

  /** M1/M2 — keyed upsert against the latest version, committed as the
    * next version. First write = plain insert. */
  def upsert(source: DataFrame, cfg: TableConfig): Int =
    read match {
      case None         => snapshot(MergeEngine.latestPerKey(source, cfg.keys,
        cfg.cursorField.map(c => org.apache.spark.sql.functions.col(c).desc_nulls_last).toSeq))
      case Some(target) => snapshot(MergeEngine.upsert(target, source, cfg))
    }

  /** Drop all but the newest `keep` versions (vacuum). Chain-aware: a
    * kept append head keeps its whole delta ancestry alive — pruning a
    * chain member would silently truncate the table. */
  def prune(keep: Int = 2): Unit = {
    val required = versions.takeRight(keep).flatMap(chain).toSet
    versions.filterNot(required).foreach(v => fs.delete(new Path(s"$root/v=$v"), true))
  }
}

object TableStore {
  /** File inside an appended version dir naming its parent version.
    * Underscore-prefixed so Spark's parquet reader ignores it as a
    * metadata file (the `_SUCCESS` convention). */
  private[pipeline] val DeltaMarker = "_delta_parent"
}
