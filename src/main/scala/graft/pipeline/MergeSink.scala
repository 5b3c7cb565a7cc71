package graft.pipeline

import graft.schema.TableConfig
import org.apache.spark.sql.DataFrame

/** One micro-batch keyed-merge sink — the seam between streaming ingest
  * ([[graft.streaming.StreamOps.mergeAvailable]]) and the durable table
  * layouts. Every implementation is idempotent per batch (replaying a
  * micro-batch converges to the same table), which together with the
  * stream checkpoint gives effectively-once upserts. What differs is the
  * WRITE SCOPE of one batch:
  *
  *   - [[TableStore]] rewrites the full table per merge — fine for small
  *     dimensions, but O(table) IO per tick is the scale-killer for a
  *     100 TB fact at the reference's 5-minute CDC cadence;
  *   - [[PartitionedStore]] and [[ManifestStore]] write only the
  *     partitions the batch touches — O(batch) IO per tick;
  *     [[ManifestStore]] additionally commits all touched partitions in
  *     ONE atomic manifest rename (readers never see a torn merge).
  *
  * The merge ALGORITHM (latest-per-key, cursor ordering, guard) is
  * identical across sinks — `MergeEngine` owns it; the sink only decides
  * what gets rewritten and how the commit lands.
  *
  * PRECONDITION for the partition-scoped sinks: the partition value must
  * be IMMUTABLE per key — derived from the business identity (a created
  * date, a tenant, a static shard), never from a mutable attribute. An
  * update that moved a key to a different partition would leave the old
  * partition's row untouched (only touched partitions are read), so the
  * key would appear twice. TableStore, which rewrites the whole table,
  * has no such constraint — it replaces the row wherever it was. This is
  * the same contract every partition-pruned merge layout carries
  * (Hive-style dynamic overwrite included); validating it would cost a
  * cross-partition key probe per batch, which is exactly the O(table)
  * work these sinks exist to avoid.
  */
trait MergeSink {
  /** Merge one batch by `cfg.keys` under `cfg`'s cursor/guard semantics.
    * See the trait doc for the partition-immutability precondition the
    * partition-scoped implementations require. */
  def mergeBatch(batch: DataFrame, cfg: TableConfig): Unit
}
