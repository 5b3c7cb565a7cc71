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
  */
trait MergeSink {
  /** Merge one batch by `cfg.keys` under `cfg`'s cursor/guard semantics. */
  def mergeBatch(batch: DataFrame, cfg: TableConfig): Unit
}
