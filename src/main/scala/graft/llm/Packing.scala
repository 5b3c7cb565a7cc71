package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget bins (the
  * pretraining "pack documents into context windows" step).
  *
  * Semantics — greedy sequential first-fit: documents are taken in
  * `orderCol` order within each `keyCol` group; a document joins the
  * current bin if it fits, otherwise opens a new one. A single document
  * larger than the budget gets its own (overflowing) bin — the caller
  * truncates or splits those upstream; packing never drops data.
  *
  * Scale shape: greedy packing is inherently serial PER GROUP, so the
  * parallelism unit is the group key (language, source, shard id — at
  * 100 TB pick a key with enough cardinality, e.g. `source` × a hash
  * shard). The plan is ONE shuffle on the key with a secondary sort,
  * then a single streaming pass per partition (`mapPartitions` with
  * O(1) state — no group is ever materialized in memory, so a skewed
  * giant group costs time, not heap). This is the textbook
  * secondary-sort pattern; a `groupByKey.flatMapGroups` would instead
  * buffer each group.
  */
object Packing {

  /** One packed row: the group key, the document's order value and
    * token count, and its assigned bin (0-based per key). */
  final case class Packed(pack_key: String, ord: Long, n_tokens: Long, bin_id: Long)

  /** Pack `df` rows into bins of at most `capacity` tokens, greedily in
    * `orderCol` order within each `keyCol` group. Deterministic: the
    * assignment is a pure function of (key, order, tokens) — replay-
    * stable regardless of physical layout. When `orderCol` is not unique
    * within a key, `n_tokens` is the tiebreak, which makes the OUTPUT
    * MULTISET deterministic (rows tied on both order and tokens are
    * interchangeable for packing state, so any order among them yields
    * the same rows); callers who need a stable bin per physical row
    * should supply a unique `orderCol` (e.g. doc_id). */
  def packGreedy(df: DataFrame, keyCol: String, orderCol: String, tokCol: String,
                 capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        col(keyCol).cast("string").as("pack_key"),
        col(orderCol).cast("long").as("ord"),
        coalesce(col(tokCol).cast("long"), lit(0L)).as("n_tokens"))
      // all rows of one key land in one partition, sorted by (key, ord);
      // a partition may hold several keys back-to-back — the pass below
      // resets its state at each key change
      .repartition(col("pack_key"))
      .sortWithinPartitions("pack_key", "ord", "n_tokens")
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        var curKey: Option[String] = None
        var fill = 0L
        var bin = -1L
        it.map { case (k, o, t) =>
          if (!curKey.contains(k)) { curKey = Some(k); fill = 0L; bin = -1L }
          if (bin < 0L || fill + t > capacity) { bin += 1; fill = t }
          else fill += t
          Packed(k, o, t, bin)
        }
      }
      .toDF()
  }

  /** LENGTH-BUCKETED packing (sorted batching): documents group by
    * `floor(log2(tokens))` before the greedy first-fit runs per
    * bucket — similar-length sequences pack together, which is the
    * standard padding-waste lever for training batches (a 500-token
    * doc never strands 3500 tokens of a 4096 bin shared with shorts).
    * Empty documents are excluded (no tokens to pack). Same greedy
    * replay contract as [[packGreedy]], per bucket. */
  def packByLengthBucket(docs: DataFrame, idCol: String, tokCol: String,
                         capacity: Long): DataFrame = {
    val n = coalesce(col(tokCol).cast("long"), lit(0L))
    val bucketed = docs.filter(n > 0)
      .withColumn("len_bucket", floor(log2(n.cast("double"))).cast("long"))
    packGreedy(bucketed, "len_bucket", idCol, tokCol, capacity)
  }

  /** Per-bucket padding-waste report over a [[packByLengthBucket]]
    * result: bins opened, tokens packed, and the padding a
    * fixed-capacity batch of each bin would waste — the number the
    * bucketing exists to shrink. */
  def paddingWaste(packed: DataFrame, capacity: Long): DataFrame =
    packed.groupBy(col("pack_key").as("len_bucket"))
      .agg(count(lit(1)).as("n_docs"),
        (max(col("bin_id")) + 1).as("n_bins"),
        sum(col("n_tokens")).as("n_tokens"))
      .withColumn("padding_waste", col("n_bins") * capacity - col("n_tokens"))
}
