package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter group keys (SURVEY.md §4; the
  * 100 TB design note in the build plan).
  *
  * A straight `groupBy(key)` over a key with a dominant value sends that
  * value's entire volume to one reducer. Salting splits each key into
  * `buckets` sub-groups for the first (partial) aggregation, then a cheap
  * second aggregation over the tiny partial results removes the salt.
  * Works for any decomposable aggregate (sum/count/min/max; avg = sum +
  * count). The salt is a deterministic content hash, so replays produce
  * identical partials — no `rand()`.
  *
  * Complementary to AQE's skew-join splitting (enabled in
  * [[graft.GraftSession]]), which handles JOIN skew at runtime; salting
  * handles AGGREGATION skew the planner can't split.
  */
object Skew {

  /** Decomposable aggregate spec: (partial expression, final combiner). */
  final case class SaltedAgg(partial: Column, finalAgg: String => Column, name: String)

  def saltedSum(c: Column, as: String): SaltedAgg =
    SaltedAgg(sum(c), n => sum(col(n)), as)
  def saltedCount(as: String): SaltedAgg =
    SaltedAgg(count(lit(1)), n => sum(col(n)), as)
  def saltedMax(c: Column, as: String): SaltedAgg =
    SaltedAgg(max(c), n => max(col(n)), as)
  def saltedMin(c: Column, as: String): SaltedAgg =
    SaltedAgg(min(c), n => min(col(n)), as)

  /** Two-phase salted aggregation: `groupBy(keys + salt)` partials (the
    * skewed shuffle now spreads each key over `buckets` reducers), then
    * `groupBy(keys)` over the partials (tiny — `keys × buckets` rows).
    *
    * The salt is the row's pure content hash — DETERMINISTIC, so a
    * partial stage retry (map output lost after some reducers fetched)
    * recomputes rows into the same bucket every time; no double-count or
    * drop hazard. A layout-dependent ordinal (`spark_partition_id`,
    * `monotonically_increasing_id`) is deliberately NOT mixed in: it is
    * non-deterministic under partial stage retry, where recomputed rows
    * could land in different buckets than the lost attempt's, corrupting
    * the partial aggregates.
    *
    * Known limitation: byte-identical duplicate rows map to one bucket, so
    * a heavy hitter made of REPEATED IDENTICAL rows (raw event feeds) is
    * not spread. The fix belongs upstream — carry any distinguishing
    * column (ingest sequence, file offset, `input_file_name`) into `df`
    * and the content hash spreads them for free, retries staying safe. */
  def aggregate(df: DataFrame, keys: Seq[String], aggs: Seq[SaltedAgg],
                buckets: Int = 16): DataFrame = {
    require(buckets > 0 && aggs.nonEmpty)
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(buckets.toLong)))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col).toSeq: _*)
      .agg(aggs.head.partial.as(s"__p_${aggs.head.name}"),
           aggs.tail.map(a => a.partial.as(s"__p_${a.name}")): _*)
    partial
      .groupBy(keys.map(col).toSeq: _*)
      .agg(aggs.head.finalAgg(s"__p_${aggs.head.name}").as(aggs.head.name),
           aggs.tail.map(a => a.finalAgg(s"__p_${a.name}").as(a.name)): _*)
  }

  /** Salted equi-join for skewed keys: the big side gets a deterministic
    * content-hash salt in [0, buckets); the small side replicates once
    * per salt value, so a heavy-hitter key's rows spread over `buckets`
    * reducers instead of hot-spotting one. Result is identical to the
    * plain join (every big row meets the full small side for its key).
    *
    * Only inner and left joins are supported — the replicated side
    * cannot drive a right/full outer without emitting its unmatched rows
    * `buckets` times. Same salt-determinism rationale as [[aggregate]]:
    * content hash, never a layout-dependent ordinal, so partial stage
    * retries re-salt identically. AQE's skew-join handles sort-merge
    * skew at runtime; this handles the case AQE cannot — skew through a
    * shuffled hash join or where one key alone exceeds a single
    * executor's memory. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 buckets: Int = 16, joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(Set("inner", "left", "leftouter", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins, got $joinType")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toSeq: _*), lit(buckets.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedBig.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
