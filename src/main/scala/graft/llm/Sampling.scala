package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` depends on partitioning and RNG state — rerunning a
  * pipeline yields a different sample, which breaks replayable builds.
  * Hash-based sampling decides membership from row CONTENT: the same row
  * is in or out on every run, on any cluster layout, and the property
  * composes with incremental processing (new rows don't reshuffle old
  * decisions — the reservoir problem solved by determinism).
  */
object Sampling {

  /** Bernoulli-style sample: keep rows whose seeded content hash falls
    * under the fraction. Reproducible, partition-independent. */
  def deterministicSample(df: DataFrame, fraction: Double, seed: Long = 42L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    val bucket = pmod(xxhash64((lit(seed) +: df.columns.map(col).toSeq): _*), lit(1000000L))
    df.filter(bucket < (fraction * 1000000L).toLong)
  }

  /** Fixed-size per-stratum sample: the n rows with the lowest seeded
    * hash per stratum (bottom-k-by-hash ≡ uniform without replacement).
    * One shuffle on the strata key. */
  def stratifiedFixedSample(df: DataFrame, strataCols: Seq[String], n: Int,
                            seed: Long = 42L): DataFrame = {
    require(n > 0, "n must be positive")
    val w = Window.partitionBy(strataCols.map(col).toSeq: _*)
      .orderBy(xxhash64((lit(seed) +: df.columns.map(col).toSeq): _*).asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= n).drop("__rn")
  }
}
