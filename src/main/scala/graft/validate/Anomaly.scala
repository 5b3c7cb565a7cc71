package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust anomaly guardrails for metric time series — the statistical
  * layer over [[graft.meta.RunMeta]]'s run metrics and any per-key
  * daily rollup: flag points whose modified z-score (Iglewicz &
  * Hoaglin 1993: 0.6745·(x − median)/MAD) exceeds a threshold.
  * Median/MAD are the robust location/scale pair — a single spike
  * cannot drag the baseline the way it drags a mean/stddev gate, which
  * is exactly the failure mode of naive alerting on pipeline volumes.
  *
  * Scale contract: the window partitions by the SERIES key (one metric
  * name, one event type). A series is bounded by its cadence — years
  * of daily points is thousands of rows — so the per-partition
  * materialization the exact median needs is small by construction, at
  * any corpus size; cardinality lives in the NUMBER of series, which
  * is the partition axis. For unbounded single-series use the KLL
  * sketch aggregate ([[graft.functions.QuantileSketch]]) is the
  * approximate path.
  */
object Anomaly {

  /** Adds `robust_z` (rounded to 6, NULL when the series' MAD is 0 —
    * a constant series has no scale to score against) and `is_anomaly`
    * (|robust_z| > threshold, false where z is NULL) to every row.
    * Exact interpolated medians (`percentile`, the same linear rule as
    * DuckDB's quantile_cont) so the guardrail is deterministic and
    * oracle-checkable. */
  def madOutliers(series: DataFrame, keyCols: Seq[String], valueCol: String,
                  threshold: Double = 3.5): DataFrame = {
    require(keyCols.nonEmpty, "need at least one series key column")
    val w = Window.partitionBy(keyCols.map(col): _*)
    val v: Column = col(valueCol).cast("double")
    val med = expr(s"percentile($valueCol, 0.5)").over(w)
    val withMed = series.withColumn("__med", med)
      .withColumn("__absdev", abs(v - col("__med")))
    val mad = expr("percentile(__absdev, 0.5)").over(w)
    withMed.withColumn("__mad", mad)
      .withColumn("robust_z",
        when(col("__mad") === 0.0d, lit(null).cast("double"))
          .otherwise(round(lit(0.6745d) * (v - col("__med")) / col("__mad"), 6)))
      .withColumn("is_anomaly",
        coalesce(abs(col("robust_z")) > threshold, lit(false)))
      .drop("__med", "__absdev", "__mad")
  }
}
