package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling time-series features over a daily metric series — the
  * trailing-window smoothing every ops dashboard and drift monitor
  * reads (7-day rolling volume, trailing averages, day-over-day
  * deltas). Composes with [[graft.validate.Anomaly]]'s MAD guardrail
  * (robust center) the way a monitoring stack pairs a smoother with an
  * outlier gate.
  *
  * Scale shape: one hash aggregate to daily grain (the only pass over
  * the raw events — 100 TB collapses to |keys|·|days| rows), then
  * window functions over the TINY daily series. The rolling frame is a
  * RANGE frame over the day number, not ROWS: a gap in the series (a
  * day with no events) still ages out of the window by VALUE, where a
  * ROWS frame would silently stretch the window across the gap.
  * Sums stay in DECIMAL through the window (exact, order-independent);
  * ratios go double only at the end — the engine-portability rule the
  * rollup family established.
  */
object TimeSeries {

  /** Daily rollup of `valueCol` per `keys` with trailing `windowDays`
    * rolling count/sum/avg and the delta against the previous OBSERVED
    * day of the series (a first row deltas against 0). Emits one row
    * per (keys, day) present in the data; `day` is a DATE. */
  def rollingDaily(events: DataFrame, tsCol: String, keys: Seq[String],
                   valueCol: String, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val daily = events
      .groupBy(to_date(col(tsCol)).as("day") +: keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("total"))
    // RANGE frame over the epoch-day integer: trailing windowDays
    // calendar days including today, gap-correct
    val byKey = Window.partitionBy(keys.map(col): _*)
    val ordered = byKey.orderBy(col("__day_n"))
    val range = ordered.rangeBetween(-(windowDays - 1).toLong, 0L)
    daily.withColumn("__day_n", unix_date(col("day")))
      .withColumn("rolling_n", sum(col("n")).over(range))
      .withColumn("rolling_total", sum(col("total")).over(range))
      .withColumn("rolling_avg",
        round(col("rolling_total").cast("double") / col("rolling_n"), 6))
      .withColumn("delta_total",
        col("total") - coalesce(lag(col("total"), 1).over(ordered), lit(0).cast("decimal(18,2)")))
      .drop("__day_n")
      .select(keys.map(col) ++ Seq(col("day"), col("n"), col("total"),
        col("rolling_n"), col("rolling_total"), col("rolling_avg"),
        col("delta_total")): _*)
  }
}
