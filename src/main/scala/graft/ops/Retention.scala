package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention analysis over an event stream — the companion of
  * [[Funnel]]: users are grouped by the day of their FIRST event (the
  * cohort), and each cohort's share of users still active N periods
  * later is the retention matrix every growth/engagement dashboard
  * carries (reference analog: the reference's event-mart rollups feed
  * the same dashboards; SURVEY §2 A5 family).
  *
  * Periods are fixed-width day buckets (`periodDays`, default 7)
  * anchored at each user's OWN cohort day — deliberately not calendar
  * weeks, whose Monday-vs-Sunday convention differs across engines and
  * locales; floor(days-since-first / periodDays) is unambiguous
  * everywhere.
  *
  * Scale shape (100 TB of events): one shuffle by user for the
  * first-event aggregate, one distinct on (user, day) — both partial-
  * aggregated map-side; the user-keyed join is co-partitioned on the
  * same key; the final (cohort, period) aggregate and the cohort-size
  * join are dimension-sized (days × periods), broadcast. No windows,
  * no per-user state beyond the aggregates.
  */
object Retention {

  /** (cohort_day, period_n, n_active, n_cohort, retention_rate), one
    * row per cohort × period with at least one active user. period_n=0
    * is the cohort's own first period (retention 1.0 by construction —
    * every user is active in the period of their first event). */
  def retentionMatrix(events: DataFrame, userCol: String, tsCol: String,
                      periodDays: Int = 7, maxPeriods: Int = 12): DataFrame = {
    require(periodDays > 0 && maxPeriods >= 0)
    val day = to_date(col(tsCol))
    val firsts = events.groupBy(col(userCol).as("__u"))
      .agg(min(day).as("cohort_day"))
    val acts = events.select(col(userCol).as("__u"), day.as("__d")).distinct()
    val periods = acts.join(firsts, "__u")
      .withColumn("period_n",
        floor(datediff(col("__d"), col("cohort_day")) / periodDays).cast("int"))
      .filter(col("period_n") <= maxPeriods)
      .select("__u", "cohort_day", "period_n").distinct()
    val sizes = firsts.groupBy("cohort_day").agg(count(lit(1)).as("n_cohort"))
    periods.groupBy("cohort_day", "period_n")
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort_day")
      .withColumn("retention_rate", round(col("n_active") / col("n_cohort"), 6))
  }
}
