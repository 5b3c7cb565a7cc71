package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private def ev(u: Long, day: String) = (u, java.sql.Timestamp.valueOf(s"$day 12:00:00"))

  test("cohorts anchor at each user's first day; periods are 7-day buckets") {
    val events = Seq(
      ev(1, "2024-01-01"), ev(1, "2024-01-03"), // same period 0
      ev(1, "2024-01-09"),                      // period 1
      ev(2, "2024-01-01"), ev(2, "2024-01-20"), // periods 0 and 2
      ev(3, "2024-01-02")                       // different cohort, period 0 only
    ).toDF("user_id", "ts")
    val m = Retention.retentionMatrix(events, "user_id", "ts")
      .withColumn("cohort_day", date_format(col("cohort_day"), "yyyy-MM-dd"))
    assert(canon(m) == Seq(
      Seq("2024-01-01", "0", "2", "2", "1.0"),
      Seq("2024-01-01", "1", "1", "2", "0.5"),
      Seq("2024-01-01", "2", "1", "2", "0.5"),
      Seq("2024-01-02", "0", "1", "1", "1.0")
    ))
  }

  test("maxPeriods truncates the tail") {
    val events = Seq(ev(1, "2024-01-01"), ev(1, "2024-12-01")).toDF("user_id", "ts")
    val m = Retention.retentionMatrix(events, "user_id", "ts", maxPeriods = 4)
    assert(m.agg(max("period_n")).head().getInt(0) == 0)
  }
}
