package graft.ops

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ev(day: String, k: String, v: Double) =
    (Timestamp.valueOf(s"$day 10:00:00"), k, v)

  test("rolling window ages out by calendar VALUE across series gaps") {
    // days 1, 2, then a gap to day 9: with a 3-day trailing window the
    // day-9 row must contain ONLY day 9 (a ROWS frame would wrongly
    // stretch back to day 2)
    val df = Seq(
      ev("2024-01-01", "a", 10.0), ev("2024-01-01", "a", 5.0),
      ev("2024-01-02", "a", 2.0),
      ev("2024-01-09", "a", 7.0)).toDF("ts", "k", "v")
    val out = TimeSeries.rollingDaily(df, "ts", Seq("k"), "v", windowDays = 3)
      .orderBy("day")
      .select(date_format(col("day"), "yyyy-MM-dd"), col("n"),
        col("total").cast("double"), col("rolling_n"),
        col("rolling_total").cast("double"), col("delta_total").cast("double"))
      .collect().map(_.toSeq)
    assert(out.toSeq == Seq(
      Seq("2024-01-01", 2L, 15.0, 2L, 15.0, 15.0),
      Seq("2024-01-02", 1L, 2.0, 3L, 17.0, -13.0),
      Seq("2024-01-09", 1L, 7.0, 1L, 7.0, 5.0)))
  }

  test("rolling features are per-key independent; avg is total/n") {
    val df = Seq(
      ev("2024-01-01", "a", 4.0), ev("2024-01-02", "a", 8.0),
      ev("2024-01-01", "b", 100.0)).toDF("ts", "k", "v")
    val out = TimeSeries.rollingDaily(df, "ts", Seq("k"), "v", windowDays = 7)
      .select(col("k"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("rolling_avg"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out(("a", "2024-01-01")) == 4.0)
    assert(out(("a", "2024-01-02")) == 6.0) // (4+8)/2
    assert(out(("b", "2024-01-01")) == 100.0)
  }
}
