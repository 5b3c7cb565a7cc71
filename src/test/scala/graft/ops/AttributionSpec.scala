package graft.ops

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, u: Long, t: String, ty: String, v: Double) =
    (id, u, Timestamp.valueOf(t), ty, v)

  private def run(rows: Seq[(Long, Long, Timestamp, String, Double)]) =
    Attribution.linearAttribution(
      rows.toDF("event_id", "user_id", "ts", "event_type", "value"),
      "event_id", "user_id", "ts", "event_type", "value",
      touchTypes = Seq("view", "click"), convType = "purchase", lookback = "1 hour")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap

  test("linear credit splits across in-window touches; floor ppm semantics") {
    // purchase of $30 at 12:00 with 3 touches in window (2 views, 1 click):
    // each touch gets floor(1e6/3) = 333333 ppm and floor(3000*1e6/3) =
    // 1e9 microcents ($10)
    val out = run(Seq(
      ev(1, 7, "2024-01-01 11:10:00", "view", 0),
      ev(2, 7, "2024-01-01 11:20:00", "view", 0),
      ev(3, 7, "2024-01-01 11:30:00", "click", 0),
      ev(4, 7, "2024-01-01 12:00:00", "purchase", 30.0)))
    assert(out("view") == ((2L, 0.666666, 20.0)))  // 2·333333 ppm
    assert(out("click") == ((1L, 0.333333, 10.0)))
    assert(!out.contains("(direct)"))
  }

  test("touches outside the lookback or after the conversion earn nothing") {
    val out = run(Seq(
      ev(1, 7, "2024-01-01 10:00:00", "view", 0),     // 2h before: out of window
      ev(2, 7, "2024-01-01 12:30:00", "click", 0),    // after the purchase
      ev(3, 7, "2024-01-01 12:00:00", "purchase", 10.0)))
    assert(out.keySet == Set("(direct)"))
    assert(out("(direct)") == ((1L, 1.0, 10.0)))
  }

  test("credit is per-user: another user's touches never leak in") {
    val out = run(Seq(
      ev(1, 8, "2024-01-01 11:50:00", "view", 0),     // different user
      ev(2, 7, "2024-01-01 11:55:00", "click", 0),
      ev(3, 7, "2024-01-01 12:00:00", "purchase", 50.0)))
    assert(out("click") == ((1L, 1.0, 50.0)))
    assert(!out.contains("view"))      // user 8's view earns nothing
    assert(!out.contains("(direct)"))  // the purchase WAS touched
  }

  test("a touch at exactly the conversion instant is credited (inclusive bound)") {
    val out = run(Seq(
      ev(1, 7, "2024-01-01 12:00:00", "view", 0),
      ev(2, 7, "2024-01-01 12:00:00", "purchase", 8.0)))
    assert(out("view") == ((1L, 1.0, 8.0)))
  }

  test("ledger conservation: total attributed conversions ≈ conversion count") {
    val rows = (1 to 50).flatMap { i =>
      Seq(ev(i * 10L, i % 5L, f"2024-01-01 11:${i % 60}%02d:00", "view", 0),
        ev(i * 10L + 1, i % 5L, "2024-01-01 12:00:00", "purchase", 10.0))
    }
    val out = run(rows)
    val total = out.values.map(_._2).sum
    // each conversion's ppm sums to ≤ 1e6, short at most (n−1) ppm
    assert(total <= 50.0 + 1e-9)
    assert(total > 49.9)
  }
}
