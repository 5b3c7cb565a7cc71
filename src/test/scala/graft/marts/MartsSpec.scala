package graft.marts

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class MartsSpec extends SparkSpec {
  import spark.implicits._

  test("joinAgg: left join keeps unmatched fact rows; sums per group") {
    val fact = Seq((1, "k1", 10.0), (1, "k1", 5.0), (2, "k2", 7.0), (9, "k3", 1.0))
      .toDF("dim_id", "grp", "amt")
    val dim = Seq((1, "one"), (2, "two")).toDF("dim_id", "dim_name")
    val out = Marts.joinAgg(fact, Seq((dim, "dim_id")), lit(true),
      Seq("grp", "dim_name"), Seq(sum("amt").as("total")))
    assert(canon(out) == Seq(
      Seq("k1", "one", "15.0"), Seq("k2", "two", "7.0"), Seq("k3", "null", "1.0")
    ).sortBy(_.mkString("|")))
  }

  test("joinAgg broadcasts the dim (plan check)") {
    val fact = Seq((1, 1.0)).toDF("dim_id", "amt")
    val dim = Seq((1, "x")).toDF("dim_id", "nm")
    val plan = Marts.joinAgg(fact, Seq((dim, "dim_id")), lit(true),
      Seq("nm"), Seq(sum("amt").as("t"))).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }

  test("day and month rollups") {
    val src = Seq(
      (Timestamp.valueOf("2024-01-01 10:00:00"), "a", 1.0),
      (Timestamp.valueOf("2024-01-01 23:00:00"), "a", 2.0),
      (Timestamp.valueOf("2024-02-05 00:00:00"), "a", 4.0)).toDF("ts", "k", "v")
    val day = Marts.dayRollup(src, "ts", Seq("k"), Seq(sum("v").as("total")))
    assert(canon(day) == Seq(
      Seq("2024-01-01", "a", "3.0"), Seq("2024-02-05", "a", "4.0")).sortBy(_.mkString("|")))
    val month = Marts.monthRollup(src, "ts", Seq("k"), Seq(count(lit(1)).as("n")))
    assert(canon(month) == Seq(Seq("202401", "a", "2"), Seq("202402", "a", "1")).sortBy(_.mkString("|")))
  }

  test("M6 refreshIfStale: runs only when src is fresher than dest") {
    val src = Seq(Timestamp.valueOf("2024-01-10 00:00:00")).toDF("ts")
    val oldDest = Seq(Timestamp.valueOf("2024-01-05 00:00:00")).toDF("ts")
    val newDest = Seq(Timestamp.valueOf("2024-01-15 00:00:00")).toDF("ts")
    assert(Marts.refreshIfStale(src, "ts", oldDest, "ts")("ran").contains("ran"))
    assert(Marts.refreshIfStale(src, "ts", newDest, "ts")("ran").isEmpty)
    // empty dest always builds; empty src never does
    assert(Marts.refreshIfStale(src, "ts", newDest.limit(0), "ts")("ran").contains("ran"))
    assert(Marts.refreshIfStale(src.limit(0), "ts", oldDest, "ts")("ran").isEmpty)
  }
}
