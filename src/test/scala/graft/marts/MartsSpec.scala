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

  test("mergeRollup: folding partials equals the full recompute") {
    val src = Seq(
      ("2024-01-01", "a", 1L, 10L), ("2024-01-01", "a", 1L, 20L),
      ("2024-01-02", "a", 1L, 5L), ("2024-01-02", "b", 1L, 7L),
      ("2024-01-03", "b", 1L, 9L)
    ).toDF("day", "k", "one", "v")
    def roll(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("day", "k").agg(sum(col("one")).as("n"), sum(col("v")).as("total"),
        max(col("v")).as("mx"))
    val full = roll(src)
    // split so one (day, k) group straddles the boundary, one is disjoint
    val merged = Marts.mergeRollup(
      roll(src.filter(col("v") < 9L)), roll(src.filter(col("v") >= 9L)),
      Seq("day", "k"), Seq("n", "total"), Map("mx" -> (c => max(c))))
    assertSameRows(merged.select("day", "k", "n", "total", "mx"),
      full.select("day", "k", "n", "total", "mx"))
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
