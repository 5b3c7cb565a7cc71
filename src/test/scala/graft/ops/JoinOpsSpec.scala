package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of and banded range joins — semantics + plan shape (no nested loop). */
class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin: latest right at-or-before left time, per key; left semantics") {
    val trades = Seq(("A", 10L, "t1"), ("A", 25L, "t2"), ("B", 5L, "t3"))
      .toDF("sym", "t", "trade")
    val quotes = Seq(("A", 8L, 100.0), ("A", 10L, 101.0), ("A", 20L, 102.0),
                     ("C", 1L, 999.0)).toDF("sym", "t", "px")
    val out = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "t", "t", Seq("px"))
      .select("trade", "asof_px")
    assert(canon(out) == Seq(
      Seq("t1", "101.0"),  // tie at t=10 → inclusive
      Seq("t2", "102.0"),  // latest before 25
      Seq("t3", "null")    // no quote for B → left join null
    ).sortBy(_.mkString("|")))
  }

  test("asofJoin plans one key shuffle, no nested-loop join") {
    val trades = Seq(("A", 10L, "x")).toDF("sym", "t", "v")
    val quotes = Seq(("A", 8L, 1.0)).toDF("sym", "t", "px")
    val df = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "t", "t", Seq("px"))
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    assert(plan.contains("Window"))
  }

  test("bandedPointInterval: correct matches incl. boundary + multi-bucket spans") {
    val points = Seq((1L, 0.0), (2L, 39.99), (3L, 40.0), (4L, 120.0), (5L, 500.0))
      .toDF("id", "p")
    val ivals = Seq(("low", 0.0, 40.0), ("wide", 35.0, 130.0), ("empty", 7.0, 7.0))
      .toDF("name", "lo", "hi")
    val out = RangeJoin.bandedPointInterval(points, "p", ivals, "lo", "hi", bandWidth = 25.0)
      .select("id", "name")
    assert(canon(out) == Seq(
      Seq("1", "low"), Seq("2", "low"),     // 40.0 excluded from [0,40)
      Seq("2", "wide"), Seq("3", "wide"), Seq("4", "wide")
    ).sortBy(_.mkString("|")))
  }

  test("bandedPointInterval plans an equi-join on the band, not a nested loop") {
    val points = Seq((1L, 10.0)).toDF("id", "p")
    val ivals = Seq(("a", 0.0, 20.0)).toDF("name", "lo", "hi")
    val df = RangeJoin.bandedPointInterval(points, "p", ivals, "lo", "hi", 25.0)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    assert(plan.contains("Join"))
  }
}
