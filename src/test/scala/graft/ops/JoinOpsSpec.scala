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

  test("scd2Lookup: each fact reads its own-time version; pre-history facts read NULL") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    // two-version history for k=1 (gold → platinum at 2024-02-01),
    // single version for k=2
    val hist = graft.merge.MergeEngine.scd2Merge(
      Some(graft.merge.MergeEngine.scd2Merge(None,
        Seq((1L, ts("2024-01-01"), "gold"), (2L, ts("2024-01-01"), "silver"))
          .toDF("k", "seen", "tier"),
        Seq("k"), "seen")),
      Seq((1L, ts("2024-02-01"), "platinum")).toDF("k", "seen", "tier"),
      Seq("k"), "seen")
    val facts = Seq(
      (10L, 1L, ts("2023-12-25")), // before any version → NULL
      (11L, 1L, ts("2024-01-15")), // first version window
      (12L, 1L, ts("2024-02-01")), // exactly at the flip → new version (inclusive)
      (13L, 1L, ts("2024-03-01")), // after the flip
      (14L, 2L, ts("2024-06-01"))).toDF("fid", "k", "ts")
    val out = AsofJoin.scd2Lookup(facts, "ts", hist, Seq("k"), Seq("tier"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(out == Map(10L -> None, 11L -> Some("gold"), 12L -> Some("platinum"),
      13L -> Some("platinum"), 14L -> Some("silver")))
    // zero join operators in the LOOKUP itself (a materialized history
    // frame isolates it from scd2Merge's own history-merge plan)
    val histPlain = Seq(
      (1L, "gold", ts("2024-01-01"), Some(ts("2024-02-01")), false),
      (1L, "platinum", ts("2024-02-01"), None, true),
      (2L, "silver", ts("2024-01-01"), None, true))
      .toDF("k", "tier", "valid_from", "valid_to", "is_current")
    val lk = AsofJoin.scd2Lookup(facts, "ts", histPlain, Seq("k"), Seq("tier"))
    assert(canon(lk) == canon(AsofJoin.scd2Lookup(facts, "ts", hist, Seq("k"), Seq("tier"))))
    val plan = lk.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"scd2Lookup must not plan a join:\n$plan")
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
