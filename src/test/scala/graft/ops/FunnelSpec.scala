package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new java.sql.Timestamp(m * 60000L)

  test("greedy earliest completion, order enforcement, partial depths") {
    val events = Seq(
      // user 1: full funnel in order, with a decoy later view
      (1L, ts(10), "view"), (1L, ts(20), "click"), (1L, ts(30), "purchase"), (1L, ts(40), "view"),
      // user 2: purchase BEFORE the view→click chain → depth 2 only
      (2L, ts(5), "purchase"), (2L, ts(10), "view"), (2L, ts(20), "click"),
      // user 3: view only
      (3L, ts(7), "view"),
      // user 4: never enters the funnel (other event types)
      (4L, ts(1), "error"),
      // user 5: click at the SAME instant as view — strict > rejects it
      (5L, ts(10), "view"), (5L, ts(10), "click")
    ).toDF("user_id", "ts", "event_type")
    def collectTimes(includeAllUsers: Boolean) =
      Funnel.funnelTimes(events, "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"), includeAllUsers)
        .collect().map(r => r.getLong(0) ->
          ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4)))).toMap
    def us(m: Int) = Some(m * 60000000L)
    val got = collectTimes(includeAllUsers = false)
    // default spine = funnel ENTRANTS only: user 4 never fired step 1
    // and gets no row — the O(step-1 users) contract
    assert(got.keySet == Set(1L, 2L, 3L, 5L))
    assert(got(1L) == ((us(10), us(20), us(30), 3L)))
    assert(got(2L) == ((us(10), us(20), None, 2L)))  // early purchase ignored
    assert(got(3L) == ((us(7), None, None, 1L)))
    assert(got(5L) == ((us(10), None, None, 1L)))    // strict ordering
    // opt-in all-users spine restores the 0-depth row, changing nothing else
    val all = collectTimes(includeAllUsers = true)
    assert(all(4L) == ((None, None, None, 0L)))
    assert(all - 4L == got)
  }

  test("the join spine is the step-1 aggregate, not the all-users distinct") {
    val events = (1L to 100L).map(u => (u, ts(u.toInt), "noise")).toDF("user_id", "ts", "event_type")
      .union(Seq((7L, ts(1), "view"), (7L, ts(2), "click")).toDF("user_id", "ts", "event_type"))
    val out = Funnel.funnelTimes(events, "user_id", "ts", "event_type", Seq("view", "click"))
    assert(out.count() == 1L, "only the single funnel entrant rides the spine")
    // and no full-history window anywhere in the plan
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("window"), s"no window expected:\n$plan")
  }
}
