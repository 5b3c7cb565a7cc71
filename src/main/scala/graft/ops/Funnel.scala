package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event stream: for a step sequence
  * (view → click → purchase), per user the GREEDY EARLIEST completion
  * times — t1 = first step-1 event, t_{i+1} = first step-(i+1) event
  * strictly after t_i — and the deepest step reached. The greedy-
  * earliest rule makes the answer a deterministic function of the event
  * multiset (no "which occurrence" ambiguity), which is what lets a
  * second engine replay it join-for-join.
  *
  * Scale shape: one filtered aggregate plus one co-partitioned join per
  * step, ALL keyed on the user column — a single logical shuffle key
  * end to end, so AQE plans one exchange and reuses it; no window over
  * the full event history, no per-user event collection. Step count is
  * a query constant, never data-dependent.
  *
  * The join spine is the STEP-1 aggregate, not the all-users distinct:
  * a user who never fired step 1 can never complete any later step, so
  * every subsequent join is O(step-1 users) — on a 100 TB event table
  * where most users never enter the funnel, that shrinks every join in
  * the chain. `includeAllUsers = true` restores one row per event-table
  * user (steps_completed = 0 for non-entrants) via a single extra
  * left join at the end, for callers that chart the 0-depth bar.
  */
object Funnel {

  def funnelTimes(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String],
                  includeAllUsers: Boolean = false): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // step 1 IS the spine: its aggregate carries exactly the users who
    // entered the funnel, and t1 is non-null on every spine row
    var acc = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    steps.zipWithIndex.drop(1).foreach { case (step, i) =>
      val t = s"t${i + 1}"
      val pt = s"t$i"
      val stepMin = events.filter(col(typeCol) === step)
        .join(acc.select(col(userCol), col(pt)).filter(col(pt).isNotNull),
          Seq(userCol))
        .filter(col(tsCol) > col(pt))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(t))
      acc = acc.join(stepMin, Seq(userCol), "left")
    }
    val spine =
      if (includeAllUsers)
        events.select(col(userCol)).distinct().join(acc, Seq(userCol), "left")
      else acc
    // ascending fold → the deepest non-null step wins the when-chain
    val reached: Column = steps.indices.foldLeft(lit(0)) { (els, i) =>
      when(col(s"t${i + 1}").isNotNull, lit(i + 1)).otherwise(els)
    }
    spine.select(
      col(userCol) +:
        steps.indices.map(i => unix_micros(col(s"t${i + 1}")).as(s"t${i + 1}_us")) :+
        reached.cast("long").as("steps_completed"): _*)
  }
}
