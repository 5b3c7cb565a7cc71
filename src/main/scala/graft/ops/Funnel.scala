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
  */
object Funnel {

  def funnelTimes(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var acc = events.select(col(userCol)).distinct()
    var prev: Option[String] = None
    steps.zipWithIndex.foreach { case (step, i) =>
      val t = s"t${i + 1}"
      val stepMin = prev match {
        case None =>
          events.filter(col(typeCol) === step)
            .groupBy(col(userCol)).agg(min(col(tsCol)).as(t))
        case Some(pt) =>
          events.filter(col(typeCol) === step)
            .join(acc.select(col(userCol), col(pt)).filter(col(pt).isNotNull),
              Seq(userCol))
            .filter(col(tsCol) > col(pt))
            .groupBy(col(userCol)).agg(min(col(tsCol)).as(t))
      }
      acc = acc.join(stepMin, Seq(userCol), "left")
      prev = Some(t)
    }
    // ascending fold → the deepest non-null step wins the when-chain
    val reached: Column = steps.indices.foldLeft(lit(0)) { (els, i) =>
      when(col(s"t${i + 1}").isNotNull, lit(i + 1)).otherwise(els)
    }
    acc.select(
      col(userCol) +:
        steps.indices.map(i => unix_micros(col(s"t${i + 1}")).as(s"t${i + 1}_us")) :+
        reached.cast("long").as("steps_completed"): _*)
  }
}
