package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — an operator Spark lacks natively.
  *
  * For each left row, attach the LATEST right row whose time is <= the
  * left row's time, per key (left-join semantics: no prior right row →
  * NULLs). The naive formulation is a non-equi join (nested-loop at any
  * scale); the scale-correct composition is union + last-ignoreNulls
  * running window: ONE shuffle on the key, each partition scanned once in
  * time order, no range explosion. Ties (right.time == left.time) take
  * the right row — inclusive as-of, matching SQL `ASOF JOIN … ON l.t >= r.t`.
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightValueCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    val lv = struct(left.columns.map(col).toSeq: _*)
    val rv = struct(rightValueCols.map(col).toSeq: _*)
    val lvType = left.select(lv.as("x")).schema("x").dataType
    val rvType = right.select(rv.as("x")).schema("x").dataType

    val l2 = left.select(
      keys.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__src"),
        lv.as("__lv"), lit(null).cast(rvType).as("__rv")): _*)
    val r2 = right.select(
      keys.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__src"),
        lit(null).cast(lvType).as("__lv"), rv.as("__rv")): _*)

    // right rows sort BEFORE left rows at equal time (__src 0 < 1) so an
    // exactly-simultaneous right row is visible to the left row
    val w = Window.partitionBy(keys.map(col).toSeq: _*)
      .orderBy(col("__t").asc, col("__src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r2.unionByName(l2)
      .withColumn("__carried", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .select(col("__lv.*") +: rightValueCols.map(c => col(s"__carried.$c").as(prefix + c)): _*)
  }
}
