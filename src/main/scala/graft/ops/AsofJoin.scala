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

  /** Point-in-time SCD2 attribute lookup — the feature-leakage guard:
    * each fact row reads the dim version VALID AT ITS OWN event time
    * (facts before the key's first version get NULLs, never today's
    * value — joining `is_current` rows is the classic leak this
    * operator exists to prevent). `history` is an
    * [[graft.merge.MergeEngine.scd2Merge]] table; those histories are
    * GAPLESS per key (each `valid_to` is the next `valid_from`), so
    * validity reduces to "latest `valid_from` <= fact time" and the
    * lookup IS [[asofJoin]] on `valid_from` — one key shuffle, zero
    * join operators, no per-version range explosion. */
  def scd2Lookup(facts: DataFrame, factTime: String, history: DataFrame,
                 keys: Seq[String], attrCols: Seq[String],
                 prefix: String = "asof_"): DataFrame = {
    val needed = keys ++ attrCols :+ "valid_from"
    val missing = needed.filterNot(history.columns.contains)
    require(missing.isEmpty,
      s"history is missing ${missing.mkString(", ")} — pass an scd2Merge table")
    asofJoin(facts, history, keys, factTime, "valid_from", attrCols, prefix)
  }
}
