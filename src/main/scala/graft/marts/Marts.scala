package graft.marts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join/aggregate marts (SURVEY.md §2.3 J1, §2.4 A1/A2/A5, §2.6 M6).
  *
  * The reference's only join+aggregate mart is revenue_by_employee
  * (dags/sql/ods_to_llb/extract/staging_revenue_by_employee.sql:1-26):
  * fact LEFT JOIN small dim → flag filters → 10-key GROUP BY → two
  * coalesce-SUMs. The Spark shape broadcasts the dim (no shuffle on the
  * fact for the join; the only wide stage is the final partial+final hash
  * aggregation on the group keys — exactly one shuffle at any scale).
  */
object Marts {

  /** J1+A1+P5 — fact LEFT JOIN broadcast(dim), filter, groupBy, aggregate.
    * `dims` are (dimFrame, joinKey) pairs; each dim is explicitly
    * broadcast (the reference's dims are tiny lookup tables). */
  def joinAgg(fact: DataFrame,
              dims: Seq[(DataFrame, String)],
              flags: Column,
              groupKeys: Seq[String],
              aggs: Seq[Column]): DataFrame = {
    val joined = dims.foldLeft(fact) { case (f, (dim, key)) =>
      f.join(broadcast(dim), Seq(key), "left")
    }
    joined.filter(flags)
      .groupBy(groupKeys.map(col).toSeq: _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** A2/A4 — freshness probe: max of a column as a driver scalar (one-row
    * aggregate; scale-independent). NULL/empty → None. */
  def maxOf(df: DataFrame, c: String): Option[Any] =
    Option(df.agg(max(col(c))).head().get(0))

  /** A5 — day-grain rollup: groupBy(date(ts), extra keys).aggs. */
  def dayRollup(src: DataFrame, tsCol: String, keys: Seq[String], aggs: Seq[Column]): DataFrame =
    src.groupBy((to_date(col(tsCol)).as("day") +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** A5 — month-grain rollup (`yyyymm` int, the reference's
    * `updated_day / 100` grain, update_datamart.sql:24-26). */
  def monthRollup(src: DataFrame, tsCol: String, keys: Seq[String], aggs: Seq[Column]): DataFrame =
    src.groupBy((date_format(col(tsCol), "yyyyMM").cast("int").as("month") +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Incremental view maintenance for additive rollups: fold a new
    * batch's partial aggregate into the existing rollup WITHOUT
    * recomputing history — at a 5-minute cadence over years of
    * accumulated days, re-aggregating the full fact table per cycle is
    * the scale bottleneck; merging partials costs O(batch + touched
    * keys). Works for any commutative-monoid aggregates (sum, count;
    * max/min via `mergeWith`): the result equals the same rollup over
    * the union of the inputs. Keep sums in DECIMAL until after the last
    * merge — merging double-cast partials would reintroduce float
    * association error. One partial-aggregated shuffle on the keys. */
  def mergeRollup(existing: DataFrame, delta: DataFrame, keys: Seq[String],
                  addCols: Seq[String],
                  mergeWith: Map[String, Column => Column] = Map.empty): DataFrame = {
    require(addCols.nonEmpty || mergeWith.nonEmpty,
      "mergeRollup needs at least one measure column")
    val valCols = addCols ++ mergeWith.keys
    val e = existing.select((keys ++ valCols).map(col): _*)
    val d = delta.select((keys ++ valCols).map(col): _*)
    val aggs = addCols.map(c => sum(col(c)).as(c)) ++
      mergeWith.map { case (c, f) => f(col(c)).as(c) }
    e.unionByName(d).groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** M6 — conditional datamart refresh: run the rollup only when the source
    * has newer data than the destination
    * (update_datamart.sql:4-29: IF max(src.status_date) >
    * max(dest.delivery_date) THEN call day+month procs). Compares two
    * one-row aggregates on the driver — the reference does the identical
    * scalar compare inside a PL/pgSQL DO block. Returns None when fresh.
    */
  def refreshIfStale[T](src: DataFrame, srcTs: String,
                        dest: DataFrame, destTs: String)(rollup: => T): Option[T] = {
    // typed compare: numbers numerically, then any mutually-Comparable pair
    // natively (java.sql.Timestamp/Date, LocalDate, BigDecimal — a
    // java.util.Date's toString is NOT ISO-ordered and would mis-order
    // silently under a string compare), with toString ordering only as the
    // final fallback for exotic types (valid for ISO-formatted strings)
    def newer(a: Any, b: Any): Boolean = (a, b) match {
      case (x: Number, y: Number) => x.doubleValue() > y.doubleValue()
      case (x: Comparable[_], y) if x.getClass.isInstance(y) =>
        x.asInstanceOf[Comparable[Any]].compareTo(y) > 0
      case (x, y)                 => String.valueOf(x) > String.valueOf(y)
    }
    (maxOf(src, srcTs), maxOf(dest, destTs)) match {
      case (None, _)          => None              // no source data → nothing to do
      case (Some(_), None)    => Some(rollup)      // empty dest → always build
      case (Some(s), Some(d)) => if (newer(s, d)) Some(rollup) else None
    }
  }
}
