package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance driven by a change-data feed —
  * the missing half of [[graft.streaming.StreamOps.maintainRollup]]:
  * the additive fold keeps a SUM/COUNT rollup current under
  * APPEND-ONLY batches, but a CDC-fed fact table also sees updates
  * (late corrections replacing earlier values) and deletes, which an
  * append fold silently double-counts. Consuming
  * [[ManifestStore.changes]] with `updatePreimage = true` instead
  * makes the maintenance exact under all three change kinds:
  * pre-images and deletes SUBTRACT their contribution, post-images
  * and inserts ADD theirs — a correction that moves a row across
  * group boundaries (e.g. a restated event day) decrements the old
  * group and increments the new one in the same delta.
  *
  * Scale shape: the delta aggregate is O(changed rows) — at a CDC
  * cadence that is the batch, not the table — and the merge into the
  * previous rollup is a group-key full-outer join against a
  * dimension-sized frame. Measures accumulate in DECIMAL so the
  * incremental path is EXACTLY equal to a from-scratch recompute
  * (double addition would drift with fold order), which is what the
  * spec and the streaming oracle assert.
  */
object CdfRollup {

  /** Fold one CDF batch into the previous rollup state. Output schema:
    * groupCols…, `sum_value` (decimal 18,2), `n` (long). Groups whose
    * row count reaches zero disappear. The CDF must carry
    * update_preimage/update_postimage rows (not collapsed `update`
    * rows) — a collapsed update cannot be subtracted and fails loudly. */
  def applyCdf(prev: Option[DataFrame], cdf: DataFrame,
               groupCols: Seq[String], valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "applyCdf needs at least one group column")
    val sign = when(col("_change").isin("insert", "update_postimage"), lit(1))
      .when(col("_change").isin("delete", "update_preimage"), lit(-1))
      .otherwise(raise_error(concat(
        lit("applyCdf needs pre/post update images, got _change="), col("_change"))))
    val delta = cdf
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col(valueCol).cast("decimal(18,2)") * sign).as("sum_value"),
        sum(sign.cast("long")).as("n"))
    prev match {
      case None => delta.filter(col("n") =!= 0)
      case Some(p) =>
        val d = delta.toDF(groupCols.map("__d_" + _) ++ Seq("__d_sum", "__d_n"): _*)
        val cond = groupCols.map(k => p(k) <=> d("__d_" + k)).reduce(_ && _)
        p.join(d, cond, "full_outer")
          .select(groupCols.map(k =>
            coalesce(p(k), d("__d_" + k)).as(k)) ++ Seq(
            (coalesce(p("sum_value"), lit(0).cast("decimal(18,2)")) +
              coalesce(d("__d_sum"), lit(0).cast("decimal(18,2)")))
              .cast("decimal(18,2)").as("sum_value"),
            (coalesce(p("n"), lit(0L)) + coalesce(d("__d_n"), lit(0L))).as("n")): _*)
          .filter(col("n") =!= 0)
    }
  }
}
