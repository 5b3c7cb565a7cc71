package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch marketing attribution — the complement of the single-
  * winner shapes already in the engine ([[AsofJoin]] is last-touch,
  * [[Funnel]] is ordered completion): each conversion's credit is split
  * LINEARLY across every touchpoint that preceded it within the
  * lookback window, and conversions with no preceding touch fall into
  * an explicit `(direct)` channel so the credit ledger always sums to
  * the conversion count (up to the documented floor).
  *
  * Engine-portable arithmetic: fractional credits are 1/n of a
  * conversion — summing doubles across rows would make the totals
  * partitioning- and engine-dependent, so credit travels as INTEGER
  * parts-per-million (`floor(1e6 / n)` per touch) and monetary credit
  * as integer micro-cents (`floor(cents · 1e6 / n)`), the same
  * micro-unit convention as PageRank's contribution sums. Exact
  * integer sums, divided back out only in the final projection. A
  * conversion with n touches thus credits `n·floor(1e6/n)` ppm — up to
  * n−1 ppm short of one conversion, deterministically.
  *
  * Scale shape: one equi-join on the user key (touch volume per user is
  * bounded by the lookback), one window keyed on the conversion id —
  * no non-equi join, no global sort.
  */
object Attribution {

  def linearAttribution(events: DataFrame, idCol: String, userCol: String,
                        tsCol: String, typeCol: String, valueCol: String,
                        touchTypes: Seq[String], convType: String,
                        lookback: String): DataFrame = {
    require(touchTypes.nonEmpty, "linearAttribution needs at least one touch type")
    require(!touchTypes.contains(convType),
      s"conversion type '$convType' cannot also be a touch type")
    val convs = events.filter(col(typeCol) === convType)
      .select(col(idCol).as("__cid"), col(userCol).as("__u"),
        col(tsCol).as("__cts"),
        round(col(valueCol) * 100).cast("long").as("__cents"))
    val touches = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("__u"), col(tsCol).as("__tts"),
        col(typeCol).as("channel"))
    val paired = convs.join(touches, Seq("__u"))
      .filter(col("__tts") <= col("__cts") &&
        col("__tts") >= col("__cts") - expr(s"INTERVAL $lookback"))
    val n = count(lit(1)).over(Window.partitionBy(col("__cid")))
    val credited = paired
      .withColumn("credit_ppm", floor(lit(1000000L) / n))
      .withColumn("value_microcents", floor(col("__cents") * lit(1000000L) / n))
    val direct = convs
      .join(credited.select("__cid").distinct(), Seq("__cid"), "left_anti")
      .select(lit("(direct)").as("channel"),
        lit(1000000L).as("credit_ppm"),
        (col("__cents") * 1000000L).as("value_microcents"))
    credited.select("channel", "credit_ppm", "value_microcents")
      .unionByName(direct)
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_credited"),
        sum(col("credit_ppm")).as("__ppm"),
        sum(col("value_microcents")).as("__mc"))
      .select(col("channel"), col("n_credited"),
        round(col("__ppm") / 1e6, 6).as("attributed_conversions"),
        round(col("__mc") / 1e8, 6).as("attributed_value"))
  }
}
