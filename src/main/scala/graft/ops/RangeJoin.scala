package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join — point-in-interval without a nested-loop plan.
  *
  * `left.point BETWEEN right.lo AND right.hi` is a non-equi condition, so
  * Catalyst can only plan it as BroadcastNestedLoop/cartesian — quadratic
  * at scale. Bucketizing both sides by a fixed band width turns it into
  * an equi-join on the bucket id plus a cheap residual filter: points map
  * to one bucket, intervals explode into ceil(len/width) buckets, and the
  * join shuffles on the bucket key like any other equi-join. Pick
  * `bandWidth` near the typical interval length (≈1 bucket per interval).
  */
object RangeJoin {

  /** Inner join of left points to right half-open intervals `[lo, hi)`. */
  def bandedPointInterval(left: DataFrame, pointCol: String,
                          right: DataFrame, loCol: String, hiCol: String,
                          bandWidth: Double): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    val lb = left.withColumn("__band", floor(col(pointCol) / bandWidth).cast("long"))
    val rb = right
      .filter(col(loCol) < col(hiCol)) // empty intervals match nothing (and would explode a descending sequence)
      .withColumn("__band", explode(sequence(
        floor(col(loCol) / bandWidth).cast("long"),
        // hi is exclusive: the last covered bucket is the one containing
        // the largest value strictly below hi
        floor((col(hiCol) - lit(bandWidth * 1e-12)) / bandWidth).cast("long"))))
    lb.join(rb, Seq("__band"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__band")
  }
}
