package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-source corpus data card — the release-notes table every curated
  * corpus ships: volume, token mass, mean quality, PII exposure,
  * exact-duplicate rate, NEAR-duplicate candidate rate, and
  * token-length quantiles, per source slice.
  *
  * One pass composes signals that are each oracle-checked standalone
  * (`text_quality`, `pii_detect`, `dedup_exact`, `dedup_neardup`,
  * `score_quantile_sketch`): the only row-level shuffle is ONE window
  * partitioned by the MinHash band signature — exact duplicates share
  * the signature by construction (it is a function of the normalized
  * text), so the same partition answers both "is this text seen
  * verbatim" (lag over (fingerprint, id) order) and "does this text
  * share a band bucket" (partition count), and the token-length
  * quantiles ride the per-source aggregate as a mergeable KLL sketch.
  * At 100 TB the card still costs one dedup pass — not seven corpus
  * scans, and not one more exchange than the r10 card.
  */
object Datacard {

  /** One portable (md5-derived, DuckDB-replayable) MinHash family over
    * a shingle array; 60 usable bits, same framing as
    * [[Dedup.portableWordHash]]. */
  private def portableMin(shingleArr: Column, family: Int): Column =
    array_min(transform(shingleArr, s =>
      conv(substring(md5(concat(lit(s"$family:"), s)), 1, 15), 16, 10).cast("long")))

  /** Single-band MinHash signature of `rows` hash families: two texts
    * collide with probability J^rows — rows=4 puts the knee near
    * J ≈ 0.85, the "near-verbatim" regime a release card reports.
    * Computed as `rows` array transforms over one shingle array; at
    * this small fixed family count the inline re-evaluation of the
    * shingling expression is cheaper than the explode + re-join shape
    * `Dedup.minhashSignature` uses for 64 families. */
  private[llm] def bandSignature(textCol: Column, rows: Int = 4): Column = {
    val sh = Dedup.shingles(textCol, 3)
    concat_ws("|", (0 until rows).map(i => portableMin(sh, i).cast("string")): _*)
  }

  def sourceDatacard(docs: DataFrame, idCol: String, textCol: String,
                     groupCol: String): DataFrame = {
    val sigPart = Window.partitionBy(col("__sig"))
    val dupOrder = Window.partitionBy(col("__sig")).orderBy(col("__fp"), col(idCol))
    val qs = graft.functions.SketchOps
      .quantileSketch(col("__tok").cast("double"), Seq(0.5, 0.9))
    docs
      .withColumn("__fp", TextAnalysis.fingerprintMd5(col(textCol)))
      .withColumn("__sig", bandSignature(col(textCol)))
      // both flags ride ONE hash-partitioning on the band signature:
      // exact-dup groups are contiguous under (fingerprint, id) order
      // inside their signature partition, so "same fingerprint as the
      // previous row" marks exactly the non-first rows of each exact
      // group — the same rows the r10 fingerprint window marked
      .withColumn("__near", (count(lit(1)).over(sigPart) > 1).cast("int"))
      .withColumn("__dup", (col("__fp") <=> lag(col("__fp"), 1).over(dupOrder)).cast("int"))
      .withColumn("__q", TextAnalysis.qualityScore(col(textCol)))
      .withColumn("__pii", Pii.hasPii(col(textCol)).cast("int"))
      .withColumn("__tok", TextAnalysis.tokenCount(col(textCol)).cast("long"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__tok")).as("n_tokens"),
        round(avg(col("__q")), 6).as("mean_quality"),
        round(avg(col("__pii")), 6).as("pii_frac"),
        round(avg(col("__dup")), 6).as("dup_frac"),
        round(avg(col("__near")), 6).as("near_frac"),
        qs.as("__qs"))
      .select(col(groupCol), col("n_docs"), col("n_tokens"),
        col("mean_quality"), col("pii_frac"), col("dup_frac"), col("near_frac"),
        round(element_at(col("__qs"), 1), 6).as("tok_p50"),
        round(element_at(col("__qs"), 2), 6).as("tok_p90"))
  }
}
