package graft.llm

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-source corpus data card — the release-notes table every curated
  * corpus ships: volume, token mass, mean quality, PII exposure, and
  * exact-duplicate rate, per source slice.
  *
  * One pass composes signals that are each oracle-checked standalone
  * (`text_quality`, `pii_detect`, `dedup_exact`): the only shuffle is
  * the exact-dedup fingerprint window (identical cost to running exact
  * dedup itself), then a per-source hash aggregate. At 100 TB the card
  * costs one dedup pass — not five separate corpus scans.
  */
object Datacard {

  def sourceDatacard(docs: DataFrame, idCol: String, textCol: String,
                     groupCol: String): DataFrame = {
    val w = Window.partitionBy(TextAnalysis.fingerprintMd5(col(textCol)))
      .orderBy(col(idCol))
    docs
      .withColumn("__dup", (row_number().over(w) > 1).cast("int"))
      .withColumn("__q", TextAnalysis.qualityScore(col(textCol)))
      .withColumn("__pii", Pii.hasPii(col(textCol)).cast("int"))
      .withColumn("__tok", TextAnalysis.tokenCount(col(textCol)).cast("long"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__tok")).as("n_tokens"),
        round(avg(col("__q")), 6).as("mean_quality"),
        round(avg(col("__pii")), 6).as("pii_frac"),
        round(avg(col("__dup")), 6).as("dup_frac"))
  }
}
