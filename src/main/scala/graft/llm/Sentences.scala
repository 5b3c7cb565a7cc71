package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sentence segmentation and C4's three-sentence-span deduplication
  * (Raffel et al., JMLR 2020 §2.2 — the reference pipeline deduplicated
  * at the granularity of three-sentence spans, not whole documents).
  *
  * Boundary contract, deliberately dialect-portable: a sentence ends at
  * terminal punctuation ([.!?]) followed by whitespace. No abbreviation
  * table — RE2 (the oracle engine's regex) has no lookbehind, so the
  * split is expressed as replace-then-split on a control character,
  * identical in both engines. Known limitation, stated rather than
  * hidden: "e.g. foo" splits; a production deployment slots an
  * abbreviation-protect `regexp_replace` in front without touching the
  * span algebra.
  */
object Sentences {

  private val Sep = "\u0001"

  /** Trimmed, non-empty sentences of `text`, in document order. */
  def splitSentences(text: Column): Column =
    filter(
      transform(split(regexp_replace(text, "([.!?])\\s+", "$1" + Sep), Sep),
        s => trim(s)),
      s => length(s) > 0)

  /** One row per (doc, sentence position). */
  def sentences(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        posexplode(splitSentences(col(textCol))).as(Seq("sent_idx", "sentence")))
      .withColumn("sent_idx", col("sent_idx").cast("long"))

  /** C4 span dedup: hash every 3-sentence sliding window, give each
    * span to its minimum doc id corpus-wide, and count per doc how many
    * of its spans are owned elsewhere. Shuffle is on the span HASH (the
    * window text never leaves the map side), one explode + one
    * min-aggregate + one count — the same scale shape as exact dedup.
    * Docs with fewer than `span` sentences contribute no windows. */
  def spanDedup(docs: DataFrame, idCol: String, textCol: String,
                span: Int = 3): DataFrame = {
    val sents = splitSentences(col(textCol))
    val spans = when(size(sents) >= span,
      transform(sequence(lit(0), size(sents) - span),
        i => md5(concat_ws("\u0002", slice(sents, i + 1, lit(span))))))
      .otherwise(array().cast("array<string>"))
    val exploded = docs.select(col(idCol), explode(spans).as("span_hash"))
    val owners = exploded.groupBy("span_hash")
      .agg(min(col(idCol)).as("__owner"))
    val perDoc = exploded.join(owners, Seq("span_hash"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("__owner") < col(idCol), 1L).otherwise(0L)).as("dup_spans"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_spans"), lit(0L)).as("dup_spans"),
        (coalesce(col("dup_spans"), lit(0L)) > 0).as("has_dup"))
  }
}
