package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DatacardSpec extends SparkSpec {
  import spark.implicits._

  test("per-source volume, tokens, pii and dup fractions compose correctly") {
    val docs = Seq(
      (1L, "a", "the quick brown fox jumps over the lazy dog today"),
      (2L, "a", "the quick brown fox jumps over the lazy dog today"), // exact dup of 1
      (3L, "a", "contact me at user@example.com for more details soon"),
      (4L, "b", "an entirely distinct document with no issues at all")
    ).toDF("doc_id", "source", "text")
    val got = Datacard.sourceDatacard(docs, "doc_id", "text", "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got("a")._1 == 3L && got("a")._2 == 28L)       // 10 + 10 + 8 tokens
    assert(got("a")._3 == 0.333333)                       // one PII doc of three
    assert(got("a")._4 == 0.333333)                       // doc 2 is the dup, not doc 1
    assert(got("b") == ((1L, 9L, 0.0, 0.0)))
  }

  test("near-dup rate counts band-bucket members; exact dups always collide") {
    val base = "the long shared page body used to exercise near duplicate " +
      "banding stays identical across documents in every slice"
    val docs = Seq(
      (1L, "a", base + " r0"),
      (2L, "a", base + " r0"),                            // exact dup of 1
      (3L, "a", base + " r1"),                            // near, not exact
      (4L, "a", "an entirely unrelated document about something else wholly")
    ).toDF("doc_id", "source", "text")
    val r = Datacard.sourceDatacard(docs, "doc_id", "text", "source").head()
    assert(r.getDouble(r.schema.fieldIndex("dup_frac")) == 0.25,
      "only doc 2 repeats a fingerprint")
    val near = r.getDouble(r.schema.fieldIndex("near_frac"))
    // docs 1 and 2 share a signature BY CONSTRUCTION (signature is a
    // function of the normalized text); doc 3 joins the bucket iff none
    // of the 4 minhash families lands in its changed trailing shingles —
    // deterministic for this fixed corpus, and strictly more docs than
    // the exact-dup count either way
    assert(near >= 0.5 && near > r.getDouble(r.schema.fieldIndex("dup_frac")), s"near=$near")
  }

  test("token-length quantiles are the exact order statistics per source") {
    val docs = Seq(
      (1L, "a", "one two three"),                         // 3 tokens
      (2L, "a", "one two three four five"),               // 5
      (3L, "a", "one two three four five six seven"),     // 7
      (4L, "a", "one two three four five six seven eight nine") // 9
    ).toDF("doc_id", "source", "text")
    val r = Datacard.sourceDatacard(docs, "doc_id", "text", "source").head()
    // sorted [3,5,7,9]: p50 -> floor(0.5*3)=idx1 -> 5; p90 -> floor(0.9*3)=idx2 -> 7
    assert(r.getDouble(r.schema.fieldIndex("tok_p50")) == 5.0)
    assert(r.getDouble(r.schema.fieldIndex("tok_p90")) == 7.0)
  }
}
