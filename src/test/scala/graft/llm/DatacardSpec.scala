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
}
