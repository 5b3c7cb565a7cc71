package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SentencesSpec extends SparkSpec {
  import spark.implicits._

  test("splitSentences: terminal punct + whitespace, trims, drops empties") {
    val got = Seq("one ends here. two asks?  three shouts!   four trails")
      .toDF("t").select(Sentences.splitSentences(col("t")).as("s"))
      .head().getSeq[String](0)
    assert(got == Seq("one ends here.", "two asks?", "three shouts!", "four trails"))
    // punct with NO following whitespace does not split (decimals, urls)
    val keep = Seq("pi is 3.14 and that is all.").toDF("t")
      .select(Sentences.splitSentences(col("t")).as("s")).head().getSeq[String](0)
    assert(keep == Seq("pi is 3.14 and that is all."))
  }

  test("spanDedup: shared triplet owned by min id, unique windows never flag") {
    val shared = "alpha comes first. beta follows after! gamma closes out."
    val docs = Seq(
      (10L, s"unique intro ten. $shared"),
      (20L, s"unique intro twenty. $shared"),      // windows 2..4 duplicate 10's
      (30L, "all alone here. nothing shared at all? truly unique content."),
      (40L, "too short. only two sentences.")      // below span → 0 windows
    ).toDF("doc_id", "text")
    val got = Sentences.spanDedup(docs, "doc_id", "text", span = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(10L) == ((2L, 0L, false)))  // owner of the shared window
    assert(got(20L) == ((2L, 1L, true)))   // its (s2,s3,s4) window is owned by 10
    assert(got(30L) == ((1L, 0L, false)))
    assert(got(40L) == ((0L, 0L, false)))  // zero-window doc still reported
  }
}
