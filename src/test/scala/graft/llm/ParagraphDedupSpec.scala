package graft.llm

import graft.SparkSpec

class ParagraphDedupSpec extends SparkSpec {
  import spark.implicits._

  private val boiler = "subscribe to our newsletter for updates and announcements"

  test("first occurrence survives, later copies drop, docs reassemble in order") {
    val docs = Seq(
      (0L, s"alpha unique opening paragraph zero\n$boiler\nzeta unique closing paragraph zero"),
      (1L, s"$boiler\nbeta unique middle paragraph one"),
      (2L, s"gamma unique paragraph two\n$boiler")
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs, "doc_id", "text", minChars = 30)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap

    assert(out(0L)._1 ==
      s"alpha unique opening paragraph zero\n$boiler\nzeta unique closing paragraph zero")
    assert(out(0L)._3 == 0L)
    // doc 1 loses the banner (doc 0 pos 1 came first) but keeps its own par
    assert(out(1L)._1 == "beta unique middle paragraph one")
    assert(out(1L) == (("beta unique middle paragraph one", 1L, 1L)))
    assert(out(2L)._1 == "gamma unique paragraph two")
  }

  test("short paragraphs are structure, never deduped") {
    val docs = Seq(
      (0L, "---\nfirst long unique paragraph body with many words\n---"),
      (1L, "---\nsecond long unique paragraph body with other words\n---")
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs, "doc_id", "text", minChars = 30)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // every '---' survives in place on both docs
    assert(out(0L).split("\n").count(_ == "---") == 2)
    assert(out(1L).split("\n").count(_ == "---") == 2)
  }

  test("tie within one document: earliest position wins") {
    val docs = Seq(
      (5L, "repeated paragraph appearing twice in one document\nmiddle unique filler paragraph here\nrepeated paragraph appearing twice in one document")
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs, "doc_id", "text", minChars = 30).collect()(0)
    assert(out.getString(1) ==
      "repeated paragraph appearing twice in one document\nmiddle unique filler paragraph here")
    assert(out.getLong(2) == 2L && out.getLong(3) == 1L)
  }

  test("a doc made entirely of already-seen paragraphs comes back empty") {
    val docs = Seq(
      (0L, "the one and only paragraph in the whole corpus"),
      (9L, "the one and only paragraph in the whole corpus")
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs, "doc_id", "text", minChars = 30)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(9L) == (("", 0L, 1L)))
    assert(out(0L)._2 == 1L)
  }
}
