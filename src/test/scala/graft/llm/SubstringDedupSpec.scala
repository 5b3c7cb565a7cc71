package graft.llm

import graft.SparkSpec

class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private def spans(docs: Seq[(Long, String)], k: Int): Map[Long, (Long, Long, Double)] =
    Dedup.substringDupSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("cross-doc shared substring marks one span per doc; merge, split, and short cases") {
    val docs = Seq(
      1L -> "XXABCDYY",       // shares ABCD with doc 2 → span [3,6]
      2L -> "ZZABCDWW",
      3L -> "AABCDABCD",      // ABCD at pos 2 and 6 (intra-doc) → adjacent windows MERGE to [2,9]
      4L -> "ABCD123456ABCD", // ABCD at pos 1 and 11 → two separate spans
      5L -> "AB")             // shorter than k → zeros
    val r = spans(docs, k = 4)
    assert(r(1L) == ((1L, 4L, 0.5)))
    assert(r(2L) == ((1L, 4L, 0.5)))
    // merged island: 8 chars of 9, floor-ppm = (8e6 div 9)/1e6
    assert(r(3L) == ((1L, 8L, 0.888888)))
    assert(r(4L) == ((2L, 8L, 0.571428)))
    assert(r(5L) == ((0L, 0L, 0.0)))
  }

  test("no duplication anywhere yields all-zero rows for every doc") {
    val r = spans(Seq(1L -> "ABCDEFGH", 2L -> "IJKLMNOP"), k = 4)
    assert(r.values.forall(_ == ((0L, 0L, 0.0))))
    assert(r.size == 2)
  }

  test("a doc repeated verbatim is fully covered (dup_frac 1.0)") {
    val t = "THE SAME DOCUMENT TEXT EXACTLY REPEATED ACROSS TWO IDS"
    val r = spans(Seq(1L -> t, 2L -> t), k = 8)
    assert(r(1L) == ((1L, t.length.toLong, 1.0)))
    assert(r(2L) == ((1L, t.length.toLong, 1.0)))
  }

  test("overlapping duplicated windows union into one interval, not double-count chars") {
    // doc 1 and 2 share a 10-char run; with k=4 positions 1..7 of the run
    // are all duplicated — 7 overlapping windows, ONE span of 10 chars
    val r = spans(Seq(1L -> "0123456789", 2L -> "0123456789ZZ"), k = 4)
    assert(r(1L) == ((1L, 10L, 1.0)))
    assert(r(2L)._1 == 1L && r(2L)._2 == 10L)
  }

  test("empty and null-ish text is safe") {
    val r = spans(Seq(1L -> "", 2L -> "XY"), k = 4)
    assert(r(1L) == ((0L, 0L, 0.0)) && r(2L) == ((0L, 0L, 0.0)))
  }

  private def removed(docs: Seq[(Long, String)], k: Int): Map[Long, (String, Long)] =
    Dedup.removeDupSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

  test("removal cuts exactly the marked spans and keeps the gaps in order") {
    val docs = Seq(
      1L -> "XXABCDYY",        // shared ABCD cut → "XXYY"
      2L -> "ZZABCDWW",
      3L -> "ABCD123456ABCD",  // two spans, head AND tail cut → middle survives
      4L -> "AB")              // sub-k → untouched
    val r = removed(docs, k = 4)
    assert(r(1L) == (("XXYY", 4L)))
    assert(r(2L) == (("ZZWW", 4L)))
    assert(r(3L) == (("123456", 8L)))
    assert(r(4L) == (("AB", 0L)))
  }

  test("a fully-duplicated doc removes to empty; clean docs round-trip untouched") {
    val r = removed(Seq(1L -> "SAMESAMESAME", 2L -> "SAMESAMESAME",
      3L -> "entirely unique content here"), k = 4)
    assert(r(1L) == (("", 12L)) && r(2L) == (("", 12L)))
    assert(r(3L) == (("entirely unique content here", 0L)))
  }

  test("removal agrees with the marker: removed_chars equals dup_chars on every doc") {
    val docs = Seq(
      1L -> "XXABCDYY", 2L -> "ZZABCDWW", 3L -> "AABCDABCD",
      4L -> "ABCD123456ABCD", 5L -> "AB", 6L -> "")
    val marks = spans(docs, 4)
    val cuts = removed(docs, 4)
    docs.foreach { case (id, _) =>
      assert(cuts(id)._2 == marks(id)._2, s"doc $id: cut ${cuts(id)._2} != marked ${marks(id)._2}")
    }
  }
}
