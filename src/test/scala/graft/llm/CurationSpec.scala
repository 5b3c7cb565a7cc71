package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def lineKeep(lines: String*): Seq[Boolean] =
    lines.toDF("l").select(Curation.c4LineKeep(col("l")).as("k"))
      .collect().map(_.getBoolean(0)).toSeq

  test("c4LineKeep: terminal punctuation, three words, no javascript") {
    assert(lineKeep(
      "a proper sentence ends here.",     // keep
      "does it really work?",             // keep — question mark
      "quoted ending works too”",    // keep — curly close quote
      "trailing spaces fine.   ",         // keep — \s* after punct
      "no terminal punctuation",          // drop — no punct
      "two words.",                       // drop — under 3 words
      "please enable JavaScript today.",  // drop — javascript, any case
      "") ==                              // drop — empty
      Seq(true, true, true, true, false, false, false, false))
  }

  test("c4Filter: line rules, doc gates, and reassembly") {
    val docs = Seq(
      (1L, "first line stays here.\nsecond line stays here!\nthird line stays here?\nnav menu junk"),
      (2L, "only one line survives this.\nshort.\nno punct here"),
      (3L, "good line number one.\ngood line number two.\ngood line number three.\nfiller lorem ipsum dolor."),
      (4L, "good line number one.\ngood line number two.\nvar x = { a: 1 }.")
    ).toDF("doc_id", "text")
    val out = Curation.c4Filter(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(1) && out(1L).getLong(3) == 3L &&
      out(1L).getString(4) == "first line stays here.\nsecond line stays here!\nthird line stays here?")
    assert(!out(2L).getBoolean(1) && out(2L).getLong(3) == 1L) // below kept floor
    assert(!out(3L).getBoolean(1))                             // lorem ipsum gate
    assert(!out(4L).getBoolean(1))                             // curly-brace gate
    assert(out(2L).isNullAt(4) && out(3L).isNullAt(4))
  }

  private val passingBase: String =
    ("the pipeline needs to keep track of the rows that arrive and that " +
      "it must have synced with the store before the next pass begins and " +
      "the counts settle into place over time with care while the totals " +
      "hold the line as data flows in to be sure every single day")

  private def gopherRow(text: String) =
    Curation.gopherStats(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text").head()

  test("gopherStats: a stopword-rich 51-word base passes all seven rules") {
    val r = gopherRow(passingBase)
    assert(r.getLong(1) == 51L, "word count")
    assert(r.getLong(7) == 8L, "all eight required stopwords present")
    assert(r.getBoolean(8), s"base must pass: $r")
  }

  test("gopherStats: each violation class fails exactly its rule") {
    // word-count floor
    assert(!gopherRow("the doc stays tiny and short.").getBoolean(8))
    // symbol ratio: 15 'ax##' tokens on the base -> 30 '#' over 66 words
    val sym = gopherRow(passingBase + " " + Seq.fill(15)("ax##").mkString(" "))
    assert(sym.getDouble(3) > 0.1 && !sym.getBoolean(8))
    assert(sym.getDouble(6) == 1.0, "ax## still counts as an alpha word")
    // bullet lines
    val bul = gopherRow(Seq.fill(10)("• the quick and steady line item goes here").mkString("\n"))
    assert(bul.getDouble(4) == 1.0 && !bul.getBoolean(8))
    // ellipsis endings: one of two lines trails off
    val ell = gopherRow(passingBase + "\nand then the line trails away…")
    assert(ell.getDouble(5) == 0.5 && !ell.getBoolean(8))
    // alpha fraction: 60 numeric tokens against 51 alpha words
    val alp = gopherRow(passingBase + " " + Seq.fill(60)("12345").mkString(" "))
    assert(alp.getDouble(6) < 0.8 && !alp.getBoolean(8))
    // no required stopwords at all
    val stp = gopherRow(Seq.fill(8)("lorem dolor amet consectetur adipiscing elit sed eiusmod").mkString(" "))
    assert(stp.getLong(7) == 0L && !stp.getBoolean(8))
    // mean word length collapses below 3
    val men = gopherRow("the of " + Seq.fill(10)("a b c d e f g h i j").mkString(" "))
    assert(men.getDouble(2) < 3.0 && !men.getBoolean(8))
  }

  test("gopherStats: word-free docs get NULL per-word ratios and pass=false") {
    for (text <- Seq("", "   \n\t  ")) {
      val r = gopherRow(text)
      assert(r.getLong(1) == 0L, "no words")
      assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(6),
        "per-word ratios must be NULL, not an engine's 0/0 convention")
      assert(!r.getBoolean(8), "the n_words floor still fails the doc outright")
    }
  }
}
