package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount and subwordCount") {
    val df = Seq("hello world, how are you?", "", "  single  ").toDF("t")
    val toks = df.select(TextAnalysis.tokenCount(col("t"))).as[Int].collect()
    assert(toks sameElements Array(5, 0, 1))
    val sub = df.select(TextAnalysis.subwordCount(col("t"))).as[Int].collect()
    assert(sub.head == 7) // hello world , how are you ?
  }

  test("langId: stopword heuristic picks the right language") {
    val df = Seq(
      "the cat sat on the mat and looked at the dog",
      "der hund ist nicht mit der katze und das haus",
      "le chat est dans la maison et les oiseaux pour une fois",
      "el perro es grande y los gatos en la casa que por",
      "这是一个中文句子",
      "zzz qqq xxx").toDF("t")
    val langs = df.select(TextAnalysis.langId(col("t"))).as[String].collect()
    assert(langs sameElements Array("en", "de", "fr", "es", "zh", "und"))
  }

  test("qualityScore: clean prose beats punctuation soup and shouting") {
    val df = Seq(
      "this is a reasonably long and well formed document with many normal words " * 3,
      "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))",
      "AAAA BBBB CCCC DDDD EEEE FFFF").toDF("t")
    val q = df.select(TextAnalysis.qualityScore(col("t"))).as[Double].collect()
    assert(q(0) > q(1) && q(0) > q(2))
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("fingerprint: whitespace/case-insensitive, content-sensitive") {
    val df = Seq(("a", "Hello   World"), ("b", "hello world"), ("c", "hello worlds"))
      .toDF("id", "t")
    val fps = df.select(col("id"), TextAnalysis.fingerprintMd5(col("t"))).as[(String, String)]
      .collect().toMap
    assert(fps("a") == fps("b"))
    assert(fps("a") != fps("c"))
  }

  test("repetition filters: duplicate lines and n-grams measured exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta\nalpha beta\ngamma delta"),        // 1 dup line of 3
      (2L, "one two three four"),                          // no repetition
      (3L, "spam spam spam spam spam spam"),               // heavy 3-gram dups
      (4L, "short"),                                       // sub-n doc
      (5L, "")                                             // empty
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        TextAnalysis.dupLineFraction(col("text")).as("l"),
        TextAnalysis.dupNgramFraction(col("text"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(out(1L)._1 == 1.0 / 3.0)
    assert(out(2L) == ((0.0, 0.0)))
    // "spam spam spam" x4 duplicates: 4 total 3-grams, 1 distinct
    assert(out(3L)._2 == 3.0 / 4.0)
    assert(out(4L) == ((0.0, 0.0)))
    assert(out(5L) == ((0.0, 0.0)))
  }

  test("charEntropy: uniform two-symbol = 1 bit, single symbol = 0, empty = 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abab"),      // p(a)=p(b)=0.5 → exactly 1 bit
      (2L, "aaaa"),      // single symbol → 0
      (3L, ""),          // empty → 0 by convention
      (4L, "abcd")       // 4 uniform symbols → exactly 2 bits
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"), TextAnalysis.charEntropy(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 1.0)
    assert(out(2L) == 0.0)
    assert(out(3L) == 0.0)
    assert(out(4L) == 2.0)
  }

  test("fixMojibake reverses one layer of UTF-8-as-Latin-1 damage, touches nothing else") {
    import spark.implicits._
    def breakOnce(s: String) = new String(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val clean2 = "caf\u00e9 \u2014 \u201cquoted\u201d na\u00efve"
    val clean5 = "S\u00e3o Paulo a\u00e7a\u00ed"
    val docs = Seq(
      (1L, "plain ascii stays put"),
      (2L, breakOnce(clean2)),            // damaged → must restore
      (3L, clean2),                       // already clean accents → untouched
      (4L, breakOnce(breakOnce(clean2))), // DOUBLE damage: one pass peels one layer
      (5L, clean5)                        // genuine single-encoded text → untouched
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"), TextAnalysis.fixMojibake(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "plain ascii stays put")
    assert(out(2L) == clean2)
    assert(out(3L) == clean2)
    assert(out(4L) == breakOnce(clean2), "one pass peels exactly one layer")
    assert(out(5L) == clean5)
    // second application finishes the doubly-damaged doc
    val twice = docs.filter(col("doc_id") === 4L)
      .select(TextAnalysis.fixMojibake(TextAnalysis.fixMojibake(col("text"))))
      .as[String].head()
    assert(twice == clean2)
  }

  test("scriptMix: fractions by codepoint class, dominance with list-order ties") {
    val docs = Seq(
      (1L, "hello world"),              // pure latin
      (2L, "привет мир"),               // pure cyrillic
      (3L, "hi 機器學習 there"),          // mixed latin + cjk, latin dominant
      (4L, "ab гд"),                    // 2 latin vs 2 cyrillic → tie, latin first
      (5L, "12345 678")                 // digits only
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.scriptMix(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    def f(id: Long, name: String) =
      rows(id).getDouble(rows(id).schema.fieldIndex(s"${name}_frac"))
    def dom(id: Long) = rows(id).getString(rows(id).schema.fieldIndex("dominant"))
    assert(f(1L, "latin") == 1.0 && dom(1L) == "latin")
    assert(f(2L, "cyrillic") == 1.0 && dom(2L) == "cyrillic")
    assert(rows(3L).getLong(1) == 11L) // hi + 4 han + there, spaces excluded
    assert(f(3L, "cjk") == 0.363636 && dom(3L) == "latin")
    assert(dom(4L) == "latin", "equal counts resolve by Scripts order")
    assert(f(5L, "digit") == 1.0 && dom(5L) == "digit")
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(id => f(id, "other") == 0.0))
  }

  test("scriptMix: empty and whitespace-only docs yield NULL fractions, dominant none") {
    val rows = TextAnalysis.scriptMix(
      Seq((1L, ""), (2L, "   \t\n ")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(1L, 2L)) {
      val r = rows(id)
      assert(r.getLong(r.schema.fieldIndex("n_chars")) == 0L)
      assert(r.isNullAt(r.schema.fieldIndex("latin_frac")),
        "zero-char docs must emit NULL, not an engine's 0/0 convention")
      assert(r.isNullAt(r.schema.fieldIndex("other_frac")))
      assert(r.getString(r.schema.fieldIndex("dominant")) == "none")
    }
  }
}
