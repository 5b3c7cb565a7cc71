package graft.llm

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** WordPiece greedy longest-match: hand-computed segmentations, role
  * separation, UNK semantics, and parity with the BERT convention. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def vocabDf(entries: (String, Boolean)*) =
    entries.toSeq.toDF("piece", "cont")

  private def wordsDf(ws: (String, Long)*) = ws.toSeq.toDF("word", "freq")

  private def segMap(words: Seq[(String, Long)], vocab: Seq[(String, Boolean)],
                     maxPieceLen: Int = 6): Map[String, (Seq[String], Boolean)] =
    WordPiece.segmentWords(wordsDf(words: _*), vocabDf(vocab: _*), maxPieceLen)
      .collect().map { r =>
        r.getString(0) -> (r.getSeq[String](2), r.getBoolean(4))
      }.toMap

  test("textbook greedy: unaffable -> un ##aff ##able") {
    val vocab = Seq("un" -> false, "aff" -> true, "able" -> true,
      "u" -> false, "n" -> true, "a" -> true, "f" -> true,
      "b" -> true, "l" -> true, "e" -> true, "a" -> false)
    val m = segMap(Seq("unaffable" -> 1L), vocab)
    assert(m("unaffable") == (Seq("un", "##aff", "##able"), false))
  }

  test("longest match wins over a shorter valid one") {
    // both "play" and "playing" are initial pieces — greedy takes the longer
    val vocab = Seq("play" -> false, "playing" -> false, "ing" -> true,
      "p" -> false, "l" -> true, "a" -> true, "y" -> true,
      "i" -> true, "n" -> true, "g" -> true)
    val m = segMap(Seq("playing" -> 1L), vocab, maxPieceLen = 8)
    assert(m("playing") == (Seq("playing"), false))
  }

  test("roles are distinct: an initial-only piece never matches mid-word") {
    // "ab" exists ONLY as initial; "cab" must fall back to chars after c
    val vocab = Seq("ab" -> false, "c" -> false, "a" -> true, "b" -> true)
    val m = segMap(Seq("cab" -> 1L, "ab" -> 1L), vocab)
    assert(m("cab") == (Seq("c", "##a", "##b"), false))
    assert(m("ab") == (Seq("ab"), false))
  }

  test("a word with no match at some cursor is [UNK] as a whole") {
    val vocab = Seq("a" -> false, "b" -> true) // no 'z' continuation
    val m = segMap(Seq("abz" -> 1L, "za" -> 1L), vocab)
    assert(m("abz") == (Seq("[UNK]"), true))
    assert(m("za") == (Seq("[UNK]"), true)) // no initial 'z' either
  }

  test("over-long words emit as [UNK], never vanish (max_input_chars_per_word)") {
    val vocab = Seq("a" -> false, "a" -> true)
    val out = WordPiece.segmentWords(
      wordsDf("aaa" -> 2L, ("a" * 20) -> 5L), vocabDf(vocab: _*),
      maxPieceLen = 1, maxWordLen = 16)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getSeq[String](2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out.size == 2) // the 20-char word is present, not dropped
    assert(out("aaa") == ((2L, Seq("a", "##a", "##a"), 3L, false)))
    assert(out("a" * 20) == ((5L, Seq("[UNK]"), 1L, true)))
  }

  test("greedy is not optimal and we replicate that faithfully") {
    // vocab: initial "ab", continuations "c", "bc" BUT no continuation
    // for the tail after greedy's choice: "abc": greedy takes "ab"
    // then needs continuation "c" — give it; now remove "c" and add
    // continuation "bc": greedy still takes "ab" first and dies -> UNK,
    // even though a ##bc split after initial "a" would have worked
    val vocab = Seq("ab" -> false, "a" -> false, "bc" -> true, "b" -> false)
    val m = segMap(Seq("abc" -> 1L), vocab)
    assert(m("abc") == (Seq("[UNK]"), true))
  }

  test("trainMerges scores by likelihood, not raw count: PMI beats frequency") {
    // "th" occurs 6× but both t and h are everywhere; "qu" occurs 2×
    // with q appearing ONLY before u — freq(qu)/(freq(q)·freq(u)) is
    // maximal, so likelihood training must pick q+u first while
    // count-trained BPE would pick the most frequent pair
    val docs = Seq(
      (1L, "the the the quo"),
      (2L, "the the the quo"),
      (3L, "tho hat hat hat")).toDF("doc_id", "text")
    val merges = WordPiece.trainMerges(docs, "text", k = 1, m = 1).collect()
    assert(merges.length == 1)
    val r = merges.head
    assert(r.getString(2) == "q u", s"expected q+u first, got ${r.getString(2)}")
    assert(r.getLong(4) == 2L)                  // n = freq(qu)
    assert(r.getLong(5) == 2L)                  // fa = freq(q)
    val bpeFirst = Bpe.trainMerges(docs, "text", k = 1).collect().head.getString(1)
    assert(bpeFirst != "q u", "fixture must separate the two criteria")
  }

  test("trainMerges batched rounds select independent pairs and are replayable") {
    val docs = Seq(
      (1L, "alpha beta gamma delta alpha beta"),
      (2L, "gamma delta epsilon zeta alpha"),
      (3L, "beta gamma zeta zeta epsilon")).toDF("doc_id", "text")
    val out = WordPiece.trainMerges(docs, "text", k = 8, m = 4).collect()
    assert(out.length == 8)
    assert(out.map(_.getInt(0)).toSeq == (1 to 8))            // global step order
    assert(out.map(_.getInt(1)).distinct.toSeq == Seq(1, 2))  // 2 rounds of 4
    // within a round the selected pairs are mutually independent:
    // no symbol or merged output repeats
    out.groupBy(_.getInt(1)).foreach { case (_, rows) =>
      val parts = rows.flatMap { r =>
        val Array(a, b) = r.getString(2).split(" ", 2)
        Seq(a, b, r.getString(3))
      }
      assert(parts.distinct.length == parts.length, s"round reuses a symbol: ${parts.toSeq}")
    }
    // deterministic: a second run replays identically
    val again = WordPiece.trainMerges(docs, "text", k = 8, m = 4).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("vocabFromCorpus: roles counted separately, chars always kept, deterministic cut") {
    val docs = Seq("aba ab", "aba").toDF("text")
    val v = WordPiece.vocabFromCorpus(docs, "text", vocabSize = 5, maxPieceLen = 3)
      .collect().map(r => (r.getString(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    // words: aba (freq 2), ab (freq 1)
    // initial 'a' appears once per word occurrence: 2 + 1 = 3
    assert(v(("a", false)) == 3L)
    // continuation 'a': position 3 of aba -> 2
    assert(v(("a", true)) == 2L)
    // continuation 'b': middle of aba (2) + end of ab (1) = 3
    assert(v(("b", true)) == 3L)
    // multi-char budget: 5 - 3 chars = 2 pieces, top by (n desc, piece asc, init first):
    // ab-initial n=3 and aba-initial n=2? counts: "ab" initial from aba(2)+ab(1)=3;
    // "ba" cont from aba = 2; "aba" initial = 2; "b"-initial never (no word starts b)
    assert(v.contains(("ab", false)))
    assert(v.size == 5)
  }

  test("fertility parity with documents fixture: every segmented word reassembles") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val vocab = WordPiece.vocabFromCorpus(docs, "text", vocabSize = 400)
    val words = Unigram.wordTable(docs, "text")
    val seg = WordPiece.segmentWords(words, vocab)
    // reassembly: non-UNK pieces with ## stripped concatenate back to the word
    val bad = seg.filter(!col("is_unk"))
      .withColumn("rejoined",
        concat_ws("", transform(col("pieces"), p => regexp_replace(p, "^##", ""))))
      .filter(col("rejoined") =!= col("word"))
    assert(bad.count() == 0)
    // full single-char coverage => nothing in range is UNK
    assert(seg.filter(col("is_unk") && length(col("word")) <= 16).count() == 0)
  }
}
