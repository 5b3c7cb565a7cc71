package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def vocabDF(entries: (String, Long)*) =
    entries.toSeq.toDF("piece", "cost")

  private def segment(words: Seq[(String, Long)], vocab: Seq[(String, Long)],
                      maxPieceLen: Int = 6) =
    Unigram.viterbiSegment(words.toDF("word", "freq"), vocabDF(vocab: _*), maxPieceLen)
      .collect().map(r => r.getString(0) ->
        ((r.getSeq[String](2), r.getLong(3), r.getLong(4)))).toMap

  /** Brute-force reference: enumerate EVERY segmentation, pick min by
    * (cost, n pieces, space-joined path) — the documented global
    * tie-break the DP must land on. */
  private def brute(word: String, vocab: Map[String, Long],
                    maxPieceLen: Int): Option[(Seq[String], Long, Int)] = {
    def go(i: Int): Seq[List[String]] =
      if (i == word.length) Seq(Nil)
      else (1 to math.min(maxPieceLen, word.length - i)).flatMap { len =>
        val p = word.substring(i, i + len)
        if (vocab.contains(p)) go(i + len).map(p :: _) else Nil
      }
    val all = go(0)
    if (all.isEmpty) None
    else {
      val best = all.map(ps => (ps.map(vocab).sum, ps.length, ps.mkString(" "), ps))
        .minBy(t => (t._1, t._2, t._3))
      Some((best._4, best._1, best._2))
    }
  }

  test("Viterbi picks the min-cost segmentation") {
    // "abc": a+bc = 10+12 = 22; ab+c = 11+10 = 21; a+b+c = 30 → ab+c
    val out = segment(Seq(("abc", 1L)),
      Seq(("a", 10L), ("b", 10L), ("c", 10L), ("ab", 11L), ("bc", 12L)))
    assert(out("abc") == ((Seq("ab", "c"), 21L, 2L)))
  }

  test("equal cost prefers fewer pieces, then the lexicographically smaller path") {
    // "ab": a+b = 20, ab = 20 → same cost, ab has fewer pieces
    val out = segment(Seq(("ab", 1L)), Seq(("a", 10L), ("b", 10L), ("ab", 20L)))
    assert(out("ab") == ((Seq("ab"), 20L, 1L)))
    // "aa": both one-piece? no — "aa" absent; a+a only. Now craft a lex tie:
    // "ab" via (a)(b) vs... need two equal-cost equal-n paths: word "abc"
    // with ab+c = 15+10 and a+bc = 10+15: paths "ab c" vs "a bc" — "a bc" < "ab c"
    val out2 = segment(Seq(("abc", 1L)),
      Seq(("a", 10L), ("b", 99L), ("c", 10L), ("ab", 15L), ("bc", 15L)))
    assert(out2("abc") == ((Seq("a", "bc"), 25L, 2L)))
  }

  test("DP equals exhaustive enumeration on randomized small cases") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    val words = (1 to 40).map(_ =>
      (1 to (2 + rnd.nextInt(7))).map(_ => alphabet(rnd.nextInt(3))).mkString)
      .distinct
    // random vocab: all chars + random multi-char pieces with random costs
    val multis = (1 to 15).map(_ =>
      (1 to (2 + rnd.nextInt(3))).map(_ => alphabet(rnd.nextInt(3))).mkString)
      .distinct
    val vocab = (alphabet.map(c => c.toString -> (5L + rnd.nextInt(20))) ++
      multis.map(m => m -> (5L + rnd.nextInt(30)))).toMap
    val got = segment(words.map(_ -> 1L), vocab.toSeq, maxPieceLen = 6)
    words.foreach { w =>
      val want = brute(w, vocab, 6).get
      assert(got(w) == ((want._1, want._2, want._3.toLong)),
        s"word $w: got ${got(w)}, brute $want")
    }
  }

  test("long words and words with uncovered characters are skipped") {
    val out = segment(
      Seq(("a" * 20, 1L), ("axb", 1L), ("ab", 1L)),
      Seq(("a", 10L), ("b", 10L)), maxPieceLen = 3)
    assert(out.keySet == Set("ab")) // 20-char word over maxWordLen; 'x' uncovered
  }

  test("seedVocab: chars always kept, top multi-char by weighted count, micro-nat costs") {
    val docs = Seq("ab ab cd").toDF("text") // words: ab(×2), cd(×1)
    val v = Unigram.seedVocab(docs, "text", vocabSize = 5, maxPieceLen = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // substrings: ab→{a,b,ab}×2 ; cd→{c,d,cd}×1
    assert(v("a")._1 == 2 && v("ab")._1 == 2 && v("c")._1 == 1)
    // 4 chars kept + 1 slot → 'ab' (count 2) beats 'cd'
    assert(v.keySet == Set("a", "b", "c", "d", "ab"))
    val total = v.values.map(_._1).sum // 2+2+1+1+2 = 8
    assert(total == 8)
    assert(v("a")._2 == math.round(math.log(8.0 / 2) * 1e6))
    assert(v("c")._2 == math.round(math.log(8.0 / 1) * 1e6))
  }

  test("emRound recounts from chosen segmentations and prunes unused pieces") {
    // vocab makes 'ab' the winner for word ab: chars never chosen there
    val words = Seq(("ab", 3L), ("b", 2L)).toDF("word", "freq")
    val v = vocabDF(("a", 10L), ("b", 10L), ("ab", 5L))
    val out = Unigram.emRound(words, v)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // ab chosen 3×, b chosen 2× (standalone word), a never → pruned
    assert(out.keySet == Set("ab", "b"))
    assert(out("ab")._1 == 3 && out("b")._1 == 2)
    assert(out("ab")._2 == math.round(math.log(5.0 / 3) * 1e6))
  }

  test("segmentation is partitioning-invariant") {
    val words = Seq(("abcabc", 1L), ("aabb", 2L), ("ccc", 1L))
    val vocab = Seq(("a", 7L), ("b", 9L), ("c", 4L), ("ab", 12L), ("bc", 11L), ("cab", 20L))
    def run(parts: Int) =
      Unigram.viterbiSegment(words.toDF("word", "freq").repartition(parts),
        vocabDF(vocab: _*))
        .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(run(1) == run(7))
  }

  test("docPerplexity: exact per-doc cost sums, OOV counted, fluent < gibberish") {
    // vocab: "ab" cheap, chars pricier — a doc of "abab" words scores
    // lower per piece than one of "ba" words; "zz" is unsegmentable
    val vocab = Seq(("a", 10L), ("b", 12L), ("ab", 5L))
    val docs = Seq(
      (1L, "abab ab abab"),   // 2·(5+5) + 5 + 10 = hand-derivable
      (2L, "ba ba"),          // each ba = b+a = 22, no better path
      (3L, "ab zz ab"),       // one OOV word
      (4L, "")                // empty text → absent from output
    ).toDF("doc_id", "text")
    val out = Unigram.docPerplexity(docs, "text", "doc_id", vocabDF(vocab: _*),
        maxPieceLen = 2, maxWordLen = 16)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: abab=10 (ab+ab), ab=5, abab=10 → total 25, pieces 2+1+2=5
    assert(out(1L).getLong(1) == 25L && out(1L).getLong(2) == 5L &&
      out(1L).getLong(3) == 0L && out(1L).getLong(4) == 3L)
    assert(out(1L).getDouble(5) == 5.0)
    // doc 2: 2 × (12+10) = 44 over 4 pieces → 11.0 per piece
    assert(out(2L).getLong(1) == 44L && out(2L).getDouble(5) == 11.0)
    assert(out(1L).getDouble(5) < out(2L).getDouble(5)) // fluent < gibberish
    // doc 3: zz is OOV (z not in vocab): cost counts only the two abs (5+5)
    assert(out(3L).getLong(1) == 10L && out(3L).getLong(3) == 1L &&
      out(3L).getLong(4) == 3L)
    assert(!out.contains(4L))
  }
}
