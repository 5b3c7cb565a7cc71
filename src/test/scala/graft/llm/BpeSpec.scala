package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the ACL'16 demo corpus: first merges are e+s, es+t, est+</w>
  private def demo = Seq(
    ("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)
  ).flatMap { case (w, n) => Seq.fill(n)(w) }.zipWithIndex
    .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")

  test("learns the textbook merges on the Sennrich demo corpus") {
    val rules = Bpe.trainMerges(demo, "text", k = 3)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rules.toSeq == Seq(
      (1, "e s", "es", 9L),    // newest(6) + widest(3); lexicographic tie-break
      (2, "es t", "est", 9L),
      (3, "est </w>", "est</w>", 9L)))
  }

  test("merge application rewrites ALL adjacent occurrences sharing a separator") {
    val out = Seq((1L, "banana")).toDF("id", "text")
      .select(Bpe.applyMerge(lit("b a n a n a </w>"), "a n").as("s"))
      .as[String].head()
    assert(out == "b an an a </w>", s"got '$out'")
  }

  test("segmentation reconstructs every word; trained rules shrink token counts") {
    val rules = Bpe.trainMerges(demo, "text", k = 5)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    val seg = Bpe.segmentWords(demo, "text", rules)
      .collect().map(r => (r.getString(0), r.getSeq[String](2))).toMap
    seg.foreach { case (word, toks) =>
      assert(toks.mkString("").stripSuffix("</w>") == word,
        s"$word reassembles from $toks")
    }
    // "newest" must have fused the est</w> suffix by step 3
    assert(seg("newest").contains("est</w>"), seg("newest").toString)
    assert(seg("newest").size < "newest".length + 1)
  }

  test("deterministic under repartition") {
    val a = canon(Bpe.trainMerges(demo, "text", 4))
    val b = canon(Bpe.trainMerges(demo.repartition(7), "text", 4))
    assert(a == b)
  }

  test("early exhaustion: single-letter corpus runs out of pairs and stops") {
    val tiny = Seq((1L, "a a a")).toDF("doc_id", "text")
    // vocab is one word "a" → "a </w>"; one merge fuses it, then no pairs remain
    val rules = Bpe.trainMerges(tiny, "text", k = 10).collect()
    assert(rules.length == 1)
    assert(rules(0).getString(1) == "a </w>")
  }

  test("batched training with m=1 equals exact greedy row for row") {
    for (k <- Seq(3, 6)) {
      val exact = Bpe.trainMerges(demo, "text", k)
        .orderBy("step").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      val batched = Bpe.trainMergesBatched(demo, "text", k, m = 1)
        .orderBy("step").collect()
        .map(r => (r.getInt(0), r.getString(2), r.getString(3), r.getLong(4))).toSeq
      assert(batched == exact, s"k=$k: m=1 must degenerate to exact greedy")
    }
  }

  test("batched training with m>1: independent picks, fertility-equivalent vocabulary") {
    // a corpus wide enough that one round holds several independent pairs
    val wide = Seq(
      ("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
      ("bid", 4), ("bids", 2), ("crop", 4), ("crops", 3)
    ).flatMap { case (w, n) => Seq.fill(n)(w) }.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val k = 8
    val rows = Bpe.trainMergesBatched(wide, "text", k, m = 4)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(rows.nonEmpty && rows.map(_._1).toSeq == (1 to rows.length))
    // within every round the picked pairs are mutually independent:
    // symbols and merged outputs pairwise disjoint
    rows.groupBy(_._2).foreach { case (round, picks) =>
      val parts = picks.flatMap { case (_, _, pair, merged, _) =>
        pair.split(" ", 2).toSeq :+ merged }
      assert(parts.distinct.size == parts.size,
        s"round $round picks collide: ${picks.map(_._3).toSeq}")
    }
    // fewer driver rounds than merges — the point of the gear
    assert(rows.map(_._2).distinct.length <= (k + 3) / 4)
    // fertility equivalence: segmenting with the batched rules compresses
    // the corpus to within one token-per-word of the exact-greedy rules
    // trained to the same budget
    def fertility(rules: Seq[(Int, String)]): Double = {
      val seg = Bpe.segmentWords(wide, "text", rules)
        .select(sum(col("freq") * size(col("tokens"))).cast("double"),
          sum(col("freq")).cast("double")).head()
      seg.getDouble(0) / seg.getDouble(1)
    }
    val exactRules = Bpe.trainMerges(wide, "text", k)
      .select("step", "pair").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    val batchedRules = rows.map(t => (t._1, t._3)).toSeq
    val (fe, fb) = (fertility(exactRules), fertility(batchedRules))
    assert(math.abs(fe - fb) <= 0.35, s"exact $fe vs batched $fb")
  }

  test("encodeCorpus: ids are frequency-ordered, positions reassemble each word") {
    val rules = Bpe.trainMerges(demo, "text", 3)
      .select("step", "pair").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    val enc = Bpe.encodeCorpus(demo, demo, "doc_id", "text", rules)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    // every (doc, word) reassembles from its tokens in tpos order
    val words = demo.select(col("doc_id"),
        posexplode(split(col("text"), "\\s+")).as(Seq("wpos", "word")))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong) -> r.getString(2)).toMap
    enc.groupBy(t => (t._1, t._2)).foreach { case (k, toks) =>
      val joined = toks.sortBy(_._3).map(_._4).mkString("").stripSuffix("</w>")
      assert(joined == words(k), s"$k: $joined != ${words(k)}")
    }
    // id 1 is the most frequent token; ids are dense over the vocabulary
    val byToken = enc.map(t => t._4 -> t._5).toMap
    val idsUsed = byToken.values.toSet
    assert(byToken.nonEmpty && idsUsed.min >= 1L)
    // same token always maps to the same id
    assert(enc.groupBy(_._4).forall(_._2.map(_._5).distinct.size == 1))
  }

  test("sourceFertility: token/word ratio per group; OOV counts ids beyond the budget") {
    val docs = Seq(
      (1L, "low low lower", "a"),
      (2L, "newest widest", "b")
    ).toDF("doc_id", "text", "source")
    val rules = Bpe.trainMerges(docs, "text", 2)
      .select("step", "pair").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    // budget 0: every token is OOV — oov_frac must be exactly 1
    val all = Bpe.sourceFertility(docs, "doc_id", "text", "source", rules, vocabSize = 0)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(all("a")._1 == 3L && all("b")._1 == 2L)
    assert(all("a")._4 == 1.0 && all("b")._4 == 1.0)
    assert(all("a")._3 == math.round(all("a")._2.toDouble / 3 * 1e6) / 1e6)
    // a huge budget drives OOV to zero without touching fertility
    val none = Bpe.sourceFertility(docs, "doc_id", "text", "source", rules, vocabSize = 1000)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(none.values.forall(_ == 0.0))
  }

  test("byte level: hex-byte seed, and words with UNSEEN codepoints still segment") {
    val docs = Seq((1L, "low 日本 😀")).toDF("doc_id", "text")
    val seeds = Bpe.wordVocab(docs, "text", byteLevel = true)
      .select("word", "seq").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(seeds("low") == "6c 6f 77 </w>")
    assert(seeds("日本") == "e6 97 a5 e6 9c ac </w>")
    assert(seeds("😀") == "f0 9f 98 80 </w>") // 4-byte emoji
    // train on an ASCII-only corpus, then segment a CJK word the
    // trainer never saw: char level leaves it as ONE unsplittable
    // unknown symbol; byte level decomposes it into in-alphabet bytes
    val corpus = Seq((1L, "abab abab baba")).toDF("doc_id", "text")
    val rules = Bpe.trainMerges(corpus, "text", 2, byteLevel = true)
      .select("step", "pair").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    val seg = Bpe.segmentWords(Seq((2L, "日ab")).toDF("doc_id", "text"),
        "text", rules, byteLevel = true)
      .select("tokens").collect().head.getSeq[String](0)
    // every token is either a learned merge output or a raw byte — the
    // OOV-free guarantee: nothing is outside the ≤256-symbol alphabet
    val merged = rules.map(_._2.replace(" ", "")).toSet
    assert(seg.forall(t => t == "</w>" || merged.contains(t) || t.matches("[0-9a-f]{2}")),
      s"unexpected out-of-alphabet token in $seg")
    assert(seg.exists(merged.contains), s"learned merges must still apply: $seg")
  }

  test("byte level trainMergesBatched m=1 equals byte trainMerges") {
    val docs = Seq((1L, "low low lower 日本 日本 newest")).toDF("doc_id", "text")
    val exact = Bpe.trainMerges(docs, "text", 5, byteLevel = true)
      .select("step", "pair", "n").collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val batched = Bpe.trainMergesBatched(docs, "text", 5, m = 1, byteLevel = true)
      .select("step", "pair", "n").collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(exact == batched)
  }
}
