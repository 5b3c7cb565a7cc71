package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TermsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "banana cherry banana durian"),
    (3L, "apple banana cherry durian"),
    (4L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  test("tfidfTopTerms: rare repeated terms outrank ubiquitous ones") {
    val out = Terms.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val byDoc = out.groupBy(_._1)
    // doc 1: apple tf=2 df=2; banana tf=1 df=3; cherry tf=1 df=3.
    // N=4 (NULL-text doc still counts toward corpus size).
    val d1 = byDoc(1L).sortBy(_._2).map(t => (t._2, t._3))
    assert(d1.head._1 == "apple" && d1.head._2 == 2L)
    // idf(apple) = ln(5/3)+1; score = 2*(ln(5/3)+1)
    val appleScore = byDoc(1L).find(_._2 == "apple").get._4
    assert(math.abs(appleScore - 2.0 * (math.log(5.0 / 3.0) + 1.0)) < 1e-3)
    // every doc emits at most k rows; the NULL-text doc emits none
    assert(byDoc.forall(_._2.length <= 2))
    assert(!byDoc.contains(4L))
  }

  test("tfidfTopTerms rank is deterministic: score desc then term asc") {
    // doc 3: all four terms tf=1; apple/durian df=2 beat banana/cherry
    // df=3; within equal score the term string breaks the tie
    val d3 = Terms.tfidfTopTerms(docs, "doc_id", "text", k = 4)
      .filter(col("doc_id") === 3L)
      .orderBy(col("score").desc, col("term").asc)
      .select("term").as[String].collect().toSeq
    assert(d3 == Seq("apple", "durian", "banana", "cherry"))
  }

  test("noveltyScore: unique shingles score 1, fully shared score 0") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),   // shingles: {a b g, b g d} — shared with doc 2
      (2L, "alpha beta gamma delta"),   // exact dup → novelty 0
      (3L, "wholly original phrasing here indeed")  // all unique → novelty 1
    ).toDF("doc_id", "text")
    val nov = Terms.noveltyScore(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(nov(1L) == 0.0 && nov(2L) == 0.0 && nov(3L) == 1.0)
  }

  test("groupOverlap: identical groups score 1, disjoint pairs are omitted") {
    val corpus = Seq(
      (1L, "s1", "alpha beta gamma delta epsilon"),
      (2L, "s2", "alpha beta gamma delta epsilon"),  // mirror of s1
      (3L, "s3", "entirely different shingle material here"),
      (4L, "s4", "alpha beta gamma zeta eta")        // partial overlap with s1/s2
    ).toDF("doc_id", "source", "text")
    val out = Terms.groupOverlap(corpus, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out(("s1", "s2")) == 1.0)
    assert(!out.keySet.exists(p => p._1 == "s3" || p._2 == "s3"), out.toString)
    // s1 has 3 shingles, s4 has 3, they share exactly "alpha beta gamma"
    assert(math.abs(out(("s1", "s4")) - 1.0 / 5.0) < 1e-12)
  }

  test("groupOverlapSketch: exact when k covers the union; omits no-collision pairs") {
    val corpus = Seq(
      (1L, "s1", "alpha beta gamma delta epsilon"),
      (2L, "s2", "alpha beta gamma delta epsilon"),  // mirror of s1
      (3L, "s3", "entirely different shingle material here"),
      (4L, "s4", "alpha beta gamma zeta eta")        // partial overlap with s1/s2
    ).toDF("doc_id", "source", "text")
    // k >= every union size → the sketch IS the set and estimates are exact
    val est = Terms.groupOverlapSketch(corpus, "source", "text", k = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val exact = Terms.groupOverlap(corpus, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (p, j) => assert(math.abs(est(p) - j) < 1e-12, s"$p: ${est(p)} vs $j") }
    // s3 shares nothing — no sketch collision, pair omitted
    assert(!est.keySet.exists(p => p._1 == "s3" || p._2 == "s3"))
  }

  test("groupOverlapSketch at small k: bounded estimate, mirrors still score 1") {
    // 60 shingles per source, half shared — k=8 sketches estimate coarsely
    // but identical sources must still estimate exactly 1.0 (equal sets →
    // identical sketches), and estimates stay within [0, 1]
    val words = (1 to 80).map(i => s"w$i")
    def text(drop: Int) = words.drop(drop).take(62).mkString(" ")
    val corpus = Seq(
      (1L, "a", text(0)), (2L, "b", text(0)), (3L, "c", text(30))
    ).toDF("doc_id", "source", "text")
    val est = Terms.groupOverlapSketch(corpus, "source", "text", k = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(est(("a", "b")) == 1.0)
    est.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
  }

  test("groupSetSketchOps: exact branch below k recovers true set cardinalities") {
    // unions small enough that every sketch IS its set: estimates are exact
    val words = (1 to 40).map(i => s"w$i")
    def text(from: Int, n: Int) = words.slice(from, from + n).mkString(" ")
    // a: shingles of w1..w20 (18), b: w11..w30 (18) → union 28-ish, inter 8
    val corpus = Seq(
      (1L, "a", text(0, 20)), (2L, "b", text(10, 20))).toDF("doc_id", "source", "text")
    val row = Terms.groupSetSketchOps(corpus, "source", "text", k = 64)
      .collect().head
    val (estA, estB, union, inter, j) =
      (row.getDouble(2), row.getDouble(3), row.getDouble(4), row.getDouble(5), row.getDouble(6))
    assert(estA == 18.0 && estB == 18.0) // 20 words → 18 3-shingles each
    assert(union == 28.0)                // 8 shared shingles
    assert(j == math.floor(8.0 / 28 * 1e6 + 0.5) / 1e6)
    assert(inter == math.floor(j * 28 * 100 + 0.5) / 100)
    assert(row.getDouble(7) == math.max(0.0, 18.0 - inter)) // diff_a
  }

  test("groupSetSketchOps: estimator branch tracks true sizes within KMV error") {
    // 200+ distinct shingles per source with k=32 → the (k−1)·H/kth
    // estimator engages; expect ±~35% (2/sqrt(32)) of truth
    val words = (1 to 260).map(i => s"w$i")
    def text(from: Int, n: Int) = words.slice(from, from + n).mkString(" ")
    val corpus = Seq(
      (1L, "a", text(0, 220)), (2L, "b", text(100, 160))).toDF("doc_id", "source", "text")
    val row = Terms.groupSetSketchOps(corpus, "source", "text", k = 32)
      .collect().head
    val estA = row.getDouble(2); val union = row.getDouble(4)
    assert(estA > 218 * 0.6 && estA < 218 * 1.5, s"estA=$estA")
    assert(union > 258 * 0.6 && union < 258 * 1.5, s"union=$union")
  }

  test("lengthHistogram buckets by floor(log2(tokens)), empty docs at -1") {
    val corpus = Seq(
      (1L, "one"),                       // 1 token  → bucket 0
      (2L, "one two three"),             // 3 tokens → bucket 1
      (3L, "a b c d e f g h"),           // 8 tokens → bucket 3
      (4L, "")                           // empty    → bucket -1
    ).toDF("doc_id", "text")
    val hist = Terms.lengthHistogram(corpus, "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(hist == Map(0L -> ((1L, 1L)), 1L -> ((1L, 3L)), 3L -> ((1L, 8L)), -1L -> ((1L, 0L))))
  }

  test("topNgrams counts raw occurrences, short and NULL docs contribute nothing") {
    val corpus = Seq(
      (1L, "to be or not to be"),   // "to be" twice
      (2L, "be or"),
      (3L, "single"),               // 1 word < n → nothing
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val top = Terms.topNgrams(corpus, "text", n = 2, k = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // ties order by ngram asc: "be or" before "to be" at n=2
    assert(top.head == ("be or" -> 2L))
    assert(top.toMap == Map("be or" -> 2L, "to be" -> 2L, "not to" -> 1L))
  }

  test("unigramNegLogProb: exact quantized means; empty/NULL docs drop out") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a a"), (2L, "b"), (3L, ""), (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Terms.unigramNegLogProb(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // counts: a=2, b=1, total=3
    val nllA = math.round(-math.log(2.0 / 3.0) * 1e6) / 1e6  // 0.405465
    val nllB = math.round(-math.log(1.0 / 3.0) * 1e6) / 1e6  // 1.098612
    assert(out.keySet == Set(1L, 2L), out.toString)
    assert(out(1L) == ((2L, nllA)), out.toString)
    assert(out(2L) == ((1L, nllB)), out.toString)
    // rarer tokens cost more by construction
    assert(out(2L)._2 > out(1L)._2)
    // empty corpus survives (no NPE from the scalar total)
    assert(Terms.unigramNegLogProb(corpus.limit(0), "doc_id", "text").isEmpty)
  }

  test("unigramNegLogProb tokenizes once: the final plan reads the checkpointed tf, no Generate") {
    import spark.implicits._
    val corpus = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = Terms.unigramNegLogProb(corpus, "doc_id", "text")
    // the exploding tokenizer runs exactly once, at tf materialization;
    // every consumer (counts, total, score join) reads the checkpointed
    // per-(doc, token) counts — so the final plan contains NO Generate
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), s"explode leaked past the lineage cut:\n$plan")
    // and the numbers are still the per-occurrence quantized means
    val got = out.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val nll = (c: Long) => math.round(-math.log(c / 5.0) * 1e6)
    assert(got(1L) == ((3L, (2 * nll(2) + nll(2)).toDouble / 3 / 1e6)), got.toString)
    assert(got(2L) == ((2L, (nll(2) + nll(1)).toDouble / 2 / 1e6)), got.toString)
  }

  test("sourceKlDivergence: identical distributions score 0, drift scores positive, exact micro-nats") {
    import spark.implicits._
    val same = Seq(("a", "x y"), ("b", "x y")).toDF("source", "text")
    val sameOut = Terms.sourceKlDivergence(same, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(sameOut("a") == 0.0 && sameOut("b") == 0.0)

    val drift = Seq(("a", "x x y"), ("b", "x y y")).toDF("source", "text")
    val out = Terms.sourceKlDivergence(drift, "source", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // corpus: x=3, y=3, total=6. A: x=2,y=1 → lr_x=round(ln(4/3)e6), lr_y=round(ln(2/3)e6)
    val lrX = math.round(math.log(4.0 / 3.0) * 1e6)
    val lrY = math.round(math.log(2.0 / 3.0) * 1e6)
    val expectA = (2 * lrX + lrY).toDouble / 3 / 1e6
    assert(out("a") == ((3L, expectA)), out.toString)
    assert(out("b") == ((3L, expectA)), "symmetric corpus ⇒ symmetric KL")
    assert(expectA > 0)
  }

  test("bigramNegLogProb: word order matters — scrambled text scores worse, unigram can't tell") {
    import spark.implicits._
    val natural = "the cat sat on the mat and the dog sat on the rug"
    // same multiset of words, order destroyed
    val scrambled = "mat the on dog sat rug the the and cat on sat the"
    val corpus = ((0L until 20L).map(i => (i, natural)) :+ (99L, scrambled))
      .toDF("doc_id", "text")
    val bi = Terms.bigramNegLogProb(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(bi(99L) > bi(0L), s"scrambled must cost more: $bi")
    val uni = Terms.unigramNegLogProb(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(math.abs(uni(99L) - uni(0L)) < 1e-9, "unigram is order-blind by construction")
  }

  test("bigramNegLogProb: exact add-1 conditional; single-token and empty docs drop out") {
    import spark.implicits._
    val corpus = Seq((1L, "a b a b"), (2L, "a"), (3L, "")).toDF("doc_id", "text")
    val out = Terms.bigramNegLogProb(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet == Set(1L))
    // bigrams: "a b"×2, "b a"×1; contexts: a·=2, b·=1; V=2
    val nab = math.round(-math.log(3.0 / 4.0) * 1e6)
    val nba = math.round(-math.log(2.0 / 3.0) * 1e6)
    assert(out(1L) == ((3L, (2 * nab + nba).toDouble / 3 / 1e6)), out.toString)
  }
}
