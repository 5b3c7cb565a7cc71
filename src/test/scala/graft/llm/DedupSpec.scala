package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
  private val docs = Seq(
    (0L, base),
    (1L, base),                                    // exact dup of 0
    (2L, base.replace("quick", "swift")),          // near dup of 0
    (3L, "completely different text about spark catalyst optimizer rules and codegen stages"),
    (4L, "another unrelated document mentioning parquet row groups and predicate pushdown")
  ).toDF("doc_id", "text")

  test("exact dedup keeps lowest id per identical text") {
    val out = Dedup.exact(docs, "doc_id", "text")
    assert(canon(out.select("doc_id")).map(_.head).sorted == Seq("0", "2", "3", "4"))
  }

  test("shingles: distinct word n-grams; short docs degrade to whole text") {
    val sh = docs.select(Dedup.shingles(col("text"), 3).as("sh"))
      .select(size(col("sh"))).as[Int].collect()
    assert(sh.forall(_ > 0))
    val short = Seq((9L, "tiny doc")).toDF("doc_id", "text")
      .select(Dedup.shingles(col("text"), 3).as("sh"))
    assert(short.select(expr("sh[0]")).as[String].head() == "tiny doc")
  }

  test("minhash-LSH candidates find exact+near pairs without crossJoin") {
    val cand = Dedup.candidatePairs(Dedup.minhashBands(docs, "doc_id", "text"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((0L, 1L)))   // identical docs always collide
    assert(cand.contains((0L, 2L)) || cand.contains((1L, 2L))) // near dup
  }

  test("jaccard verify: identical=1.0, near-dup high, unrelated low") {
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("ida", "idb")
    val j = Dedup.jaccardVerify(pairs, docs, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(j(1L) == 1.0)
    assert(j(2L) > 0.6 && j(2L) < 1.0)
    assert(j(3L) < 0.1)
  }

  test("nearDedup drops exact+near dups, keeps distinct docs") {
    val kept = Dedup.nearDedup(docs, "doc_id", "text", threshold = 0.6)
      .select("doc_id").as[Long].collect().sorted
    assert(kept sameElements Array(0L, 3L, 4L))
  }

  test("simhash: identical text → same hash; near dup → small hamming") {
    val sh = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(1L))
    assert(java.lang.Long.bitCount(sh(0L) ^ sh(2L)) < 16)
    assert(java.lang.Long.bitCount(sh(0L) ^ sh(3L)) > 16)
  }

  test("simhashPairs: banded candidates catch identical pair with hamming 0") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.get((0L, 1L)).contains(0))
  }

  test("contamination: planted benchmark leak found, clean eval docs pass") {
    import spark.implicits._
    val evalDocs = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (101L, "completely original benchmark question nobody ever copied anywhere")
    ).toDF("eval_id", "text")
    val train = Seq(
      // verbatim leak of eval 100 inside a longer doc
      (1L, "intro text the quick brown fox jumps over the lazy dog near the river bank outro text"),
      (2L, "unrelated training document about databases and query planners"),
      (3L, "the quick brown fox appears here but the rest diverges entirely today")
    ).toDF("train_id", "text")
    val out = Dedup.contamination(train, "train_id", evalDocs, "eval_id",
        "text", shingleSize = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.keySet == Set((1L, 100L)), out.toString)
    assert(out((1L, 100L)) == 1.0) // every eval 3-gram appears in doc 1
    // the df cap drops boilerplate shingles shared by every train doc
    val spam = (10L until 20L).map(i => (i, "of the and common boilerplate of the and"))
      .toDF("train_id", "text")
    val capped = Dedup.contamination(spam, "train_id",
      Seq((200L, "of the and common boilerplate of the and")).toDF("eval_id", "text"),
      "eval_id", "text", shingleSize = 3, threshold = 0.1, maxShingleDf = 5)
    assert(capped.count() == 0)
  }

  test("containmentPairs finds small-in-big dups that Jaccard banding misses") {
    import spark.implicits._
    val small = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val filler = (1 to 90).map(i => s"fill$i").mkString(" ")
    val corpus = Seq(
      (1L, small),                     // 10 tokens → 8 shingles
      (2L, s"$filler $small"),         // small embedded verbatim in 100 tokens
      (3L, "totally different content about planners and join reordering"),
      (4L, small.replace("delta", "DELTA-PRIME")) // near-dup of 1 (not containment 1.0)
    ).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(corpus, "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // the embedded pair: containment 1.0 (every shingle of 1 is in 2)
    assert(pairs((1L, 2L)) == 1.0, pairs.toString)
    // doc 3 pairs with nothing
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
    // ...while Jaccard on the same pair is tiny — nearDedup keeps BOTH 1
    // and 2 (documents the gap containmentPairs exists to close)
    val jaccardKept = Dedup.nearDedup(corpus, "doc_id", "text", threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(jaccardKept.contains(1L) && jaccardKept.contains(2L))
    // df cap: boilerplate shared by many docs doesn't create pairs
    val spam = (10L until 20L).map(i => (i, "common boilerplate header line repeated"))
      .toDF("doc_id", "text")
    assert(Dedup.containmentPairs(spam, "doc_id", "text",
      threshold = 0.5, maxShingleDf = 5).count() == 0)
  }

  test("nearDedupIncremental drops batch docs duplicating the corpus, keeps the rest") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "totally separate content about storage engines and buffers")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // exact dup of 1
      (101L, "alpha beta gamma delta epsilon zeta eta theta iota mu"),    // near-dup of 1
      (102L, "fresh unseen material never part of the corpus before"),
      // batch-internal dup of 102: kept — incremental screens against the
      // CORPUS only; in-batch dedup is nearDedup's job
      (103L, "fresh unseen material never part of the corpus before")
    ).toDF("doc_id", "text")
    val kept = Dedup.nearDedupIncremental(batch, corpus, "doc_id", "text",
        threshold = 0.7, bands = 32)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(102L, 103L))
    // corpus is never filtered, only the batch side returns
    assert(!kept.contains(1L) && !kept.contains(2L))
  }

  test("prefixCandidates: recall 1 on suffix edits, no cross-prefix pairs") {
    val longA = "shared leading prefix well beyond thirty-two characters " + "x" * 40
    val docs = Seq(
      (1L, longA),
      (2L, longA + " appended boilerplate tail"),
      (3L, "a different document altogether with its own opening run"),
      (4L, "A Different Document Altogether with its own opening run")  // case-folds to 3
    ).toDF("doc_id", "text")
    val pairs = Dedup.prefixCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (3L, 4L)))
  }

  test("charShingles + charJaccardPairs: boundary-free near-dups, df cap bounds buckets") {
    // 3-gram sets: shared 6-char prefix, divergent tails
    val docs = Seq(
      (1L, "機器學習模型訓練需要數據"),
      (2L, "機器學習模型訓練需要樣本"),   // differs in last 2 chars → high J
      (3L, "標註規範提高任務表現水平"),   // disjoint
      (4L, "ab")                          // below n → whole-text shingle
    ).toDF("doc_id", "text")
    val sh = docs.select(Dedup.charShingles(col("text"), 3).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(sh(0).length == 10 && sh(0).head == "機器學")
    assert(sh(3) == Seq("ab"))
    val pairs = Dedup.charJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // J(1,2) = 8 shared / (10+10-8) = 0.666667; no other pair qualifies
    assert(pairs == Seq((1L, 2L, 0.666667)))
    // a df cap of 1 kills every shared gram → no pairs at all
    assert(Dedup.charJaccardPairs(docs, "doc_id", "text", 3, 0.1, maxDf = 1).count() == 0L)
  }

  test("editVerify: similarity is 1 - lev/maxlen, threshold filters, nulls safe") {
    val docs = Seq(
      (1L, "abcdefghij"), (2L, "abcdefghiX"),          // lev 1, sim 0.9
      (3L, "abcdefghij"), (4L, "zzzzzzzzzz"),          // lev 10, sim 0.0
      (5L, "short"), (6L, "short plus a long tail appended")) // big relative edit
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("ida", "idb")
    val got = Dedup.editVerify(pairs, docs, "doc_id", "text", minSim = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 2L, 0.9)))
  }

  test("frameClipSpans: gaps split runs, offsets never merge, df cap applies") {
    // video 1: frames 0..19 hashes 100..119; video 2 matches 1's hashes
    // at offset 3 on frames 0..4 and 7..11 (a 2-frame GAP), plus 1's
    // hash 100 again at frame 15 (offset -15+?  100@f15 → 1's f0 →
    // offset 0-15 = -15: its own 1-length island at a DIFFERENT offset)
    val frames = (
      (0L until 20L).map(f => (1L, f, 100L + f)) ++
      (0L until 5L).map(f => (2L, f, 103L + f)) ++    // 1's f3..7 → offset 3
      (7L until 12L).map(f => (2L, f, 103L + f)) ++   // 1's f10..14 → offset 3
      Seq((2L, 15L, 100L))                            // 1's f0 → offset -15
    ).toDF("vid_id", "f", "fhash")
    val spans = Dedup.frameClipSpans(frames, "vid_id", "f", "fhash", minRun = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // runs localized in video 1's coordinates: fa 3..7 and fa 10..14,
    // both at offset 3; the offset −15 singleton misses minRun
    assert(spans == Set((1L, 2L, 3L, 3L, 5L), (1L, 2L, 3L, 10L, 5L)), spans.toString)
    // minRun above both run lengths → nothing
    assert(Dedup.frameClipSpans(frames, "vid_id", "f", "fhash", minRun = 6).isEmpty)
    // a df cap of 1 drops every shared hash → no spans at all
    assert(Dedup.frameClipSpans(frames, "vid_id", "f", "fhash", 2, maxHashDf = 1)
      .isEmpty)
  }
}
