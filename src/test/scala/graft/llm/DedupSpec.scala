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
}
