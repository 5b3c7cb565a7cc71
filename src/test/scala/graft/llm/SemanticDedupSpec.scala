package graft.llm

import graft.SparkSpec

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  test("identical-vector groups collapse to min-id survivors; orthogonal vectors stay singletons") {
    val a = Array(1f, 0f, 0f, 0f)
    val b = Array(0f, 1f, 0f, 0f)
    val c = Array(0f, 0f, 1f, 0f)
    val embs = Seq(
      1L -> a, 5L -> a, 9L -> a, // triple → cluster 1, survivor 1
      2L -> b, 7L -> b,          // pair → cluster 2, survivor 2
      3L -> c)                   // singleton → kept
      .toDF("vec_id", "embedding")
    val r = Similarity.semanticDedup(embs, "embedding", "vec_id",
        dim = 4, threshold = 0.95, targetBucketSize = 4L)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getBoolean(2)))).toMap
    assert(r == Map(
      1L -> ((1L, true)), 5L -> ((1L, false)), 9L -> ((1L, false)),
      2L -> ((2L, true)), 7L -> ((2L, false)),
      3L -> ((3L, true))))
  }

  test("near-but-not-duplicate vectors below the threshold are not merged") {
    // cosine( (1,0), (1,0.5) ) = 1/sqrt(1.25) ≈ 0.894 < 0.95
    val embs = Seq(
      1L -> Array(1f, 0f, 0f, 0f),
      2L -> Array(1f, 0.5f, 0f, 0f))
      .toDF("vec_id", "embedding")
    val r = Similarity.semanticDedup(embs, "embedding", "vec_id",
        dim = 4, threshold = 0.95, targetBucketSize = 4L)
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(r == Map(1L -> true, 2L -> true))
  }

  test("above-threshold near-duplicates merge even when not bit-identical") {
    // cosine( (1,0), (1,0.1) ) = 1/sqrt(1.01) ≈ 0.995 ≥ 0.95; same LSH
    // bucket under any plane set (signs agree except on a measure-zero
    // hyperplane band for the tiny perturbation — seeded planes, so
    // deterministic here)
    val embs = Seq(
      1L -> Array(1f, 0f, 0f, 0f),
      4L -> Array(1f, 0.1f, 0f, 0f),
      8L -> Array(0f, 0f, 0f, 1f))
      .toDF("vec_id", "embedding")
    val r = Similarity.semanticDedup(embs, "embedding", "vec_id",
        dim = 4, threshold = 0.95, targetBucketSize = 4L)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getBoolean(2)))).toMap
    assert(r(1L) == ((1L, true)) && r(4L) == ((1L, false)) && r(8L) == ((8L, true)))
  }
}
