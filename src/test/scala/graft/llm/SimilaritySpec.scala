package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // deterministic little corpus: unit-ish vectors in 8 dims
  private val rnd = new scala.util.Random(7)
  private val vecs: Seq[(Long, Array[Float])] =
    (0L until 50L).map(i => i -> Array.fill(8)(rnd.nextGaussian().toFloat))
  private lazy val embs = vecs.toDF("vec_id", "embedding")

  test("bruteForceTopK: self is its own nearest neighbor with cosine ≈ 1") {
    val q = vecs(5)._2
    val top = Similarity.bruteForceTopK(embs, "embedding", "vec_id", q, 3).collect()
    assert(top.head.getLong(0) == 5L)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-9)
    // descending order
    assert(top.map(_.getDouble(1)).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("bruteForceTopK matches a driver-side exact computation") {
    val q = vecs(0)._2
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.indices.map(i => a(i).toDouble * b(i).toDouble).sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    val expected = vecs.map { case (id, v) => id -> cos(q, v) }
      .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
    val got = Similarity.bruteForceTopK(embs, "embedding", "vec_id", q, 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == expected)
  }

  test("LSH index: query's own bucket contains it; annTopK finds exact match") {
    val planes = Similarity.hyperplanes(numPlanes = 6, dim = 8)
    val index = Similarity.buildLshIndex(embs, "embedding", planes)
    val q = vecs(17)._2
    val top = Similarity.annTopK(index, "embedding", "vec_id", q, 1, planes)
    assert(top.collect().head.getLong(0) == 17L)
  }

  test("multiprobe radius generalizes: radius = H probes every bucket = brute force") {
    val planes = Similarity.hyperplanes(numPlanes = 6, dim = 8)
    val index = Similarity.buildLshIndex(embs, "embedding", planes)
    val q = vecs(9)._2
    val full = Similarity.annTopK(index, "embedding", "vec_id", q, 5, planes,
      multiprobeRadius = 6).select("vec_id").as[Long].collect().toSeq
    val brute = Similarity.bruteForceTopK(embs, "embedding", "vec_id", q, 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(full == brute)
    // radius 3 probes strictly more than radius 1 (no silent truncation)
    val r3 = Similarity.annTopK(index, "embedding", "vec_id", q, 50, planes, 3).count()
    val r1 = Similarity.annTopK(index, "embedding", "vec_id", q, 50, planes, 1).count()
    assert(r3 >= r1)
  }

  test("IVF index: refined centroids, exact match found via nprobe cells") {
    val centroids = Similarity.ivfCentroids(embs, "embedding", "vec_id", k = 4)
    assert(centroids.length == 4 && centroids.forall(_.length == 8))
    val index = Similarity.buildIvfIndex(embs, "embedding", centroids)
    // every vector lands in a valid cell
    assert(index.filter(col("cell") < 0 || col("cell") >= 4).count() == 0)
    // the query's own vector is always found (its cell is probed first)
    val q = vecs(23)._2
    val top = Similarity.ivfTopK(index, "embedding", "vec_id", q, 1, centroids, nprobe = 2)
    assert(top.collect().head.getLong(0) == 23L)
  }

  test("cosineNearDupPairs: duplicated vector found, no self-pairs, no crossJoin") {
    val withDup = (vecs :+ (99L -> vecs(3)._2)).toDF("vec_id", "embedding")
    val planes = Similarity.hyperplanes(numPlanes = 4, dim = 8)
    val pairs = Similarity.cosineNearDupPairs(withDup, "embedding", "vec_id", planes, 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((3L, 99L)))
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("IVF scales in k and dim: k=64 cells over 256-d vectors, O(k) plan") {
    // the round-2 cellOf built a k-deep when-chain over k cosines — O(k²)
    // generated code that logged truncated-plan warnings at k=8 and would
    // not compile at IVF-realistic k. The array_position(array_max) shape
    // must handle k=64 × dim=256 outright.
    val r = new scala.util.Random(11)
    val wide = (0L until 400L).map(i => i -> Array.fill(256)(r.nextGaussian().toFloat))
    val wideDf = wide.toDF("vec_id", "embedding").repartition(4)
    val centroids = Similarity.ivfCentroids(wideDf, "embedding", "vec_id", k = 64)
    assert(centroids.length == 64 && centroids.forall(_.length == 256))
    val index = Similarity.buildIvfIndex(wideDf, "embedding", centroids)
    assert(index.filter(col("cell") < 0 || col("cell") >= 64).count() == 0)
    assert(index.count() == 400)
    val q = wide(7)._2
    val top = Similarity.ivfTopK(index, "embedding", "vec_id", q, 1, centroids, nprobe = 2)
    assert(top.collect().head.getLong(0) == 7L)
  }

  test("IVF recall@10 on clustered data (the workload IVF is for)") {
    // 8 tight clusters — real embedding spaces cluster; IVF's contract is
    // high recall at small nprobe on such data
    val r = new scala.util.Random(13)
    val centers = Array.fill(8)(Array.fill(16)(r.nextGaussian()))
    val pts = (0L until 400L).map { i =>
      val c = centers((i % 8).toInt)
      i -> c.map(x => (x + r.nextGaussian() * 0.05).toFloat)
    }
    val df = pts.toDF("vec_id", "embedding")
    val q = pts(100)._2
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.indices.map(i => a(i).toDouble * b(i).toDouble).sum
      dot / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
             math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
    }
    val exact = pts.map { case (id, v) => id -> cos(q, v) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    val centroids = Similarity.ivfCentroids(df, "embedding", "vec_id", k = 8)
    val index = Similarity.buildIvfIndex(df, "embedding", centroids)
    val got = Similarity.ivfTopK(index, "embedding", "vec_id", q, 10, centroids, nprobe = 2)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact intersect got).size / 10.0
    assert(recall >= 0.9, s"IVF recall@10 = $recall on clustered data")
  }

  test("quantizedTopK: wide candidate pool converges to brute force; self found") {
    val q = vecs(5)._2
    // candidates = corpus size → re-rank sees everything → exact result
    val exact = Similarity.bruteForceTopK(embs, "embedding", "vec_id", q, 5)
      .select("vec_id").as[Long].collect().toSeq
    val quant = Similarity.quantizedTopK(embs, "embedding", "vec_id", q,
        k = 5, candidates = 50)
      .select("vec_id").as[Long].collect().toSeq
    assert(quant == exact)
    assert(quant.head == 5L) // the query vector itself ranks first
    // a narrow pool still returns k rows and stays deterministic
    val narrow = Similarity.quantizedTopK(embs, "embedding", "vec_id", q,
        k = 3, candidates = 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(narrow.length == 3 && narrow.head == 5L)
    val again = Similarity.quantizedTopK(
        embs.repartition(7), "embedding", "vec_id", q, k = 3, candidates = 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(narrow == again)
  }

  test("binaryTopK: sign-word Hamming shortlist matches a driver replay; wide pool converges to brute force") {
    val q = vecs(5)._2
    // driver ground truth: Hamming = sign disagreements, ties by id,
    // then exact cosine over the shortlist
    def bits(a: Array[Float]): Seq[Boolean] = a.map(_ > 0f).toSeq
    val qb = bits(q)
    val shortlist = vecs
      .map { case (id, v) => (id, bits(v).zip(qb).count(p => p._1 != p._2), v) }
      .sortBy(t => (t._2, t._1)).take(10).map(_._1).toSet
    val coarse = Similarity.binaryTopK(embs, "embedding", "vec_id", q,
      k = 10, candidates = 10).collect().map(_.getLong(0)).toSet
    assert(coarse.subsetOf(shortlist),
      s"re-ranked top-k must come from the Hamming shortlist: $coarse vs $shortlist")
    // with the candidate pool covering the corpus, binary == brute force
    val wide = Similarity.binaryTopK(embs, "embedding", "vec_id", q,
      k = 5, candidates = 50).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val brute = Similarity.bruteForceTopK(embs, "embedding", "vec_id", q, 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(wide.toSeq == brute.toSeq, s"wide pool must equal brute: ${wide.toSeq} vs ${brute.toSeq}")
    // zero-norm vectors are excluded, not ranked
    val withZero = (vecs :+ (99L -> Array.fill(8)(0f))).toDF("vec_id", "embedding")
    assert(!Similarity.binaryTopK(withZero, "embedding", "vec_id", q, 50, 51)
      .collect().map(_.getLong(0)).contains(99L))
  }

  test("degenerate zero-norm vectors land in cell -1, never crash the build") {
    val withZero = (vecs :+ (999L -> Array.fill(8)(0f))).toDF("vec_id", "embedding")
    val centroids = Similarity.ivfCentroids(withZero, "embedding", "vec_id", k = 4)
    assert(centroids.length == 4)
    val index = Similarity.buildIvfIndex(withZero, "embedding", centroids)
    assert(index.filter(col("vec_id") === 999L).select("cell").head().getInt(0) == -1)
    // probes never include -1, so the degenerate row is indexed but unsearched
    val q = vecs(3)._2
    val top = Similarity.ivfTopK(index, "embedding", "vec_id", q, 1, centroids, nprobe = 4)
    assert(top.collect().head.getLong(0) == 3L)
  }

  test("autoPlanes sizing rule and maxBucket cap bound candidate volume") {
    // sizing: buckets ≈ N / target, monotone in N, floored at minPlanes
    assert(Similarity.autoPlanes(500L, 1024L) == 8)
    assert(Similarity.autoPlanes(1L << 20, 1024L) == 10)
    assert(Similarity.autoPlanes(1L << 30, 1024L) == 20)
    assert(Similarity.autoPlanes(Long.MaxValue, 1L) == 62)

    // degenerate skew: 60 byte-identical vectors all share one bucket; the
    // cap must bound the in-bucket self-join instead of going quadratic
    val base = Array.fill(8)(0.5f)
    val skewed = ((0L until 60L).map(i => i -> base) ++
      (60L until 80L).map(i => i -> Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val planes = Similarity.hyperplanes(numPlanes = 4, dim = 8)
    val stats = Similarity.bucketStats(Similarity.buildLshIndex(skewed, "embedding", planes))
    assert(stats.agg(max("n")).head().getLong(0) >= 60L) // the skew is real
    val capped = Similarity.cosineNearDupPairs(skewed, "embedding", "vec_id",
      planes, 0.999, maxBucket = 10)
    // ≤ C(10,2) pairs from the degenerate bucket instead of C(60,2)=1770
    assert(capped.count() <= 45L + 20L)
    // uncapped keeps everything (correctness default unchanged)
    val full = Similarity.cosineNearDupPairs(skewed, "embedding", "vec_id", planes, 0.999)
    assert(full.count() >= 1770L)
  }

  test("hardNegatives: same-label vectors never surface, nearest negative wins") {
    // label 0: anchor at e1 plus a decoy ON e1 (cos 1.0, must be excluded);
    // label 1: two negatives, one almost parallel, one orthogonal
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),   // anchor
      (1L, Array(1f, 0f, 0f, 0f), 0),   // same label — excluded
      (2L, Array(0.9f, 0.1f, 0f, 0f), 1),
      (3L, Array(0f, 1f, 0f, 0f), 1),
      (4L, Array(0f, 0f, 1f, 0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val anchors = Seq((0L, Array(1f, 0f, 0f, 0f), 0))
    val got = Similarity.hardNegatives(vecs, "embedding", "vec_id", "label", anchors, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(_._2) == Seq(2L, 3L), s"got $got") // decoy 1L absent, nearest first
    assert(got.head._3 > 0.99 && got(1)._3 == 0.0)
  }

  test("labelCentroidDrift: aligned label → cosine 1, opposed label → -1") {
    // two labels pointing opposite ways; global centroid = (0.5-0.5)/2 axis
    val vecs = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(1f, 0f), 0), (2L, Array(1f, 0f), 0),
      (3L, Array(-1f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.labelCentroidDrift(vecs, "embedding", "label")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(0) == ((3L, 1.0, 1.0)))   // centroid (1,0), global (0.5,0): aligned
    assert(got(1) == ((1L, 1.0, -1.0)))  // centroid (-1,0): opposed
  }
}
