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
}
