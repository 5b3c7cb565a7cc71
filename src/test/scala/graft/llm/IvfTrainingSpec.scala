package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** trainIvfCentroids — the real IVF index-build path (sampled k-means++
  * + full-corpus Lloyd steps). The corpus is 16 well-separated Gaussian
  * blobs with ids arranged so the 16 LOWEST ids all sit inside ONE blob:
  * the adversarial case for ivfCentroids' lowest-id seeding (all seeds in
  * one cluster) and a non-event for k-means++.
  */
class IvfTrainingSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val nBlobs = 16
  private val perBlob = 40

  private lazy val (docs, blobOf): (DataFrame, Map[Long, Int]) = {
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(nBlobs)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val rows = for {
      b <- 0 until nBlobs
      j <- 0 until perBlob
    } yield {
      val v = centers(b).map(x => x + (rnd.nextGaussian() * 0.05).toFloat)
      // blob 0 owns ids 0..39 — so the k lowest ids are ONE blob
      ((b * perBlob + j).toLong, v)
    }
    (rows.toDF("vec_id", "embedding"),
     rows.map { case (id, _) => id -> (id / perBlob).toInt }.toMap)
  }

  private def recallAt10(centroids: Array[Array[Float]], query: Array[Float]): Double = {
    val brute = Similarity.bruteForceTopK(docs, "embedding", "vec_id", query, 10)
      .select("vec_id").as[Long].collect().toSet
    val got = Similarity.ivfTopK(
        Similarity.buildIvfIndex(docs, "embedding", centroids),
        "embedding", "vec_id", query, 10, centroids, nprobe = 2)
      .select("vec_id").as[Long].collect().toSet
    brute.intersect(got).size / 10.0
  }

  test("training is deterministic for a fixed seed") {
    val a = Similarity.trainIvfCentroids(docs, "embedding", "vec_id", k = 8, lloydIters = 1)
    val b = Similarity.trainIvfCentroids(docs, "embedding", "vec_id", k = 8, lloydIters = 1)
    assert(a.length == 8 && a.zip(b).forall { case (x, y) => x.sameElements(y) })
  }

  test("k-means++ training beats lowest-id seeding on clustered data") {
    // a query deep inside blob 7 — its true top-10 are blob-7 members
    val query = docs.filter($"vec_id" === (7L * perBlob + 3))
      .select("embedding").head().getSeq[Float](0).toArray
    val trained = Similarity.trainIvfCentroids(docs, "embedding", "vec_id",
      k = nBlobs, lloydIters = 2)
    val toy = Similarity.ivfCentroids(docs, "embedding", "vec_id", k = nBlobs)
    val rTrained = recallAt10(trained, query)
    val rToy = recallAt10(toy, query)
    assert(rTrained >= rToy, s"trained $rTrained < lowest-id $rToy")
    assert(rTrained >= 0.9, s"trained recall@10 only $rTrained on separable blobs")
  }

  test("trained cells actually partition the blobs (no mega-cell)") {
    val trained = Similarity.trainIvfCentroids(docs, "embedding", "vec_id",
      k = nBlobs, lloydIters = 2)
    val sizes = Similarity.buildIvfIndex(docs, "embedding", trained)
      .groupBy("cell").count().select("count").as[Long].collect()
    // 640 vectors over 16 cells: no cell may swallow half the corpus —
    // the failure mode of degenerate seeding that kills nprobe pruning
    assert(sizes.max <= perBlob * 4, s"mega-cell of ${sizes.max} vectors")
  }
}
