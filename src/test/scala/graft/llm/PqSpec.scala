package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization — codebook training, encode, ADC search. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // 4-dim vectors in two clean clusters per 2-dim subspace
  private def corpus() = Seq(
    (0L, Array(0f, 0f, 10f, 10f)),
    (1L, Array(1f, 0f, 9f, 10f)),
    (2L, Array(0f, 1f, 10f, 9f)),
    (3L, Array(10f, 10f, 0f, 0f)),
    (4L, Array(9f, 10f, 1f, 0f)),
    (5L, Array(10f, 9f, 0f, 1f))
  ).toDF("vec_id", "embedding")

  test("trainCodebooks shape and refinement") {
    val b = Pq.trainCodebooks(corpus(), "embedding", "vec_id", m = 2, ksub = 2)
    assert(b.m == 2 && b.ksub == 2 && b.dsub == 2)
    // seeds are vec 0 and vec 1; Lloyd pulls centroid 0 of subspace 0
    // toward the mean of the near-origin cluster
    val c00 = b.cb(0)(0)
    assert(c00(0) < 5f && c00(1) < 5f)
  }

  test("encode assigns near-identical vectors the same codes, ties to lowest code") {
    val b = Pq.trainCodebooks(corpus(), "embedding", "vec_id", m = 2, ksub = 2)
    val codes = corpus().select(col("vec_id"),
      Pq.encode(col("embedding"), b).as("codes")).orderBy("vec_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(codes(0) == codes(1) && codes(1) == codes(2), "cluster A shares codes")
    assert(codes(3) == codes(4) && codes(4) == codes(5), "cluster B shares codes")
    assert(codes(0) != codes(3), "clusters must differ")
  }

  test("ADC ranks the query's own cluster first; rerank returns exact-cosine order") {
    val b = Pq.trainCodebooks(corpus(), "embedding", "vec_id", m = 2, ksub = 2)
    val q = Array(0.5f, 0.5f, 9.5f, 9.5f) // cluster A
    val adc = Pq.adcTopK(corpus(), "embedding", "vec_id", q, 3, b)
      .select("vec_id").as[Long].collect().toSet
    assert(adc == Set(0L, 1L, 2L), s"ADC top-3 should be cluster A: $adc")
    val rr = Pq.adcTopK(corpus(), "embedding", "vec_id", q, 2, b, rerank = 6)
      .collect()
    assert(rr.map(_.getLong(0)).toSet.subsetOf(Set(0L, 1L, 2L)))
    // rerank emits exact cosine, descending
    val cosines = rr.map(_.getDouble(1))
    assert(cosines.sorted.reverse.sameElements(cosines))
  }

  test("IVF-PQ probes only the nearest cells and ranks by ADC inside them") {
    val b = Pq.trainCodebooks(corpus(), "embedding", "vec_id", m = 2, ksub = 2)
    val cents = Similarity.ivfCentroids(corpus(), "embedding", "vec_id", k = 2)
    val idx = Similarity.buildIvfIndex(corpus(), "embedding", cents)
    val q = Array(0.5f, 0.5f, 9.5f, 9.5f) // cluster A
    val got = Pq.ivfAdcTopK(idx, "embedding", "vec_id", q, 3, cents, b, nprobe = 1)
      .select("vec_id").as[Long].collect().toSet
    assert(got == Set(0L, 1L, 2L), s"nprobe=1 should stay in cluster A: $got")
    // nprobe = all cells degenerates to plain ADC
    val all = Pq.ivfAdcTopK(idx, "embedding", "vec_id", q, 6, cents, b, nprobe = 2)
      .select("vec_id").as[Long].collect().toSet
    val plain = Pq.adcTopK(corpus(), "embedding", "vec_id", q, 6, b)
      .select("vec_id").as[Long].collect().toSet
    assert(all == plain)
  }

  test("micro-distance table matches an independent elementwise computation") {
    val b = Pq.trainCodebooks(corpus(), "embedding", "vec_id", m = 2, ksub = 2)
    val q = Array(1f, 2f, 3f, 4f)
    val micro = Pq.queryMicroDists(q, b)
    for (j <- 0 until b.m; c <- 0 until b.ksub) {
      val qs = q.slice(j * b.dsub, (j + 1) * b.dsub).map(_.toDouble)
      val cs = b.cb(j)(c).map(_.toDouble)
      val d2 = qs.zip(cs).map { case (x, y) => (x - y) * (x - y) }.sum
      assert(math.abs(micro(j)(c) - d2 * 1e6) <= 1.0 + d2 * 1e6 * 1e-9,
        s"micro($j)($c)=${micro(j)(c)} vs elementwise ${d2 * 1e6}")
    }
  }
}
