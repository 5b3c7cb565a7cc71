package graft.llm

import graft.SparkSpec
import java.nio.file.Files
import scala.util.Random

/** Model-based property test for the merge-on-read IVF store: a random
  * interleaving of upsert (fresh ids, re-embeds that move cells,
  * re-deliveries) and delete against a trivial in-memory id→embedding
  * map — after every mutation the reconciled index must hold EXACTLY
  * the model's live vectors (no ghosts at vacated residences, no
  * losses), and a probe must equal the frozen-centroid recompute over
  * the model. */
class IvfMorIndexStorePropertySpec extends SparkSpec {
  import spark.implicits._

  test("random upsert/delete sequences: index always equals the reference model") {
    val rnd = new Random(4242)
    val dim = 8
    val centers = Array.fill(6)(Array.fill(dim)(rnd.nextGaussian()))
    def vec(seedId: Long, rev: Int): Array[Float] = {
      val r = new Random(seedId * 31 + rev)
      val c = centers(((seedId + rev) % 6).toInt) // rev moves the vector across cells
      c.map(x => (x + r.nextGaussian() * 0.05).toFloat)
    }
    val centroids = Similarity.ivfCentroids(
      (0L until 60L).map(i => i -> vec(i, 0)).toDF("vec_id", "embedding"),
      "embedding", "vec_id", k = 6)

    val root = Files.createTempDirectory("ivf-mor-prop").toString + "/idx"
    val ivf = new IvfMorIndexStore(spark, root, "embedding", "vec_id", centroids)
    var model = Map.empty[Long, Array[Float]]
    var rev = Map.empty[Long, Int]

    def check(tag: String): Unit = {
      val got = ivf.read.map(_.select("vec_id", "embedding")
        .as[(Long, Array[Float])].collect().toSeq).getOrElse(Seq.empty)
      assert(got.map(_._1).distinct.size == got.size, s"$tag: duplicate ids (ghosts)")
      val gm = got.map { case (id, e) => id -> e.toSeq }.toMap
      val mm = model.map { case (id, e) => id -> e.toSeq }
      assert(gm == mm, s"$tag: index ≠ model " +
        s"(extra=${(gm.keySet -- mm.keySet).toSeq.sorted.take(5)}, " +
        s"missing=${(mm.keySet -- gm.keySet).toSeq.sorted.take(5)})")
    }

    for (step <- 0 until 14) {
      rnd.nextInt(3) match {
        case 0 | 1 => // upsert: a mix of fresh ids, moved re-embeds, re-deliveries
          val ids = (0 until (3 + rnd.nextInt(8))).map(_ => rnd.nextInt(60).toLong).distinct
          val rows = ids.map { id =>
            val r = rnd.nextInt(3) match {
              case 0 => rev.getOrElse(id, 0)      // re-delivery of the current rev
              case _ => rev.getOrElse(id, 0) + 1  // re-embed (likely moves cells)
            }
            rev += id -> r
            id -> vec(id, r)
          }
          rows.foreach { case (id, e) => model += id -> e }
          ivf.upsert(rows.toDF("vec_id", "embedding"))
        case 2 if model.nonEmpty => // takedown
          val victims = model.keys.toSeq.sorted
            .filter(_ => rnd.nextBoolean()).take(4)
          if (victims.nonEmpty) {
            model --= victims
            ivf.delete(victims.toDF("vec_id"))
          }
        case _ => ()
      }
      check(s"step $step")
    }

    // final probe equality vs the frozen-centroid recompute over the model
    if (model.nonEmpty) {
      val q = model.values.head
      val modelDf = model.toSeq.map { case (id, e) => (id, e) }.toDF("vec_id", "embedding")
      val want = Similarity.ivfTopK(
          Similarity.buildIvfIndex(modelDf, "embedding", centroids),
          "embedding", "vec_id", q, 5, centroids, nprobe = 3)
        .select("vec_id").as[Long].collect().toSeq
      val got = ivf.topK(q, 5, nprobe = 3).select("vec_id").as[Long].collect().toSeq
      assert(got == want, s"probe ≠ recompute: $got vs $want")
    }
  }
}
