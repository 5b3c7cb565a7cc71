package graft.llm

import graft.SparkSpec
import java.nio.file.Files

class IvfIndexStoreSpec extends SparkSpec {
  import spark.implicits._

  // 8 tight clusters (the workload IVF is for), split into a base corpus
  // and a later-arriving batch
  private val r = new scala.util.Random(29)
  private val centers = Array.fill(8)(Array.fill(16)(r.nextGaussian()))
  private val pts = (0L until 400L).map { i =>
    val c = centers((i % 8).toInt)
    i -> c.map(x => (x + r.nextGaussian() * 0.05).toFloat)
  }
  private lazy val full = pts.toDF("vec_id", "embedding")
  private lazy val base = pts.filter(_._1 < 300L).toDF("vec_id", "embedding")
  private lazy val late = pts.filter(_._1 >= 300L).toDF("vec_id", "embedding")

  private def freshRoot(): String =
    Files.createTempDirectory("ivf-store").toString + "/idx"

  test("incrementally-built store answers exactly like a one-shot index") {
    val centroids = Similarity.ivfCentroids(full, "embedding", "vec_id", k = 8)
    val ivf = new IvfIndexStore(spark, freshRoot(), "embedding", "vec_id", centroids)
    val cellsBase = ivf.append(base)
    val cellsLate = ivf.append(late)
    // append reports only the cells the batch touched
    assert(cellsLate.toSet subsetOf cellsBase.toSet)
    assert(ivf.read.get.count() == 400)

    // with frozen centroids, append-then-probe ≡ build-then-probe: the
    // maintenance path changes WHERE rows live, never the answer
    val oneShot = Similarity.buildIvfIndex(full, "embedding", centroids)
    for (qid <- Seq(5L, 150L, 399L)) {
      val q = pts(qid.toInt)._2
      val got = ivf.topK(q, 10, nprobe = 2)
        .select("vec_id").as[Long].collect().toSet
      val want = Similarity.ivfTopK(oneShot, "embedding", "vec_id", q, 10,
          centroids, nprobe = 2)
        .select("vec_id").as[Long].collect().toSet
      assert(got == want, s"probe mismatch for query $qid")
    }
  }

  test("probe reads only the probed cells; segment budget compacts") {
    val centroids = Similarity.ivfCentroids(full, "embedding", "vec_id", k = 8)
    val ivf = new IvfIndexStore(spark, freshRoot(), "embedding", "vec_id", centroids)
    // 4 appends with a 2-segment budget → compaction keeps amplification bounded
    pts.grouped(100).foreach { g =>
      ivf.append(g.toDF("vec_id", "embedding"), maxSegments = 2)
    }
    assert(ivf.liveSegments <= 2)
    assert(ivf.read.get.count() == 400)
    // every probed row belongs to one of the nprobe nearest cells — the
    // partition-pruned read never surfaces other cells' vectors
    val q = pts(42)._2
    val nearest = centroids.indices
      .sortBy(c => -Similarity.cosArr(q, centroids(c))).take(2).toSet
    val probedCells = ivf.topK(q, 400, nprobe = 2)
      .join(ivf.read.get, "vec_id").select("cell").as[Int].collect().toSet
    assert(probedCells subsetOf nearest)
  }

  test("upsertEmbeddings: a moved vector leaves no stale row in its old cell") {
    val centroids = Similarity.ivfCentroids(full, "embedding", "vec_id", k = 8)
    val ivf = new IvfIndexStore(spark, freshRoot(), "embedding", "vec_id", centroids)
    ivf.append(full)
    val moverId = 7L
    val oldCell = ivf.read.get.filter($"vec_id" === moverId)
      .select("cell").as[Int].head()
    // re-embed the id AT another cluster's center → it must change cells
    val newCell = (oldCell + 1) % 8
    val movedVec = centers(newCell).map(_.toFloat)
    ivf.upsertEmbeddings(Seq(moverId -> movedVec).toDF("vec_id", "embedding"))
    val rows = ivf.read.get.filter($"vec_id" === moverId)
      .select("cell").as[Int].collect().toSeq
    assert(rows.length == 1, s"id $moverId appears in cells $rows — stale twin survived")
    assert(rows.head != oldCell, "vector did not move cells (test fixture broken)")
    assert(ivf.read.get.count() == 400)

    // delete: the id disappears and an emptied cell cannot resurrect rows
    ivf.delete(Seq(moverId).toDF("vec_id"))
    assert(ivf.read.get.filter($"vec_id" === moverId).isEmpty)
    assert(ivf.read.get.count() == 399)
    // deleting ids not in the index is a no-op
    assert(ivf.delete(Seq(99999L).toDF("vec_id")).isEmpty)
  }

  test("upsertEmbeddings is ONE atomic commit: no manifest version ever lacks the ids") {
    val root = freshRoot()
    val centroids = Similarity.ivfCentroids(full, "embedding", "vec_id", k = 8)
    val ivf = new IvfIndexStore(spark, root, "embedding", "vec_id", centroids)
    ivf.append(full)
    // a ManifestStore over the same root sees the same on-disk state —
    // the test's time-travel window into every committed version
    val man = new graft.pipeline.ManifestStore(spark, root, "cell")
    val vBefore = man.manifestVersions
    // re-embed two ids at other clusters' centers (both must move cells)
    val movers = Seq(3L -> centers(5).map(_.toFloat), 11L -> centers(6).map(_.toFloat))
    ivf.upsertEmbeddings(movers.toDF("vec_id", "embedding"), maxSegments = 64)
    val vAfter = man.manifestVersions
    // exactly ONE new manifest: the delete-then-append double commit —
    // whose between-commits window left the ids absent — is gone
    assert(vAfter.size == vBefore.size + 1,
      s"expected one commit, saw versions $vBefore -> $vAfter")
    // EVERY committed version resolves all 400 ids: there is no state,
    // crash-reachable or reader-visible, where the batch's ids are
    // missing. A writer dying before the rename leaves vBefore's state;
    // after it, vAfter's — both replayed complete here (manifest-pinned
    // resolve: each segment filtered to the values still pointing at it,
    // exactly ManifestStore.resolve's contract).
    def idsAt(v: Int): Set[Long] = {
      val m = man.readManifest(v)
      m.groupBy(_._2).map { case (seg, entries) =>
        spark.read.parquet(s"$root/$seg")
          .filter($"cell".cast("string").isin(entries.keys.toSeq: _*))
          .select("vec_id").as[Long].collect().toSet
      }.foldLeft(Set.empty[Long])(_ ++ _)
    }
    for (v <- vAfter)
      assert(idsAt(v) == pts.map(_._1).toSet, s"manifest m=$v is missing ids")
    assert(ivf.read.get.count() == 400)
    val cells = ivf.read.get.filter($"vec_id".isin(3L, 11L))
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    assert(cells(3L) == 5 && cells(11L) == 6, s"movers did not land in target cells: $cells")
    // and the ids are in exactly one cell each (no stale twin)
    assert(ivf.read.get.groupBy("vec_id").count().filter($"count" > 1).isEmpty)
  }

  test("id index: same answers, probe scan replaced by the bucket-pruned equi-join") {
    val centroids = Similarity.ivfCentroids(full, "embedding", "vec_id", k = 8)
    def build(root: String, withIdx: Boolean) = {
      val s = new IvfIndexStore(spark, root, "embedding", "vec_id", centroids, idIndex = withIdx)
      s.append(base); s.append(late); s
    }
    val plain = build(freshRoot(), withIdx = false)
    val fast = build(freshRoot(), withIdx = true)
    // identical mutation sequence on both stores
    val movers = Seq(3L -> centers(5).map(_.toFloat), 11L -> centers(6).map(_.toFloat))
    plain.upsertEmbeddings(movers.toDF("vec_id", "embedding"))
    fast.upsertEmbeddings(movers.toDF("vec_id", "embedding"))
    plain.delete(Seq(42L).toDF("vec_id"))
    fast.delete(Seq(42L).toDF("vec_id"))
    // the main indexes agree row for row
    val a = plain.read.get.select("vec_id", "cell").as[(Long, Int)].collect().toSet
    val b = fast.read.get.select("vec_id", "cell").as[(Long, Int)].collect().toSet
    assert(a == b, "id-indexed store diverged from the probe-scan store")
    assert(fast.read.get.count() == 399)

    // probe-scan ELIMINATION: the cell-resolution frame's file scans
    // touch only the __ids secondary store, never the main segments
    val probe = fast.cellProbeFrame(Seq(3L, 11L).toDF("vec_id")).get
    val scanned = probe.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            f.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
    }.flatten
    assert(scanned.nonEmpty && scanned.forall(_.contains("/__ids/")),
      s"cell resolution read outside the secondary index: $scanned")
    // and the secondary index resolves the cells the main index holds
    val cells = probe.as[String].collect().toSet
    val want = fast.read.get.filter($"vec_id".isin(3L, 11L))
      .select($"cell".cast("string")).as[String].collect().toSet
    assert(want subsetOf cells, s"index cells $cells must cover live cells $want")
  }

  test("id index enabled over a pre-existing store falls back to the probe scan") {
    val root = freshRoot()
    val centroids = Similarity.ivfCentroids(full, "embedding", "vec_id", k = 8)
    new IvfIndexStore(spark, root, "embedding", "vec_id", centroids).append(full)
    // reopen WITH the index flag: no secondary store exists yet — cell
    // resolution must not silently under-probe
    val reopened = new IvfIndexStore(spark, root, "embedding", "vec_id", centroids,
      idIndex = true)
    val moverId = 7L
    val oldCell = reopened.read.get.filter($"vec_id" === moverId)
      .select("cell").as[Int].head()
    val movedVec = centers((oldCell + 1) % 8).map(_.toFloat)
    reopened.upsertEmbeddings(Seq(moverId -> movedVec).toDF("vec_id", "embedding"))
    val rows = reopened.read.get.filter($"vec_id" === moverId)
      .select("cell").as[Int].collect().toSeq
    assert(rows.length == 1 && rows.head != oldCell,
      s"fallback probe missed the old cell: $rows")
  }
}
