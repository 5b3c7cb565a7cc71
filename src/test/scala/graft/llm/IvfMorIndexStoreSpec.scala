package graft.llm

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The merge-on-read IVF store must answer EXACTLY like the one-shot
  * index (and the CoW store) under every maintenance sequence, while
  * appending O(batch) bytes per tick instead of rewriting touched
  * cells. */
class IvfMorIndexStoreSpec extends SparkSpec {
  import spark.implicits._

  private val r = new scala.util.Random(31)
  private val centers = Array.fill(8)(Array.fill(16)(r.nextGaussian()))
  private val pts = (0L until 400L).map { i =>
    val c = centers((i % 8).toInt)
    i -> c.map(x => (x + r.nextGaussian() * 0.05).toFloat)
  }
  private lazy val full = pts.toDF("vec_id", "embedding")
  private lazy val centroids =
    Similarity.ivfCentroids(full, "embedding", "vec_id", k = 8)

  private def freshRoot(): String =
    Files.createTempDirectory("ivf-mor").toString + "/idx"

  private def probeSet(ivf: IvfMorIndexStore, q: Array[Float]): Set[Long] =
    ivf.topK(q, 10, nprobe = 2).select("vec_id").as[Long].collect().toSet

  test("upsert-built store answers exactly like a one-shot index") {
    val ivf = new IvfMorIndexStore(spark, freshRoot(), "embedding", "vec_id", centroids)
    pts.grouped(150).foreach(g => ivf.upsert(g.toDF("vec_id", "embedding")))
    assert(ivf.read.get.count() == 400)
    val oneShot = Similarity.buildIvfIndex(full, "embedding", centroids)
    for (qid <- Seq(5L, 150L, 399L)) {
      val q = pts(qid.toInt)._2
      val want = Similarity.ivfTopK(oneShot, "embedding", "vec_id", q, 10,
        centroids, nprobe = 2).select("vec_id").as[Long].collect().toSet
      assert(probeSet(ivf, q) == want, s"probe mismatch for query $qid")
    }
  }

  test("re-embed that moves cells evicts the old residence (no ghosts) — ≡ CoW store") {
    val root = freshRoot()
    val ivf = new IvfMorIndexStore(spark, root, "embedding", "vec_id", centroids)
    ivf.upsert(full)
    // negate every %10==3 vector — most flip cells
    val mutated = full.filter(pmod(col("vec_id"), lit(10)) === 3)
      .withColumn("embedding", transform(col("embedding"), x => -x))
    ivf.upsert(mutated)
    val cow = new IvfIndexStore(spark, freshRoot(), "embedding", "vec_id",
      centroids, idIndex = true)
    cow.append(full)
    cow.upsertEmbeddings(mutated)
    // full state equality: (id, embedding) sets identical
    assertSameRows(ivf.read.get.select("vec_id", "cell"),
      cow.read.get.select("vec_id", "cell"))
    assert(ivf.read.get.count() == 400) // no ghost duplicates
    for (qid <- Seq(3L, 13L, 42L)) {
      val q = pts(qid.toInt)._2
      assert(probeSet(ivf, q) ==
        cow.topK(q, 10, nprobe = 2).select("vec_id").as[Long].collect().toSet)
    }
  }

  test("delete removes every residence; re-upsert restores; replay converges") {
    val ivf = new IvfMorIndexStore(spark, freshRoot(), "embedding", "vec_id", centroids)
    ivf.upsert(full)
    val victims = full.filter(col("vec_id") < 20).select("vec_id")
    ivf.delete(victims)
    assert(ivf.read.get.count() == 380)
    assert(ivf.read.get.filter(col("vec_id") < 20).count() == 0)
    // re-upsert after delete resurrects (removal is not a ban)
    ivf.upsert(full.filter(col("vec_id") < 20))
    assert(ivf.read.get.count() == 400)
    // replaying the same upsert reconciles to the identical state
    val before = canon(ivf.read.get.select("vec_id", "cell"))
    ivf.upsert(full.filter(col("vec_id") < 20))
    assert(canon(ivf.read.get.select("vec_id", "cell")) == before)
  }

  test("topKAdc parity: the MOR store's PQ probe equals the CoW store's after a mutation") {
    val books = Pq.trainCodebooks(full, "embedding", "vec_id", m = 4, ksub = 16)
    val morIvf = new IvfMorIndexStore(spark, freshRoot(), "embedding", "vec_id",
      centroids, books = Some(books))
    val cow = new IvfIndexStore(spark, freshRoot(), "embedding", "vec_id",
      centroids, idIndex = true, books = Some(books))
    morIvf.upsert(full); cow.append(full)
    val mutated = full.filter(pmod(col("vec_id"), lit(10)) === 3)
      .withColumn("embedding", transform(col("embedding"), x => -x))
    morIvf.upsert(mutated); cow.upsertEmbeddings(mutated)
    for (qid <- Seq(7L, 123L)) {
      val q = pts(qid.toInt)._2
      val a = morIvf.topKAdc(q, 10, nprobe = 3).collect().map(r => (r.getLong(0), r.getLong(1)))
      val b = cow.topKAdc(q, 10, nprobe = 3).collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(a.toSeq == b.toSeq, s"ADC probe mismatch for query $qid")
      // rerank path too
      val ar = morIvf.topKAdc(q, 5, nprobe = 3, rerank = 20)
        .select("vec_id").as[Long].collect().toSeq
      val br = cow.topKAdc(q, 5, nprobe = 3, rerank = 20)
        .select("vec_id").as[Long].collect().toSeq
      assert(ar == br)
    }
  }

  test("write amplification: a re-embed tick's GROSS bytes written, MOR vs CoW") {
    // exact gross parquet bytes via task output metrics — dir-size
    // deltas can't see bytes that compaction/vacuum reclaimed
    val written = new java.util.concurrent.atomic.AtomicLong()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          { written.addAndGet(te.taskMetrics.outputMetrics.bytesWritten); () }
    }
    val morIvf = new IvfMorIndexStore(spark, freshRoot(), "embedding", "vec_id", centroids)
    val cow = new IvfIndexStore(spark, freshRoot(), "embedding", "vec_id",
      centroids, idIndex = true)
    morIvf.upsert(full); cow.append(full)
    val mutated = full.filter(pmod(col("vec_id"), lit(10)) === 7)
      .withColumn("embedding", transform(col("embedding"), x => -x))
      .localCheckpoint(false)
    spark.sparkContext.addSparkListener(l)
    val (morBytes, cowBytes) = try {
      written.set(0); morIvf.upsert(mutated); Thread.sleep(300)
      val m = written.get()
      written.set(0); cow.upsertEmbeddings(mutated); Thread.sleep(300)
      (m, written.get())
    } finally spark.sparkContext.removeSparkListener(l)
    info(s"10% hash-spread re-embed tick: MOR wrote $morBytes B, CoW wrote $cowBytes B " +
      f"(${cowBytes.toDouble / morBytes}%.1fx)")
    // the batch scatters across essentially every cell, so the CoW path
    // rewrites most of the index while MOR appends the batch — the gap
    // is the entire reason the MOR variant exists
    assert(morBytes > 0 && cowBytes > morBytes * 2,
      s"expected CoW ≫ MOR gross writes, got cow=$cowBytes mor=$morBytes")
  }

  test("write amplification GROWS with index size at fixed batch — one measured decade") {
    // the r14 claim was 'the gap grows linearly with index size'; hold
    // it in CI with a 400 → 4000 decade at the identical 40-vector
    // batch (R15SoakMain extends the ladder to 20k for the addendum).
    // CoW is O(touched cells' bytes) ≈ O(index) under a hash-spread
    // batch; MOR is O(batch) — the ratio must grow roughly with the
    // index factor. Assert ≥3x growth for a 10x index: generous slack
    // for fixed per-commit overheads, impossible for any O(batch) CoW.
    val (_, mor400, cow400) = graft.R15SoakMain.measureTick(spark, 400)
    val (_, mor4k, cow4k) = graft.R15SoakMain.measureTick(spark, 4000)
    val r400 = cow400.toDouble / mor400; val r4k = cow4k.toDouble / mor4k
    info(f"40-vector tick: 400-index ratio $r400%.1fx, 4000-index ratio $r4k%.1fx")
    assert(r4k > r400 * 3,
      f"expected the MOR advantage to grow ~linearly with index size, got $r400%.1fx -> $r4k%.1fx")
  }

  test("a hash-spread re-embed tick appends O(batch) bytes — never rewrites the index") {
    def dirBytes(p: java.io.File): Long =
      if (p.isFile) p.length
      else Option(p.listFiles).map(_.map(dirBytes).sum).getOrElse(0L)
    val root = freshRoot()
    val ivf = new IvfMorIndexStore(spark, root, "embedding", "vec_id", centroids)
    ivf.upsert(full)
    val before = dirBytes(new java.io.File(root))
    // 40 vectors re-embedded, scattered across essentially every cell —
    // the CoW store would rewrite all touched cells' merged slices here
    val mutated = full.filter(pmod(col("vec_id"), lit(10)) === 7)
      .withColumn("embedding", transform(col("embedding"), x => -x))
    ivf.upsert(mutated)
    val delta = dirBytes(new java.io.File(root)) - before
    assert(delta > 0 && delta < before / 2,
      s"tick appended $delta bytes against $before of prior state — not O(batch)")
  }

  test("ingestNearDup: same-cell screen matches a driver recompute; replay converges") {
    val root = freshRoot()
    val ivf = new IvfMorIndexStore(spark, root, "embedding", "vec_id", centroids)
    val corpus = full.filter(col("vec_id") % 5 =!= 0)
    ivf.upsert(corpus)
    // batch: novel rows + exact copies of three corpus vectors
    val copies = full.filter(col("vec_id").isin(1L, 2L, 3L))
      .withColumn("vec_id", col("vec_id") + 1000L)
    val batch = full.filter(col("vec_id") % 10 === 0).unionByName(copies)
      .localCheckpoint(false)
    val tau = 0.999
    val admitted = ivf.ingestNearDup(batch, tau)
      .select("vec_id").as[Long].collect().toSet
    // independent driver recompute: same-cell exact cosine vs the corpus
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0 || nb == 0) -2.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    def cellOfArr(v: Array[Float]): Int =
      centroids.indices.maxBy(c => cos(v, centroids(c)))
    val stored = corpus.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .map { case (id, v) => (id, v, cellOfArr(v)) }
    val want = batch.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .filter { case (id, v) =>
        val c = cellOfArr(v)
        !stored.exists { case (sid, sv, sc) => sc == c && sid != id && cos(v, sv) >= tau }
      }.map(_._1).toSet
    assert(admitted == want, s"admitted ${admitted.size}, expected ${want.size}")
    assert(!admitted.contains(1001L) && !admitted.contains(1002L),
      "exact copies of stored vectors must be rejected")
    assert(admitted.nonEmpty, "novel vectors must be admitted")
    val n1 = ivf.read.get.count()
    // replay: the re-delivered batch's rows now match their own stored
    // twins only through the id-inequality — identical admission, no
    // duplicate state
    val again = ivf.ingestNearDup(batch, tau).select("vec_id").as[Long].collect().toSet
    assert(again == admitted && ivf.read.get.count() == n1)
  }

  test("ingestNearDupWithMatches: rejects name the SMALLEST same-cell neighbor; screen = the matches' anti-join") {
    val root = freshRoot()
    val ivf = new IvfMorIndexStore(spark, root, "embedding", "vec_id", centroids)
    val corpus = full.filter(col("vec_id") % 5 =!= 0)
    ivf.upsert(corpus)
    // exact copies of three corpus vectors (must be rejected, each
    // attributed to its stored twin) + novel rows
    val copies = full.filter(col("vec_id").isin(1L, 2L, 3L))
      .withColumn("vec_id", col("vec_id") + 1000L)
    val batch = full.filter(col("vec_id") % 10 === 0).unionByName(copies)
      .localCheckpoint(false)
    val tau = 0.999
    val (admitted, matches) = ivf.ingestNearDupWithMatches(batch, tau)
    val got = matches.select("vec_id", "match_id").as[(Long, Long)].collect().toMap
    // independent driver recompute: for every batch row, the SMALLEST
    // same-cell stored id at cosine >= tau (id-inequality exempts a
    // re-delivered row's own stored twin)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0 || nb == 0) -2.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    def cellOfArr(v: Array[Float]): Int =
      centroids.indices.maxBy(c => cos(v, centroids(c)))
    val stored = corpus.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .map { case (id, v) => (id, v, cellOfArr(v)) }
    val want = batch.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .flatMap { case (id, v) =>
        val c = cellOfArr(v)
        val ns = stored.filter { case (sid, sv, sc) =>
          sc == c && sid != id && cos(v, sv) >= tau }.map(_._1)
        if (ns.isEmpty) None else Some(id -> ns.min)
      }.toMap
    assert(got == want, s"matches $got, expected $want")
    assert(got.contains(1001L) && got(1001L) == 1L,
      "the planted copy must be attributed to its stored twin")
    assert(got.nonEmpty && got.size < batch.count(),
      "matches must be non-vacuous and a proper subset")
    // the admitted side is exactly the batch minus the matched ids —
    // ONE probe pass fed both relations
    val admittedIds = admitted.select("vec_id").as[Long].collect().toSet
    val batchIds = batch.select("vec_id").as[Long].collect().toSet
    assert(admittedIds == batchIds -- got.keySet)
    // and the store state equals the unattributed path's
    val root2 = freshRoot()
    val ivf2 = new IvfMorIndexStore(spark, root2, "embedding", "vec_id", centroids)
    ivf2.upsert(corpus)
    ivf2.ingestNearDup(batch, tau)
    assertSameRows(ivf.read.get.drop("cell"), ivf2.read.get.drop("cell"))
  }

  test("ingestNearDup replay contract: within-batch mutual dups re-screen, store converges") {
    // two exact copies in ONE batch: the within-batch exemption admits
    // both on first delivery; on replay each screens against its
    // now-stored twin — neither re-appends, the store is unchanged.
    // This is the documented at-least-once + downstream-id-dedup
    // contract, pinned so it can't silently drift.
    val ivf = new IvfMorIndexStore(spark, freshRoot(), "embedding", "vec_id", centroids)
    ivf.upsert(full.filter(col("vec_id") < 100L))
    val v = pts(200)._2
    val twins = Seq(9001L -> v, 9002L -> v, 9003L -> pts(300)._2)
      .toDF("vec_id", "embedding")
    val first = ivf.ingestNearDup(twins, 0.999).select("vec_id").as[Long].collect().toSet
    assert(first == Set(9001L, 9002L, 9003L), s"first delivery admits all, got $first")
    val n1 = ivf.read.get.count()
    val replay = ivf.ingestNearDup(twins, 0.999).select("vec_id").as[Long].collect().toSet
    assert(replay == Set(9003L), s"replayed twins must screen each other out, got $replay")
    assert(ivf.read.get.count() == n1, "replay must not change store state")
  }

  // ── centroid retrain migration ──────────────────────────────────────

  private lazy val centroids4 =
    Similarity.ivfCentroids(full, "embedding", "vec_id", k = 4)

  private def hPath(root: String, name: String) =
    new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(root), name)
  private def hFs(root: String) = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def putMarker(root: String, name: String, content: String): Unit = {
    val out = hFs(root).create(hPath(root, name), true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  test("retrain migrates every residence; the result equals a fresh build under the new centroids") {
    val root = freshRoot()
    val ivf = new IvfMorIndexStore(spark, root, "embedding", "vec_id", centroids)
    pts.grouped(150).foreach(g => ivf.upsert(g.toDF("vec_id", "embedding")))
    val migrated = ivf.retrain(centroids4)
    val state = migrated.read.get
    assert(state.count() == 400, "migration must not lose or duplicate residences")
    // every row sits in its cell under the NEW centroids
    assert(state.filter(Similarity.cellOf(col("embedding"), centroids4)
      =!= col("cell")).count() == 0)
    val oneShot = Similarity.buildIvfIndex(full, "embedding", centroids4)
    for (qid <- Seq(5L, 150L, 399L)) {
      val q = pts(qid.toInt)._2
      val want = Similarity.ivfTopK(oneShot, "embedding", "vec_id", q, 10,
        centroids4, nprobe = 2).select("vec_id").as[Long].collect().toSet
      val got = migrated.topK(q, 10, nprobe = 2)
        .select("vec_id").as[Long].collect().toSet
      assert(got == want, s"post-retrain probe mismatch for query $qid")
    }
    // the old handle is dead: its stamp check fails on next use
    intercept[IllegalStateException] { ivf.topK(pts(5)._2, 5) }
  }

  test("retrain preserves PQ codes: ADC probes answer like a fresh PQ build") {
    val books = Pq.trainCodebooks(full, "embedding", "vec_id", m = 4, ksub = 8)
    val root = freshRoot()
    val ivf = new IvfMorIndexStore(spark, root, "embedding", "vec_id",
      centroids, Some(books))
    ivf.upsert(full)
    val migrated = ivf.retrain(centroids4)
    val fresh = new IvfMorIndexStore(spark, freshRoot(), "embedding", "vec_id",
      centroids4, Some(books))
    fresh.upsert(full)
    for (qid <- Seq(7L, 123L, 390L)) {
      val q = pts(qid.toInt)._2
      val a = migrated.topKAdc(q, 10, nprobe = 2).collect().map(_.toSeq).toSeq
      val b = fresh.topKAdc(q, 10, nprobe = 2).collect().map(_.toSeq).toSeq
      assert(a == b, s"ADC probe diverged after retrain for query $qid")
    }
  }

  test("opening a stamped store under different centroids refuses") {
    val root = freshRoot()
    val ivf = new IvfMorIndexStore(spark, root, "embedding", "vec_id", centroids)
    ivf.upsert(full)
    val wrong = new IvfMorIndexStore(spark, root, "embedding", "vec_id", centroids4)
    val e = intercept[IllegalStateException] { wrong.read }
    assert(e.getMessage.contains("centroid"))
  }

  test("crash interleavings: intent blocks every op; re-running retrain recovers at any point") {
    val root = freshRoot()
    val ivf = new IvfMorIndexStore(spark, root, "embedding", "vec_id", centroids)
    ivf.upsert(full)
    val targetFp = IvfMorIndexStore.centroidFingerprint(centroids4)
    val oneShot = Similarity.buildIvfIndex(full, "embedding", centroids4)
    def assertConverged(m: IvfMorIndexStore): Unit = {
      assert(m.read.get.count() == 400)
      val q = pts(42)._2
      val want = Similarity.ivfTopK(oneShot, "embedding", "vec_id", q, 10,
        centroids4, nprobe = 2).select("vec_id").as[Long].collect().toSet
      assert(m.topK(q, 10, nprobe = 2).select("vec_id").as[Long].collect().toSet == want)
    }

    // crash point 1: intent written, pass never ran. Every op on a fresh
    // handle refuses; a retrain toward a DIFFERENT target refuses; the
    // intended retrain recovers.
    putMarker(root, "_retrain_intent", targetFp)
    val h1 = new IvfMorIndexStore(spark, root, "embedding", "vec_id", centroids)
    intercept[IllegalStateException] { h1.read }
    intercept[IllegalStateException] { h1.upsert(full.limit(1)) }
    intercept[IllegalArgumentException] {
      h1.retrain(Array(Array.fill(16)(1f)))
    }
    val recovered = h1.retrain(centroids4)
    assertConverged(recovered)
    assert(!hFs(root).exists(hPath(root, "_retrain_intent")))

    // crash point 2: the data commit landed but the stamp never flipped
    // (stamp=old, intent=target, cells already migrated). The recovery
    // pass finds nothing to move and still finalizes the stamp.
    putMarker(root, "_centroids",
      IvfMorIndexStore.centroidFingerprint(centroids))
    putMarker(root, "_retrain_intent", targetFp)
    val h2 = new IvfMorIndexStore(spark, root, "embedding", "vec_id", centroids)
    intercept[IllegalStateException] { h2.read }
    assertConverged(h2.retrain(centroids4))
    assert(!hFs(root).exists(hPath(root, "_retrain_intent")))

    // crash point 3: stamp flipped, intent not yet cleared — still
    // blocked until the (now no-op) retrain clears it.
    putMarker(root, "_retrain_intent", targetFp)
    val h3 = new IvfMorIndexStore(spark, root, "embedding", "vec_id", centroids4)
    intercept[IllegalStateException] { h3.read }
    assertConverged(h3.retrain(centroids4))
  }

  // ── PQ codebook retrain + re-encode migration ──────────────────────

  private lazy val books0 =
    Pq.trainCodebooks(full, "embedding", "vec_id", m = 4, ksub = 8)
  // trained on a shifted corpus slice — the embedding-model-revision
  // stand-in: genuinely different codebooks over the same vectors
  private lazy val books1 = Pq.trainCodebooks(
    full.filter(col("vec_id") >= 50), "embedding", "vec_id", m = 4, ksub = 8)

  private def adcSet(h: IvfMorIndexStore, q: Array[Float]): Seq[Seq[Any]] =
    h.topKAdc(q, 10, nprobe = 2).collect().toSeq.map(_.toSeq)

  test("retrainBooks re-encodes every code word: ADC ≡ fresh build; recall audited before/after") {
    val root = freshRoot()
    val ivf = new IvfMorIndexStore(spark, root, "embedding", "vec_id",
      centroids, Some(books0))
    ivf.upsert(full)
    def recallAt10(h: IvfMorIndexStore, qid: Int): Double = {
      val q = pts(qid)._2
      val exact = Similarity.bruteForceTopK(full, "embedding", "vec_id", q, 10)
        .select("vec_id").as[Long].collect().toSet
      val adc = h.topKAdc(q, 10, nprobe = 8).select("vec_id").as[Long].collect().toSet
      exact.intersect(adc).size / 10.0
    }
    val before = Seq(7, 123, 390).map(recallAt10(ivf, _))
    val oldCodes = canon(ivf.read.get.select(col("vec_id"),
      col("pq_codes").cast("string")))
    val migrated = ivf.retrainBooks(books1)
    val after = Seq(7, 123, 390).map(recallAt10(migrated, _))
    // the audit numbers are measurable on both sides of the migration
    // (this fixture's ADC-L2 vs cosine-exact recall is legitimately
    // low — the audit's job is to MEASURE it, the corruption detector
    // is the fresh-build equivalence below)
    assert(before.forall(r => r >= 0.0 && r <= 1.0), s"pre-migration recall $before")
    assert(after.forall(r => r >= 0.0 && r <= 1.0), s"post-migration recall $after")
    // the code column really was rewritten — different books, different words
    val newCodes = canon(migrated.read.get.select(col("vec_id"),
      col("pq_codes").cast("string")))
    assert(oldCodes != newCodes, "retrainBooks must re-encode, not carry stale codes")
    // byte-equivalence: ADC under the migrated store ≡ a from-scratch
    // build under the new books
    val fresh = new IvfMorIndexStore(spark, freshRoot(), "embedding", "vec_id",
      centroids, Some(books1))
    fresh.upsert(full)
    for (qid <- Seq(7L, 123L, 390L)) {
      val q = pts(qid.toInt)._2
      assert(adcSet(migrated, q) == adcSet(fresh, q),
        s"ADC diverged from a fresh build after retrainBooks for query $qid")
    }
    // exact-vector probes are untouched by a code rewrite
    assert(probeSet(migrated, pts(5)._2) == probeSet(fresh, pts(5)._2))
    // the receiver handle is dead (stamp now carries the new books)
    intercept[IllegalStateException] { ivf.read }
  }

  test("retrainBooks adopts a books-less store; opening under wrong books refuses") {
    val root = freshRoot()
    val ivf = new IvfMorIndexStore(spark, root, "embedding", "vec_id", centroids)
    ivf.upsert(full)
    intercept[IllegalStateException] { ivf.topKAdc(pts(5)._2, 10) }
    val migrated = ivf.retrainBooks(books1)
    val fresh = new IvfMorIndexStore(spark, freshRoot(), "embedding", "vec_id",
      centroids, Some(books1))
    fresh.upsert(full)
    assert(adcSet(migrated, pts(7)._2) == adcSet(fresh, pts(7)._2))
    // a handle claiming DIFFERENT books refuses the stamped store
    val wrong = new IvfMorIndexStore(spark, root, "embedding", "vec_id",
      centroids, Some(books0))
    val e = intercept[IllegalStateException] { wrong.read }
    assert(e.getMessage.contains("retrainBooks"))
  }

  test("retrainBooks crash interleavings: intent blocks every op; re-running recovers") {
    val root = freshRoot()
    val ivf = new IvfMorIndexStore(spark, root, "embedding", "vec_id",
      centroids, Some(books0))
    ivf.upsert(full)
    val targetFp = IvfMorIndexStore.stampOf(centroids, Some(books1))
    val freshB1 = new IvfMorIndexStore(spark, freshRoot(), "embedding", "vec_id",
      centroids, Some(books1))
    freshB1.upsert(full)
    def assertConverged(m: IvfMorIndexStore): Unit = {
      assert(m.read.get.count() == 400)
      assert(adcSet(m, pts(42)._2) == adcSet(freshB1, pts(42)._2))
    }

    // crash point 1: intent written, re-encode never ran — every op on
    // a fresh handle refuses; a migration toward a DIFFERENT target
    // refuses; the intended one recovers
    putMarker(root, "_retrain_intent", targetFp)
    val h1 = new IvfMorIndexStore(spark, root, "embedding", "vec_id",
      centroids, Some(books0))
    intercept[IllegalStateException] { h1.read }
    intercept[IllegalStateException] { h1.upsert(full.limit(1)) }
    intercept[IllegalArgumentException] { h1.retrainBooks(books0) }
    intercept[IllegalArgumentException] { h1.retrain(centroids4) }
    assertConverged(h1.retrainBooks(books1))
    assert(!hFs(root).exists(hPath(root, "_retrain_intent")))

    // crash point 2: snapshot committed but the stamp never flipped
    // (stamp=old books, intent=target, codes already rewritten) — the
    // recovery pass re-encodes idempotently and finalizes the stamp
    putMarker(root, "_centroids", IvfMorIndexStore.stampOf(centroids, Some(books0)))
    putMarker(root, "_retrain_intent", targetFp)
    val h2 = new IvfMorIndexStore(spark, root, "embedding", "vec_id",
      centroids, Some(books0))
    intercept[IllegalStateException] { h2.read }
    assertConverged(h2.retrainBooks(books1))
    assert(!hFs(root).exists(hPath(root, "_retrain_intent")))

    // crash point 3: stamp flipped, intent not yet cleared — blocked
    // until the (now no-op) retrainBooks clears it
    putMarker(root, "_retrain_intent", targetFp)
    val h3 = new IvfMorIndexStore(spark, root, "embedding", "vec_id",
      centroids, Some(books1))
    intercept[IllegalStateException] { h3.read }
    assertConverged(h3.retrainBooks(books1))
    assert(!hFs(root).exists(hPath(root, "_retrain_intent")))
  }

  test("open follows the persisted layout pointer; versions advance per migration") {
    val books = Pq.trainCodebooks(full, "embedding", "vec_id", m = 4, ksub = 8)
    val root = freshRoot()
    val ivf = new IvfMorIndexStore(spark, root, "embedding", "vec_id",
      centroids, Some(books))
    ivf.upsert(full)
    assert(IvfMorIndexStore.currentVersion(spark, root).contains(1))
    // a pointer-opened handle carries the IDENTICAL geometry: exact
    // probes AND ADC (codebook float bits survive the text round-trip)
    val reopened = IvfMorIndexStore.open(spark, root, "embedding", "vec_id")
    for (qid <- Seq(5L, 150L, 399L)) {
      val q = pts(qid.toInt)._2
      assert(probeSet(reopened, q) == probeSet(ivf, q))
      assert(reopened.topKAdc(q, 10, nprobe = 2).collect().map(_.toSeq).toSeq ==
        ivf.topKAdc(q, 10, nprobe = 2).collect().map(_.toSeq).toSeq)
    }
    // a retrain through the REOPENED handle advances the pointer...
    val migrated = reopened.retrain(centroids4)
    assert(IvfMorIndexStore.currentVersion(spark, root).contains(2))
    // ...and a fresh open now answers under the NEW geometry
    val after = IvfMorIndexStore.open(spark, root, "embedding", "vec_id")
    val q = pts(7)._2
    assert(probeSet(after, q) == probeSet(migrated, q))
    // retrainBooks bumps it again
    val books2 = Pq.trainCodebooks(full.filter(col("vec_id") % 2 === 0),
      "embedding", "vec_id", m = 4, ksub = 8)
    after.retrainBooks(books2)
    assert(IvfMorIndexStore.currentVersion(spark, root).contains(3))
  }

  test("a captured handle FAILS LOUDLY at its next op after a pointer-side retrain") {
    // the r16 VERDICT gap: a draining door's admit hook captured the
    // handle, a mid-drain retrain returned a NEW handle, and the
    // captured one kept screening under stale centroids. Per-op stamp
    // verification makes that structurally impossible now.
    val root = freshRoot()
    val captured = new IvfMorIndexStore(spark, root, "embedding", "vec_id", centroids)
    captured.upsert(full.filter(col("vec_id") < 200))
    // a different handle (the reopen-per-tick path) retrains the store
    IvfMorIndexStore.open(spark, root, "embedding", "vec_id").retrain(centroids4)
    // the captured handle's NEXT tick refuses — never stale-gates
    val batch = full.filter(col("vec_id") >= 200 && col("vec_id") < 210)
    val e = intercept[IllegalStateException] { captured.ingestNearDup(batch, 0.95) }
    assert(e.getMessage.contains("stamped layout"))
    intercept[IllegalStateException] { captured.topK(pts(5)._2, 5) }
  }

  // the legacy TWO-FILE pointer format (`ivfl1` layout + separate
  // `_layout_v`), for reconstructing pre-ivfl2 stores on disk
  private def legacyLayout(cs: Array[Array[Float]]): String = {
    val t = IvfMorIndexStore.serializeLayout(cs, None, 999)
    val lines = t.linesIterator.toArray
    val h = lines.head.split(" ")
    lines(0) = ("ivfl1" +: h.drop(2)).mkString(" ")
    lines.mkString("\n")
  }
  private def markerText(root: String, name: String): String = {
    val in = hFs(root).open(hPath(root, name))
    try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
  }

  test("layout version is ATOMIC with the geometry — the legacy torn window recovers with exactly one bump") {
    // r17 ADVICE (medium): layout and version were two separate marker
    // writes; a crash between them during retrain let the recovery
    // re-run see 'layout text already current' and skip the bump, so
    // currentVersion reported the OLD version under the NEW geometry
    // forever. The version now rides in the _layout header (ivfl2, one
    // atomic write); legacy stores upgrade via the stamp: a layout
    // whose geometry the stamp does NOT yet name is a mid-migration
    // publish whose bump never landed.
    val root = freshRoot()
    val ivf = new IvfMorIndexStore(spark, root, "embedding", "vec_id", centroids)
    ivf.upsert(full)
    assert(IvfMorIndexStore.currentVersion(spark, root).contains(1))
    // reconstruct the EXACT legacy torn state: ivfl1 layout of the NEW
    // geometry on disk, stale _layout_v never bumped, stamp still the
    // OLD geometry, intent pending
    val targetFp = IvfMorIndexStore.centroidFingerprint(centroids4)
    putMarker(root, "_layout", legacyLayout(centroids4))
    putMarker(root, "_layout_v", "1")
    putMarker(root, "_retrain_intent", targetFp)
    // recovery re-runs the retrain: same geometry, but the stamp proves
    // the publish never completed — the version advances EXACTLY once
    new IvfMorIndexStore(spark, root, "embedding", "vec_id", centroids)
      .retrain(centroids4)
    assert(IvfMorIndexStore.currentVersion(spark, root).contains(2))
    assert(!hFs(root).exists(hPath(root, "_layout_v")),
      "upgrade must fold the version into the atomic pointer")
    assert(IvfMorIndexStore.layoutVersionOf(markerText(root, "_layout")).contains(2))
    // a SECOND recovery re-run (crash after publish, before the intent
    // cleared) is a completed publish — no double bump
    putMarker(root, "_retrain_intent", targetFp)
    new IvfMorIndexStore(spark, root, "embedding", "vec_id", centroids4)
      .retrain(centroids4)
    assert(IvfMorIndexStore.currentVersion(spark, root).contains(2))
    // and the migrated store answers like a fresh build
    val after = IvfMorIndexStore.open(spark, root, "embedding", "vec_id")
    val oneShot = Similarity.buildIvfIndex(full, "embedding", centroids4)
    val q = pts(42)._2
    val want = Similarity.ivfTopK(oneShot, "embedding", "vec_id", q, 10,
      centroids4, nprobe = 2).select("vec_id").as[Long].collect().toSet
    assert(after.topK(q, 10, nprobe = 2).select("vec_id").as[Long].collect().toSet == want)
  }

  test("first-init crash between layout and stamp: recovery completes at version 1, never double-bumps") {
    val root = freshRoot()
    new IvfMorIndexStore(spark, root, "embedding", "vec_id", centroids)
      .upsert(full.limit(20))
    // simulate: layout landed, the stamp write crashed
    hFs(root).delete(hPath(root, "_centroids"), false)
    intercept[IllegalStateException] { // open refuses the half-initialized store
      IvfMorIndexStore.open(spark, root, "embedding", "vec_id")
    }
    // re-running the original construction adopts: same geometry → the
    // already-atomic v1 publish stands, only the stamp lands
    val h = new IvfMorIndexStore(spark, root, "embedding", "vec_id", centroids)
    h.upsert(full.filter(col("vec_id") >= 20 && col("vec_id") < 40))
    assert(IvfMorIndexStore.currentVersion(spark, root).contains(1))
    assert(IvfMorIndexStore.open(spark, root, "embedding", "vec_id")
      .read.get.count() == 40)
  }

  test("legacy two-file pointer still reads; the next completed migration upgrades it atomically") {
    val root = freshRoot()
    val ivf = new IvfMorIndexStore(spark, root, "embedding", "vec_id", centroids)
    ivf.upsert(full)
    // rewrite the pointer in the legacy format (a store from before ivfl2)
    putMarker(root, "_layout", legacyLayout(centroids))
    putMarker(root, "_layout_v", "5")
    assert(IvfMorIndexStore.currentVersion(spark, root).contains(5))
    val h = IvfMorIndexStore.open(spark, root, "embedding", "vec_id")
    h.retrain(centroids4)
    assert(IvfMorIndexStore.currentVersion(spark, root).contains(6))
    assert(IvfMorIndexStore.layoutVersionOf(markerText(root, "_layout")).contains(6))
    assert(!hFs(root).exists(hPath(root, "_layout_v")))
  }

  // ── pinned handles × out-of-band retrains ──────────────────────────
  // hand 2-D geometry (the CurationFunnelSpec divergence fixture):
  // u at 0°, v at +10°, w at −10°; cos(u,v) = cos(u,w) ≈ 0.985 ≥ 0.95.
  // Under [0°, 12°, −12°] the three sit in THREE cells; under [0°]
  // everything shares one cell.
  private def deg(a: Double) = Array(math.cos(math.toRadians(a)).toFloat,
    math.sin(math.toRadians(a)).toFloat)
  private lazy val cents3 = Array(deg(0), deg(12), deg(-12))
  private lazy val cents1 = Array(deg(0))

  test("pinned handle: an out-of-band retrain mid-tick neither stalls nor crashes; gating stays pinned, writes self-heal") {
    val root = freshRoot()
    new IvfMorIndexStore(spark, root, "embedding", "vec_id", cents3)
      .upsert(Seq((100L, deg(0))).toDF("vec_id", "embedding"))
    // ORDERING 1: the retrain completes BETWEEN the pinned tick's ops
    val tick = IvfMorIndexStore.openPinned(spark, root, "embedding", "vec_id")
    val a1 = tick.ingestNearDup(Seq((201L, deg(10))).toDF("vec_id", "embedding"), 0.95)
    assert(a1.count() == 1, "v is cross-cell from u under the pinned 3-cell geometry")
    // a separate retrainer flips the layout mid-tick (k=1: one cell)
    IvfMorIndexStore.open(spark, root, "embedding", "vec_id").retrain(cents1)
    assert(IvfMorIndexStore.currentVersion(spark, root).contains(2))
    // the pinned tick's NEXT op: an unpinned handle would throw here —
    // the pinned one keeps gating under its pinned geometry, so w
    // (cell 2 under the pinned cells, where nothing resides) ADMITS
    val a2 = tick.ingestNearDup(Seq((202L, deg(-10))).toDF("vec_id", "embedding"), 0.95)
    assert(a2.count() == 1, "the tick must complete under its PINNED geometry")
    // ...and the commit-time re-verification healed the write: every
    // row (the racing w included) resides in its CURRENT-geometry cell
    val state = IvfMorIndexStore.open(spark, root, "embedding", "vec_id")
      .read.get.select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(state == Map(100L -> 0, 201L -> 0, 202L -> 0),
      s"writes must self-heal to the flipped layout, got $state")
    // the NEXT tick's reopen gates under the new geometry: a twin of w
    // now sees u/v/w same-cell and is rejected
    val next = IvfMorIndexStore.openPinned(spark, root, "embedding", "vec_id")
    val a3 = next.ingestNearDup(Seq((203L, deg(-10))).toDF("vec_id", "embedding"), 0.95)
    assert(a3.isEmpty, "the next reopen must gate under the new geometry")

    // ORDERING 2: the retrain completes BEFORE the pinned tick's first op
    val root2 = freshRoot()
    new IvfMorIndexStore(spark, root2, "embedding", "vec_id", cents3)
      .upsert(Seq((100L, deg(0))).toDF("vec_id", "embedding"))
    val tick2 = IvfMorIndexStore.openPinned(spark, root2, "embedding", "vec_id")
    IvfMorIndexStore.open(spark, root2, "embedding", "vec_id").retrain(cents1)
    val b1 = tick2.ingestNearDup(Seq((202L, deg(-10))).toDF("vec_id", "embedding"), 0.95)
    assert(b1.count() == 1, "pinned gating holds even when the flip preceded the first op")
    val state2 = IvfMorIndexStore.open(spark, root2, "embedding", "vec_id")
      .read.get.select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(state2 == Map(100L -> 0, 202L -> 0))
  }

  test("a commit under a PENDING retrain intent defers to the post-flip catch-up; recovery migrates it") {
    val root = freshRoot()
    new IvfMorIndexStore(spark, root, "embedding", "vec_id", cents3)
      .upsert(Seq((100L, deg(0))).toDF("vec_id", "embedding"))
    val tick = IvfMorIndexStore.openPinned(spark, root, "embedding", "vec_id")
    // a retrainer wrote its intent and is mid-pass (simulated)
    putMarker(root, "_retrain_intent", IvfMorIndexStore.stampOf(cents1, None))
    // the pinned tick does NOT stall on the intent: it commits under
    // its pinned cells and defers healing to the retrain's catch-up
    val a = tick.ingestNearDup(Seq((202L, deg(-10))).toDF("vec_id", "embedding"), 0.95)
    assert(a.count() == 1)
    // raw state right now: w under its PINNED cell
    val rawCells = new IvfMorIndexStore(spark, root, "embedding", "vec_id",
      cents3, pinned = true).read.get
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rawCells(202L) == 2, s"mid-pass commit lands under the pinned geometry: $rawCells")
    // the retrainer completes (recovery semantics: same target) — its
    // post-flip catch-up pass migrates the racing commit
    new IvfMorIndexStore(spark, root, "embedding", "vec_id", cents3).retrain(cents1)
    val healed = IvfMorIndexStore.open(spark, root, "embedding", "vec_id")
      .read.get.select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(healed == Map(100L -> 0, 202L -> 0),
      s"the catch-up must migrate rows committed mid-pass, got $healed")
  }

  test("retrainer crash AFTER the flip: a racing commit self-heals despite the pending intent; recovery completes") {
    // the hardened leg: if the writer's defer depended on the
    // retrainer surviving past its stamp flip, a retrainer dying
    // between the flip and its catch-up would strand the commit
    // mis-resident forever. The writer instead heals ITSELF whenever
    // it observes a flipped stamp — parsing the current layout
    // directly, since open() refuses while the intent clears.
    val root = freshRoot()
    new IvfMorIndexStore(spark, root, "embedding", "vec_id", cents3)
      .upsert(Seq((100L, deg(0)), (101L, deg(10))).toDF("vec_id", "embedding"))
    val tick = IvfMorIndexStore.openPinned(spark, root, "embedding", "vec_id")
    // simulate: a retrainer published layout + stamp, then DIED before
    // its catch-up pass and intent clear (rows NOT yet migrated)
    val target = IvfMorIndexStore.stampOf(cents1, None)
    putMarker(root, "_retrain_intent", target)
    putMarker(root, "_layout", IvfMorIndexStore.serializeLayout(cents1, None, 2))
    putMarker(root, "_centroids", target)
    // the pinned tick commits under its pinned cells, observes the
    // flipped stamp, and self-heals under the PARSED layout — even
    // though the intent is still pending
    val a = tick.ingestNearDup(Seq((202L, deg(-10))).toDF("vec_id", "embedding"), 0.95)
    assert(a.count() == 1)
    val raw = new IvfMorIndexStore(spark, root, "embedding", "vec_id",
        cents1, None, pinned = true)
      .read.get.select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(raw(202L) == 0, s"the racing commit must self-heal to the new cell: $raw")
    assert(raw(101L) == 1, "pre-crash rows await the recovery, not the writer")
    // recovery re-runs the interrupted retrain (idempotent passes) and
    // finishes the migration + intent clear
    new IvfMorIndexStore(spark, root, "embedding", "vec_id", cents3).retrain(cents1)
    val healed = IvfMorIndexStore.open(spark, root, "embedding", "vec_id")
      .read.get.select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(healed == Map(100L -> 0, 101L -> 0, 202L -> 0), s"got $healed")
    assert(IvfMorIndexStore.currentVersion(spark, root).contains(2))
    assert(!hFs(root).exists(hPath(root, "_retrain_intent")))
  }

  test("expire: stale ANN admissions re-admit, live still screen, stamps survive retrain + GC") {
    val root = freshRoot()
    // pairwise-DISTINCT corpus (seeded 16-dim gaussians: cosine ≥ 0.95
    // by chance is negligible) — the clustered `full` fixture would
    // make generations mutual near-dups and mask the expiry effect
    val rr = new scala.util.Random(53)
    val iso = (0L until 400L).map(i => i -> Array.fill(16)(rr.nextGaussian().toFloat))
      .toDF("vec_id", "embedding").localCheckpoint(false)
    val ivf = new IvfMorIndexStore(spark, root, "embedding", "vec_id", centroids)
    val gen1 = iso.filter(col("vec_id") < 200L).localCheckpoint(false)
    val gen2 = iso.filter(col("vec_id") >= 200L).localCheckpoint(false)
    ivf.upsert(gen1, adm = 1L)
    ivf.upsert(gen2, adm = 2L)
    def copies(src: org.apache.spark.sql.DataFrame) =
      src.select((col("vec_id") + 9000L).as("vec_id"), col("embedding"))
    // exact copies screen against both generations before expiry (a
    // copy shares its source's cell under ANY centroid set, cosine 1.0)
    assert(ivf.ingestNearDup(copies(gen1), 0.95, adm = 2L).isEmpty)
    assert(ivf.ingestNearDup(copies(gen2), 0.95, adm = 2L).isEmpty)
    assert(ivf.expire(2L) == 200L, "gen-1's 200 admissions expire")
    // expired near-dups RE-ADMIT; the live generation still screens;
    // re-running expire is a no-op
    assert(ivf.ingestNearDup(copies(gen1.limit(30)), 0.95, adm = 3L).count() == 30)
    assert(ivf.ingestNearDup(copies(gen2.limit(30)), 0.95, adm = 3L).isEmpty)
    assert(ivf.expire(2L) == 0L)
    // admission stamps SURVIVE a retrain (the migration re-appends full
    // rows): after moving every residence to a 4-cell geometry, the
    // sliding window still distinguishes gen-2 (adm 2) from the adm-3
    // re-admissions
    val k4 = Similarity.ivfCentroids(iso, "embedding", "vec_id", k = 4)
    val migrated = ivf.retrain(k4)
    assert(migrated.expire(3L) == 200L, "gen-2 expires through the NEW geometry")
    assert(migrated.ingestNearDup(copies(gen2.limit(10)), 0.95, adm = 4L).count() == 10,
      "gen-2 copies re-admit after their window slid out")
    // GC reclaims tombstones; reads unchanged — probe under FRESH ids
    // (re-probing the 9000-shifted ids would be a same-id re-delivery,
    // which the exemption admits by design)
    migrated.gcTombstones()
    assert(migrated.ingestNearDup(
        gen1.limit(30).select((col("vec_id") + 18000L).as("vec_id"),
          col("embedding")), 0.95, adm = 4L).isEmpty,
      "the adm-3 re-admissions still screen after GC")
    val (cellSegs, idSegs) = migrated.segmentCounts
    assert(cellSegs == 1 && idSegs == 1, s"post-GC fan-in ($cellSegs, $idSegs)")
    // ...and GC swept the door-write markers (a door that never
    // retrains must not accumulate one marker file per commit forever)
    val wd = hPath(root, "_writes")
    assert(!hFs(root).exists(wd) || hFs(root).listStatus(wd).isEmpty,
      "gcTombstones must sweep the write markers")
    // pre-stamp rows never expire: adopt a store written without stamps
    val legacy = new IvfMorIndexStore(spark, freshRoot(), "embedding", "vec_id", centroids)
    legacy.upsert(gen1) // adm defaults to 0
    assert(legacy.expire(0L) == 0L)
  }

  test("uncontended retrain SKIPS the catch-up pass; a mid-window commit forces it") {
    // quiet path: no door commit between the main pass's read and the
    // flip — the marker sets match and the second O(index) pass is
    // skipped (two directory listings), state still fully migrated
    val root = freshRoot()
    new IvfMorIndexStore(spark, root, "embedding", "vec_id", cents3)
      .upsert(Seq((100L, deg(0)), (101L, deg(10))).toDF("vec_id", "embedding"))
    IvfMorIndexStore.catchupRuns.reset(); IvfMorIndexStore.catchupSkips.reset()
    IvfMorIndexStore.open(spark, root, "embedding", "vec_id").retrain(cents1)
    assert(IvfMorIndexStore.catchupSkips.sum() == 1 &&
      IvfMorIndexStore.catchupRuns.sum() == 0,
      s"quiet retrain must skip (runs=${IvfMorIndexStore.catchupRuns.sum()})")
    val quiet = IvfMorIndexStore.open(spark, root, "embedding", "vec_id")
      .read.get.select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(quiet == Map(100L -> 0, 101L -> 0), s"skip must not strand rows: $quiet")

    // contended path: a pinned door commits INSIDE the window (after
    // the main pass's read, before the flip — the retrainStaged seam
    // pins the ordering) — its marker lands in S1∖S0, the catch-up
    // fires, and the racing row is migrated by IT (the stamp had not
    // flipped at the door's re-verification, so the writer leg
    // provably did not heal this one)
    val root2 = freshRoot()
    new IvfMorIndexStore(spark, root2, "embedding", "vec_id", cents3)
      .upsert(Seq((100L, deg(0))).toDF("vec_id", "embedding"))
    val tick = IvfMorIndexStore.openPinned(spark, root2, "embedding", "vec_id")
    IvfMorIndexStore.catchupRuns.reset(); IvfMorIndexStore.catchupSkips.reset()
    IvfMorIndexStore.healedCommits.reset()
    new IvfMorIndexStore(spark, root2, "embedding", "vec_id", cents3)
      .retrainStaged(cents1, () => {
        val a = tick.ingestNearDup(
          Seq((202L, deg(-10))).toDF("vec_id", "embedding"), 0.95)
        assert(a.count() == 1, "cross-cell under the pinned 3-cell geometry")
      })
    assert(IvfMorIndexStore.catchupRuns.sum() == 1 &&
      IvfMorIndexStore.catchupSkips.sum() == 0,
      "a raced commit's marker must force the catch-up")
    assert(IvfMorIndexStore.healedCommits.sum() == 0,
      "pre-flip commit: the catch-up leg owns it, not the writer leg")
    val healed = IvfMorIndexStore.open(spark, root2, "embedding", "vec_id")
      .read.get.select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(healed == Map(100L -> 0, 202L -> 0),
      s"the catch-up must migrate the mid-window commit, got $healed")
  }

  test("THREADED door × retrain: genuinely concurrent drain and reindex — zero misplaced, lower bound admitted") {
    // Not a staged interleaving: the door ticks on ITS OWN THREAD while
    // this thread fires a real retrain mid-drain. Assertions hold under
    // ANY interleaving — novel rows always admit (the sequential lower
    // bound), planted exact copies reject unless the documented racing-
    // tick recall window admitted them (extra admissions only), and at
    // quiescence every row resides in its current-geometry cell.
    val root = freshRoot()
    new IvfMorIndexStore(spark, root, "embedding", "vec_id", centroids)
      .upsert(full)
    val k4 = Similarity.ivfCentroids(full, "embedding", "vec_id", k = 4)
    IvfMorIndexStore.healedCommits.reset()
    val rnd = new scala.util.Random(97)
    val novelIds = scala.collection.mutable.Set.empty[Long]
    val copyIds = scala.collection.mutable.Set.empty[Long]
    val batches = (0 until 6).map { t =>
      val novel = (0 until 5).map { j =>
        val id = 10000L + t * 100 + j; novelIds += id
        id -> Array.fill(16)((rnd.nextGaussian() * 3).toFloat)
      }
      val copies = (0 until 5).map { j =>
        val src = (t * 20 + j).toLong; val id = 20000L + t * 100 + j
        copyIds += id
        id -> pts(src.toInt)._2
      }
      (novel ++ copies).toDF("vec_id", "embedding").localCheckpoint(false)
    }
    @volatile var doorErr: Throwable = null
    val door = new Thread(() => {
      try batches.foreach { b =>
        // reopen-per-tick; transient refusals (pending intent / torn
        // mid-publish read) are the documented wait-out-the-window path
        var h: IvfMorIndexStore = null
        while (h == null)
          try h = IvfMorIndexStore.openPinned(spark, root, "embedding", "vec_id")
          catch {
            case e: Exception
              if e.getMessage != null && (e.getMessage.contains("interrupted") ||
                e.getMessage.contains("torn")) => Thread.sleep(25)
          }
        h.ingestNearDup(b, 0.95).count()
      } catch { case e: Throwable => doorErr = e }
    }, "graft-door")
    door.start()
    Thread.sleep(rnd.nextInt(1500).toLong) // fire mid-drain, seeded-random point
    IvfMorIndexStore.open(spark, root, "embedding", "vec_id").retrain(k4)
    door.join(600000)
    assert(!door.isAlive, "door thread hung")
    assert(doorErr == null, s"door tick failed under the race: $doorErr")
    // quiescence: geometry flipped exactly once, ZERO misplaced rows
    val h = IvfMorIndexStore.open(spark, root, "embedding", "vec_id")
    assert(IvfMorIndexStore.currentVersion(spark, root).contains(2))
    val state = h.read.get.select(col("vec_id"),
        (Similarity.cellOf(col("embedding"), k4) === col("cell")).as("ok"))
      .collect()
    assert(state.forall(_.getBoolean(1)),
      s"${state.count(!_.getBoolean(1))} rows misplaced after the concurrent retrain")
    val ids = state.map(_.getLong(0)).toSet
    // lower bound: every novel row admitted, nothing invented
    assert(novelIds.forall(ids.contains),
      s"missing novels: ${novelIds.filterNot(ids.contains)}")
    assert(ids.subsetOf(pts.map(_._1).toSet ++ novelIds ++ copyIds))
    // exact copies reject UNLESS the racing tick's recall window let
    // them through — extra admissions are the documented trade; report
    val raceExtras = copyIds.count(ids.contains)
    info(s"race-window extra admissions: $raceExtras/${copyIds.size}; " +
      s"healed commits: ${IvfMorIndexStore.healedCommits.sum()}; " +
      s"catch-up runs/skips: ${IvfMorIndexStore.catchupRuns.sum()}/" +
      s"${IvfMorIndexStore.catchupSkips.sum()}")
  }

  test("driftReport: per-cell population + integer-micro cohesion equal a driver recompute") {
    val root = freshRoot()
    val ivf = new IvfMorIndexStore(spark, root, "embedding", "vec_id", centroids)
    ivf.upsert(full)
    // a re-embed wave: negate every %10==3 vector — its residence moves
    // to the cell nearest the NEW embedding, cohesion drops corpus-wide
    val wave = full.filter(pmod(col("vec_id"), lit(10)) === 3)
      .withColumn("embedding", transform(col("embedding"), x => -x))
    ivf.upsert(wave)
    val got = ivf.driftReport().collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // driver recompute from first principles
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val state = pts.map { case (id, v) =>
      val e = if (id % 10 == 3) v.map(-_) else v
      val cell = centroids.indices.maxBy(c => (cos(e, centroids(c)), -c))
      (cell, math.floor(cos(e, centroids(cell)) * 1e6).toLong)
    }
    val want = state.groupBy(_._1).map { case (c, xs) =>
      c.toLong -> (xs.size.toLong, xs.map(_._2).sum)
    }
    assert(got == want, s"drift report diverged: got $got want $want")
    // the report is a trigger signal: total population conserved, and
    // the wave's cells show sub-unit mean cohesion (a fresh build's
    // exact-fit rows sit at ~1.0)
    assert(got.values.map(_._1).sum == 400L)
    assert(got.values.exists { case (n, s) => s < n * 999999L },
      "the re-embed wave must depress cohesion somewhere")
  }

  test("a commit racing a MID-PUBLISH flip heals under the LAYOUT, not the stamp") {
    // The r20 three-writer soak's find: a door pinned TWO geometries
    // back commits while a CODEBOOK publisher sits between its layout
    // write and its stamp flip. Deferring to that publisher is unsound
    // — a books catch-up re-encodes code words in place and can never
    // move the commit's rows out of their superseded cells. The heal
    // must follow the LAYOUT (the committed future: the intent pins
    // the target), so the rows land in current cells WITH current
    // codes even though the stamp has not flipped yet.
    val root = freshRoot()
    val ivf = new IvfMorIndexStore(spark, root, "embedding", "vec_id", centroids)
    ivf.upsert(full.limit(100))
    // the door pins the ORIGINAL k8 geometry...
    val doorK8 = IvfMorIndexStore.openPinned(spark, root, "embedding", "vec_id")
    // ...a centroid retrain completes under it...
    val k4 = Similarity.ivfCentroids(full, "embedding", "vec_id", k = 4)
    IvfMorIndexStore.open(spark, root, "embedding", "vec_id").retrain(k4)
    // ...and a codebook publisher freezes MID-PUBLISH: intent pending,
    // layout already naming (k4, books), stamp still the books-less k4
    val books = Pq.trainCodebooks(full, "embedding", "vec_id", m = 8, ksub = 16)
    val target = IvfMorIndexStore.stampOf(k4, Some(books))
    val fs = hFs(root)
    def put(name: String, text: String): Unit = {
      val out = fs.create(hPath(root, name), true)
      out.write(text.getBytes("UTF-8")); out.close()
    }
    put(IvfMorIndexStore.IntentFile, target)
    put(IvfMorIndexStore.LayoutFile,
      IvfMorIndexStore.serializeLayout(k4, Some(books), 3))
    IvfMorIndexStore.healedCommits.reset()
    val batch = (5000L until 5020L)
      .map(i => i -> pts((i % 400).toInt)._2.map(x => x + 0.25f))
      .toDF("vec_id", "embedding")
    doorK8.upsert(batch)
    assert(IvfMorIndexStore.healedCommits.sum() == 1,
      "the mid-publish window must trigger the write-side heal")
    // finish the frozen publish the way its recovery would
    put(IvfMorIndexStore.StampFile, target)
    fs.delete(hPath(root, IvfMorIndexStore.IntentFile), false)
    val h = IvfMorIndexStore.open(spark, root, "embedding", "vec_id")
    val got = h.read.get.filter(col("vec_id") >= 5000L)
      .select(col("vec_id"),
        (Similarity.cellOf(col("embedding"), k4) === col("cell")).as("cellOk"),
        (Pq.encode(col("embedding"), books) <=> col("pq_codes")).as("codeOk"))
      .collect()
    assert(got.length == 20, s"heal lost rows: ${got.length}")
    assert(got.forall(_.getBoolean(1)),
      "racing commit's rows left in superseded cells — the deferral hole")
    assert(got.forall(_.getBoolean(2)),
      "racing commit's rows missing current code words")
  }

  test("two-thread first-contact: exactly one geometry adoption wins; the loser refuses") {
    // two handles under DIFFERENT centroid sets race first contact with
    // one root: the stamp state machine's adoption arm is check-then-
    // write, and without the per-root lock both pass the missing-stamp
    // check and rename-replace lets the LAST stamp win — both doors
    // then proceed, one probing the wrong cells forever. Under the lock
    // exactly one adoption lands; the loser re-reads it and refuses.
    val root = freshRoot()
    val k4 = Similarity.ivfCentroids(full, "embedding", "vec_id", k = 4)
    val slice = full.limit(60).localCheckpoint(false)
    val a = new IvfMorIndexStore(spark, root, "embedding", "vec_id", centroids)
    val b = new IvfMorIndexStore(spark, root, "embedding", "vec_id", k4)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq(a, b).map { h =>
      new Thread(() => {
        gate.await()
        try h.upsert(slice) catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); gate.countDown()
    threads.foreach(_.join(300000))
    assert(threads.forall(!_.isAlive), "adoption race hung")
    assert(errs.size == 1,
      s"exactly one geometry adoption must win; got ${errs.size} failures: $errs")
    assert(errs.peek().getMessage.contains("built under"),
      s"the loser must refuse on the stamp: ${errs.peek()}")
    // the store is consistent under the winner's geometry
    val h = IvfMorIndexStore.open(spark, root, "embedding", "vec_id")
    assert(h.read.get.count() == 60)
  }

  test("THREADED retention × retrain: expired ids never resurrect under the new geometry") {
    // The hazard (real without serialization): expire's tombstones and
    // the retrain's migration pass both commit through the OCC append
    // path, reconcile order is commit SEQUENCE (no cursor) — a
    // migration segment whose read predates the tombstone but whose
    // commit lands after it would out-sequence the tombstone and
    // RESURRECT the expired id in its new cell, where the catch-up
    // cannot heal it (the row is "correctly resident"). The maintenance
    // lock + intent marker serialize the two; this spec fires them
    // genuinely concurrently and asserts the invariants at quiescence.
    val root = freshRoot()
    val rr = new scala.util.Random(71)
    val iso = (0L until 400L).map(i => i -> Array.fill(16)(rr.nextGaussian().toFloat))
      .toDF("vec_id", "embedding").localCheckpoint(false)
    val gen1 = iso.filter(col("vec_id") < 200L).localCheckpoint(false)
    val gen2 = iso.filter(col("vec_id") >= 200L).localCheckpoint(false)
    val ivf = new IvfMorIndexStore(spark, root, "embedding", "vec_id", centroids)
    ivf.upsert(gen1, adm = 1L)
    ivf.upsert(gen2, adm = 2L)
    val k4 = Similarity.ivfCentroids(iso, "embedding", "vec_id", k = 4)
    @volatile var retErr: Throwable = null
    val gcRefusals = new java.util.concurrent.atomic.LongAdder
    val retention = new Thread(() => {
      // the production retention cadence: reopen per firing, retry
      // through the documented refusals (pending intent mid-retrain,
      // stale handle after the flip, gc losing a publish race)
      try {
        var done = false
        while (!done)
          try {
            val h = IvfMorIndexStore.open(spark, root, "embedding", "vec_id")
            h.expire(2L)
            h.gcTombstones()
            done = true
          } catch {
            case _: IllegalStateException => Thread.sleep(20)
            case _: java.util.ConcurrentModificationException =>
              gcRefusals.increment(); Thread.sleep(20)
          }
      } catch { case e: Throwable => retErr = e }
    }, "graft-retention")
    retention.start()
    // fire the retrain immediately — the two race on the maintenance
    // window; whichever enters first, the other defers and completes
    val migrated = IvfMorIndexStore.open(spark, root, "embedding", "vec_id")
      .retrain(k4)
    retention.join(600000)
    assert(!retention.isAlive, "retention thread hung")
    assert(retErr == null, s"retention failed under the race: $retErr")
    // quiescence: gen-1 (adm 1) is GONE — never resurrected by the
    // migration pass — and every live row sits in its k4 cell
    val state = migrated.read.get
      .select(col("vec_id"),
        (Similarity.cellOf(col("embedding"), k4) === col("cell")).as("ok"))
      .collect()
    val live = state.map(_.getLong(0)).toSet
    assert(live == (200L until 400L).toSet,
      s"expired ids resurrected: ${live.filter(_ < 200L)}; missing: ${(200L until 400L).toSet.diff(live)}")
    assert(state.forall(_.getBoolean(1)), "rows misplaced after retrain × retention")
    // semantics hold through the race: expired near-dups re-admit,
    // live ones still screen
    def copies(src: org.apache.spark.sql.DataFrame) =
      src.select((col("vec_id") + 9000L).as("vec_id"), col("embedding"))
    assert(migrated.ingestNearDup(copies(gen1.limit(20)), 0.95, adm = 3L).count() == 20)
    assert(migrated.ingestNearDup(copies(gen2.limit(20)), 0.95, adm = 3L).isEmpty)
    info(s"gc publish-race refusals retried: ${gcRefusals.sum()}")
  }

  test("open refuses: pending retrain intent, uninitialized store, torn layout") {
    // uninitialized: no stamp yet
    val empty = freshRoot()
    val e0 = intercept[IllegalStateException] {
      IvfMorIndexStore.open(spark, empty, "embedding", "vec_id")
    }
    assert(e0.getMessage.contains("no layout stamp"))
    // pending intent: recovery owns the store
    val root = freshRoot()
    val ivf = new IvfMorIndexStore(spark, root, "embedding", "vec_id", centroids)
    ivf.upsert(full.limit(50))
    val fs = hFs(root)
    val out = fs.create(hPath(root, "_retrain_intent"), true)
    out.write("target".getBytes("UTF-8")); out.close()
    val e1 = intercept[IllegalStateException] {
      IvfMorIndexStore.open(spark, root, "embedding", "vec_id")
    }
    assert(e1.getMessage.contains("interrupted"))
    fs.delete(hPath(root, "_retrain_intent"), false)
    // torn layout: bytes that do not hash to the stamp refuse
    val lp = hPath(root, "_layout")
    val in = fs.open(lp)
    val text = new String(in.readAllBytes(), "UTF-8"); in.close()
    val lines = text.linesIterator.toArray
    lines(1) = lines(1).split(" ").drop(1).mkString(" ") + " 0.5"
    val out2 = fs.create(lp, true)
    out2.write(lines.mkString("\n").getBytes("UTF-8")); out2.close()
    val e2 = intercept[IllegalArgumentException] {
      IvfMorIndexStore.open(spark, root, "embedding", "vec_id")
    }
    assert(e2.getMessage.contains("stamp"))
  }
}
