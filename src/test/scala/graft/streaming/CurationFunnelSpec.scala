package graft.streaming

import graft.SparkSpec
import graft.llm.{MinhashIndexStore, QualityLr}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed streaming ingest door ([[StreamOps.curationFunnelDrain]]):
  * decontaminate → trained-quality gate → persistent MinHash dedup
  * admission in one streamed pass. The fixture plants one doc per
  * failure mode so every stage provably fires, and the feed is
  * internally dup-free by construction so the admitted set is
  * split-INVARIANT — which the spec then asserts across micro-batch
  * splits. The final test documents the one order-dependent case
  * (mutual near-dups inside the feed) honestly.
  */
class CurationFunnelSpec extends SparkSpec {
  import spark.implicits._

  // separable corpus: even = good (shared function words), odd = salt.
  // Good docs vary in THREE trailing words, so pairwise exact Jaccard
  // is 7/13 ≈ 0.54 — the feed is internally dup-free at 0.8. (One
  // varying word is NOT enough: "…dog number $i" docs share 8 of 10
  // shingles = J exactly 0.8, silently at the threshold.)
  private def feedDocs = (0L until 40L).map { i =>
    if (i % 2 == 0)
      (i, s"the quick brown fox jumps over the lazy dog alpha$i beta$i gamma$i", 1)
    else
      (i, s"zzq$i xkcd${i * 7} qqz${i % 5} vvv${i * 3}", 0)
  }.toDF("doc_id", "text", "label")

  // the already-curated corpus the dedup store is pre-seeded with;
  // good-shaped text so a COPY of it in the feed passes the quality
  // gate and reaches (and is rejected by) the dedup stage
  private val corpusText =
    "the quick brown fox jumps over the lazy dog persisted corpus copy"

  // the eval-leak plant: text UNIQUE to the benchmark (it must not
  // share shingles with the good class, or decontamination would wipe
  // every good doc — their shared ten-word prefix means any one of
  // them covers ≥ 0.5 of another's shingles)
  private val evalLeakText =
    "benchmark held out evaluation question about a unique niche subject"

  private def drain(feed: DataFrame, files: Seq[DataFrame], tmp: String,
                    maxFilesPerTrigger: Option[Int]): DataFrame = {
    files.foreach(_.repartition(1).write.mode("append").parquet(s"$tmp/feed"))
    val store = new MinhashIndexStore(spark, s"$tmp/store", "doc_id", "text")
    store.append(Seq((100L, corpusText)).toDF("doc_id", "text"))
    val evalSet = Seq((900L, evalLeakText)).toDF("doc_id", "text")
    val model = QualityLr.train(feed, "doc_id", "text", "label")
    val reader = spark.readStream
      .schema(spark.read.parquet(s"$tmp/feed").schema)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n.toString))
      .parquet(s"$tmp/feed")
    StreamOps.curationFunnelDrain(stream, evalSet, model, store,
      "doc_id", "text", s"$tmp/out", s"$tmp/ckpt")
    spark.read.parquet(s"$tmp/out")
  }

  // feed = separable corpus + doc 41 (an exact copy of the pre-seeded
  // corpus doc — must fall at the DEDUP stage; good-shaped so it
  // clears the quality gate first) + doc 42 (the eval plant — its
  // exact text is in the benchmark set, so it falls at
  // DECONTAMINATION before any other gate sees it)
  private def fullFeed = feedDocs
    .unionByName(Seq((41L, corpusText, 1), (42L, evalLeakText, 0))
      .toDF("doc_id", "text", "label"))

  test("every stage fires, and each planted doc falls at its own stage") {
    val tmp = java.nio.file.Files.createTempDirectory("funnel1").toString
    val feed = fullFeed
    val out = drain(feed, Seq(feed.select("doc_id", "text")), tmp, None)
    def ids(stage: Int): Set[Long] =
      out.filter(col("stage") === stage).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    val clean = ids(0); val hq = ids(1); val admitted = ids(2)
    // stage 0: exactly the eval plant is removed
    assert(clean == (0L until 40L).toSet + 41L)
    // stage 1: a non-empty PROPER subset — the salt docs fall here,
    // the good docs (including the corpus copy) survive
    assert(hq.nonEmpty && hq.subsetOf(clean) && hq != clean)
    assert(hq.contains(41L), "the corpus copy must clear the quality gate")
    // the linear model is approximate — allow a couple of hash-collision
    // stragglers, but the salt class must overwhelmingly fall here
    assert((1L until 40L by 2).count(hq.contains) <= 2, "salt docs must fall")
    assert((0L until 40L by 2).forall(hq.contains), "good docs must survive")
    // stage 2: exactly the corpus copy is removed by the dedup screen
    assert(admitted == hq - 41L)
    // the funnel is monotone per batch and the stage counts match
    assert(clean.size > hq.size && hq.size > admitted.size)
  }

  test("admitted set is split-invariant when the feed is internally dup-free") {
    val feed = fullFeed
    def admittedIds(tmp: String, files: Seq[DataFrame], mft: Option[Int]) = {
      val out = drain(feed, files, tmp, mft)
      (out.filter(col("stage") === 2).select("doc_id")
        .collect().map(_.getLong(0)).toSet,
        out.filter(col("stage") === 2).select("batch").distinct().count())
    }
    val one = java.nio.file.Files.createTempDirectory("funnel_one").toString
    val (a, nBatchesOne) =
      admittedIds(one, Seq(feed.select("doc_id", "text")), None)
    val four = java.nio.file.Files.createTempDirectory("funnel_four").toString
    val chunks = Seq(0L -> 7L, 7L -> 9L, 9L -> 30L, 30L -> 43L).map { case (lo, hi) =>
      feed.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .select("doc_id", "text")
    }
    val (b, nBatchesFour) = admittedIds(four, chunks, Some(1))
    assert(nBatchesOne == 1 && nBatchesFour == 4,
      s"fixture must actually exercise different splits ($nBatchesOne vs $nBatchesFour)")
    assert(a == b, "stages are per-doc or screened against pre-batch state " +
      "only, so a dup-free feed must admit the same set under any split")
    assert(a.nonEmpty)
  }

  test("funnel + exactly-once sink: a forced full re-drain converges to identical output") {
    // the composed door is STATEFUL (the dedup store persists), but a
    // dup-free feed replays to the same answer — and the batch-keyed
    // sink makes the replay overwrite rather than duplicate
    val feed = fullFeed
    val tmp = java.nio.file.Files.createTempDirectory("funnel_eo").toString
    feed.select("doc_id", "text").repartition(1)
      .write.mode("append").parquet(s"$tmp/feed")
    val store = new MinhashIndexStore(spark, s"$tmp/store", "doc_id", "text")
    store.append(Seq((100L, corpusText)).toDF("doc_id", "text"))
    val model = QualityLr.train(feed, "doc_id", "text", "label")
    def drainOnce(ckpt: String): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(s"$tmp/feed").schema).parquet(s"$tmp/feed")
      StreamOps.curationFunnelDrain(stream, Seq((900L, evalLeakText)).toDF("doc_id", "text"),
        model, store, "doc_id", "text", s"$tmp/out", ckpt,
        exactlyOnceSink = true)
    }
    drainOnce(s"$tmp/c1")
    val first = canon(spark.read.parquet(s"$tmp/out")
      .select("batch", "stage", "doc_id"))
    assert(first.nonEmpty)
    drainOnce(s"$tmp/c2") // forced replay of every batch
    val replayed = canon(spark.read.parquet(s"$tmp/out")
      .select("batch", "stage", "doc_id"))
    assert(replayed == first,
      "replaying a dup-free feed through the keyed sink must converge, not duplicate")
  }

  test("AUDITED door: one verdict row per feed doc — stage, reason, match attribution, RunMeta, exactly-once replay") {
    val feed = fullFeed
    val tmp = java.nio.file.Files.createTempDirectory("funnel_aud").toString
    feed.select("doc_id", "text").repartition(1)
      .write.mode("append").parquet(s"$tmp/feed")
    val store = new MinhashIndexStore(spark, s"$tmp/store", "doc_id", "text")
    store.append(Seq((100L, corpusText)).toDF("doc_id", "text"))
    val model = QualityLr.train(feed, "doc_id", "text", "label")
    val meta = new graft.meta.MetaStore(spark, s"$tmp/meta")
    def drainOnce(ckpt: String): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(s"$tmp/feed").schema).parquet(s"$tmp/feed")
      StreamOps.curationFunnelDrainAudited(stream,
        Seq((900L, evalLeakText)).toDF("doc_id", "text"), model,
        b => store.ingestWithMatches(b.select("doc_id", "text"), 0.8),
        "doc_id", "text", s"$tmp/out", ckpt,
        exactlyOnceSink = true, meta = Some(meta))
    }
    drainOnce(s"$tmp/c1")
    val out = spark.read.parquet(s"$tmp/out").drop("__b")
    // PARTITION property: survivors ∪ rejects = feed, exactly once each
    assert(out.count() == feed.count())
    assert(out.select("doc_id").distinct().count() == feed.count())
    val byId = out.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    def f(id: Long, c: String) = byId(id).getAs[Any](c)
    // the eval plant falls at stage 0, unscored
    assert(f(42L, "outcome") == "rejected" && f(42L, "reason") == "contaminated"
      && f(42L, "stage") == 0L && f(42L, "margin_micro") == null)
    // the corpus copy is a duplicate ATTRIBUTED to the seeded doc
    assert(f(41L, "outcome") == "rejected" && f(41L, "reason") == "duplicate"
      && f(41L, "stage") == 2L && f(41L, "match_id") == 100L
      && f(41L, "margin_micro") != null)
    // good docs admitted with margins; salt docs overwhelmingly low_quality
    assert((0L until 40L by 2).forall(i => f(i, "outcome") == "admitted"
      && f(i, "stage") == 2L && f(i, "reason") == null && f(i, "margin_micro") != null))
    val lowq = out.filter(col("reason") === "low_quality")
    assert(lowq.count() >= 18 && lowq.filter(col("margin_micro").isNull).count() == 0)
    // RunMeta: the V3 tick row carries the per-stage counts, and the
    // counter metrics reconcile against the verdict relation
    val tr = meta.taskResults.collect()
    assert(tr.length == 1 && tr.head.getAs[String]("task") == "tick0"
      && tr.head.getAs[Boolean]("isSuccess"))
    val admittedN = out.filter(col("outcome") === "admitted").count()
    assert(tr.head.getAs[String]("result").contains(s"admitted=$admittedN"))
    val counters = meta.metrics.filter(col("metricType") === "counter")
      .select("name", "value").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(counters("admitted") == admittedN.toDouble)
    assert(counters("rejected_duplicate") == 1.0)
    assert(counters("rejected_contaminated") == 1.0)
    assert(counters.values.sum == feed.count().toDouble,
      "the four counters must partition the feed")
    // exactly-once sink: a FORCED full re-drain (fresh checkpoint, same
    // store/out) overwrites its batch directory with the identical
    // verdicts — no duplicate deliveries, convergent attribution
    val first = canon(out)
    drainOnce(s"$tmp/c2")
    assert(canon(spark.read.parquet(s"$tmp/out").drop("__b")) == first,
      "replaying a dup-free feed through the keyed sink must converge")
  }

  test("AUDITED door with the IVF backend: duplicate attribution through ingestNearDupWithMatches") {
    def vec(seed: Long): Array[Float] = {
      val rr = new scala.util.Random(seed); Array.fill(16)(rr.nextGaussian().toFloat)
    }
    val corpusVec = vec(1000L)
    val rows = (0L until 40L).map { i =>
      val t = if (i % 2 == 0)
        s"the quick brown fox jumps over the lazy dog alpha$i beta$i gamma$i"
      else s"zzq$i xkcd${i * 7} qqz${i % 5} vvv${i * 3}"
      (i, t, vec(i), if (i % 2 == 0) 1 else 0)
    } :+ ((41L, corpusText, corpusVec, 1)) :+ ((42L, evalLeakText, vec(42L), 0))
    val feed = rows.toDF("doc_id", "text", "embedding", "label")
    val model = QualityLr.train(feed, "doc_id", "text", "label")
    val tmp = java.nio.file.Files.createTempDirectory("funnel_aud_ivf").toString
    val idx = new graft.llm.IvfMorIndexStore(spark, s"$tmp/idx",
      "embedding", "doc_id", Array(vec(2000L), vec(2001L)))
    idx.upsert(Seq((100L, corpusVec)).toDF("doc_id", "embedding"))
    feed.select("doc_id", "text", "embedding").repartition(1)
      .write.parquet(s"$tmp/feed")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/feed").schema).parquet(s"$tmp/feed")
    StreamOps.curationFunnelDrainAudited(stream,
      Seq((900L, evalLeakText)).toDF("doc_id", "text"), model,
      b => idx.ingestNearDupWithMatches(b.select("doc_id", "embedding"), 0.95),
      "doc_id", "text", s"$tmp/out", s"$tmp/ckpt")
    val out = spark.read.parquet(s"$tmp/out")
    assert(out.count() == feed.count()
      && out.select("doc_id").distinct().count() == feed.count())
    val dup = out.filter(col("reason") === "duplicate").collect()
    assert(dup.length == 1 && dup.head.getAs[Long]("doc_id") == 41L
      && dup.head.getAs[Long]("match_id") == 100L,
      "the embedding copy must be attributed to its stored source")
    assert(out.filter(col("outcome") === "admitted").count() ===
      out.filter(col("stage") === 2 && col("reason").isNull).count())
  }

  test("AUDITED door with the PHASH backend: duplicate attribution through PhashIndexStore.ingestWithMatches") {
    import graft.llm.Multimodal
    // per-doc md5-pixel images: unrelated images never land within
    // hamming 3, so only the PLANTED copy (doc 41's image = the stored
    // doc 100's seed) trips the dedup stage — attributed to 100
    def hashesOf(rows: Seq[(Long, String)]): DataFrame =
      Multimodal.imagePhash(spark,
          Multimodal.syntheticGrayMedia(spark,
            rows.map { case (id, seed) => (id, seed, false) }
              .toDF("doc_id", "seed", "pert"),
            "doc_id", "seed", "pert", 16, 16))
        .toDF().select(col("media_id").as("doc_id"), col("ahash"))
    val texts = feedDocs.unionByName(
      Seq((41L, corpusText, 1), (42L, evalLeakText, 0)).toDF("doc_id", "text", "label"))
    val feed = texts.join(hashesOf(
      (0L until 40L).map(i => (i, s"p$i")) :+ ((41L, "pC")) :+ ((42L, "p42"))),
      Seq("doc_id"))
    val model = QualityLr.train(texts, "doc_id", "text", "label")
    val tmp = java.nio.file.Files.createTempDirectory("funnel_aud_ph").toString
    val store = new graft.llm.PhashIndexStore(spark, s"$tmp/idx", "doc_id")
    store.append(hashesOf(Seq((100L, "pC"))))
    feed.select("doc_id", "text", "ahash").repartition(1)
      .write.parquet(s"$tmp/feed")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/feed").schema).parquet(s"$tmp/feed")
    StreamOps.curationFunnelDrainAudited(stream,
      Seq((900L, evalLeakText)).toDF("doc_id", "text"), model,
      b => store.ingestWithMatches(b),
      "doc_id", "text", s"$tmp/out", s"$tmp/ckpt")
    val out = spark.read.parquet(s"$tmp/out")
    // partition property + attribution, the text-door contract verbatim
    assert(out.count() == feed.count()
      && out.select("doc_id").distinct().count() == feed.count())
    val dup = out.filter(col("reason") === "duplicate").collect()
    assert(dup.length == 1 && dup.head.getAs[Long]("doc_id") == 41L
      && dup.head.getAs[Long]("match_id") == 100L
      && dup.head.getAs[Any]("margin_micro") != null,
      "the image copy must be attributed to its stored source, margin riding")
    val cont = out.filter(col("reason") === "contaminated").collect()
    assert(cont.length == 1 && cont.head.getAs[Long]("doc_id") == 42L)
    assert(out.filter(col("outcome") === "admitted").count() ===
      out.filter(col("stage") === 2 && col("reason").isNull).count())
    // and the survivors' hashes persisted: a re-delivery of an admitted
    // doc's image under a new id is now a dup of THAT doc
    val admitted0 = out.filter(col("outcome") === "admitted")
      .select("doc_id").as[Long].collect().min
    val m2 = store.probeMatches(hashesOf(Seq((500L, s"p$admitted0"))))
      .as[(Long, Long)].collect().toMap
    assert(m2 == Map(500L -> admitted0), s"survivor state must screen: $m2")
  }

  test("AUDITED door with the CLIP backend: duplicate attribution through ClipIndexStore.ingestWithMatches") {
    import graft.llm.Multimodal
    def framesOf(rows: Seq[(Long, String, Long)]): DataFrame =
      Multimodal.videoFramePhash(spark,
          Multimodal.syntheticY4m(spark,
            rows.map { case (id, seed, off) => (id, seed, off, false) }
              .toDF("doc_id", "seed", "off", "pert"),
            "doc_id", "seed", "off", "pert", width = 8, height = 8, nFrames = 24),
          grid = 8)
        .toDF().select(col("media_id").as("doc_id"),
          col("frame_index").cast("long").as("f"), col("fhash"))
    val feedArr = framesOf(
        (0L until 40L).map(i => (i, s"w$i", 0L)) :+ ((41L, "wC", 7L)) :+ ((42L, "w42", 0L)))
      .groupBy("doc_id")
      .agg(transform(array_sort(collect_list(struct(col("f"), col("fhash")))),
        x => x.getField("fhash")).as("fhashes"))
    val texts = feedDocs.unionByName(
      Seq((41L, corpusText, 1), (42L, evalLeakText, 0)).toDF("doc_id", "text", "label"))
    val feed = texts.join(feedArr, Seq("doc_id"))
    val model = QualityLr.train(texts, "doc_id", "text", "label")
    val tmp = java.nio.file.Files.createTempDirectory("funnel_aud_cl").toString
    val store = new graft.llm.ClipIndexStore(spark, s"$tmp/idx",
      "doc_id", "f", "fhash", minFrames = 8)
    store.append(framesOf(Seq((100L, "wC", 0L))))
    feed.select("doc_id", "text", "fhashes").repartition(1)
      .write.parquet(s"$tmp/feed")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/feed").schema).parquet(s"$tmp/feed")
    StreamOps.curationFunnelDrainAudited(stream,
      Seq((900L, evalLeakText)).toDF("doc_id", "text"), model,
      b => {
        val fr = b.select(col("doc_id"), posexplode(col("fhashes")))
          .select(col("doc_id"), col("pos").cast("long").as("f"),
            col("col").as("fhash"))
        val (surv, matches) = store.ingestWithMatches(fr)
        (b.join(surv.select("doc_id").distinct(), Seq("doc_id")), matches)
      },
      "doc_id", "text", s"$tmp/out", s"$tmp/ckpt")
    val out = spark.read.parquet(s"$tmp/out")
    assert(out.count() == feed.count()
      && out.select("doc_id").distinct().count() == feed.count())
    val dup = out.filter(col("reason") === "duplicate").collect()
    assert(dup.length == 1 && dup.head.getAs[Long]("doc_id") == 41L
      && dup.head.getAs[Long]("match_id") == 100L
      && dup.head.getAs[Any]("margin_micro") != null,
      "the embedded clip must be attributed to its stored source video")
    val cont = out.filter(col("reason") === "contaminated").collect()
    assert(cont.length == 1 && cont.head.getAs[Long]("doc_id") == 42L)
    assert(out.filter(col("outcome") === "admitted").count() ===
      out.filter(col("stage") === 2 && col("reason").isNull).count())
    // survivor frame rows persisted: an embedded clip of an admitted
    // video under a new id is now a dup of THAT video
    val admitted0 = out.filter(col("outcome") === "admitted")
      .select("doc_id").as[Long].collect().min
    val m2 = store.probeMatches(framesOf(Seq((500L, s"w$admitted0", 7L))))
      .as[(Long, Long)].collect().toMap
    assert(m2 == Map(500L -> admitted0), s"survivor state must screen: $m2")
  }

  test("the admit hook swaps in the SEMANTIC backend: same funnel, IVF-cosine stage 3") {
    // 16-dim seeded gaussians: pairwise cosine ≥ 0.95 by chance is
    // ~3e-8, so only the PLANTED copy trips the dedup stage
    def vec(seed: Long): Array[Float] = {
      val rr = new scala.util.Random(seed); Array.fill(16)(rr.nextGaussian().toFloat)
    }
    val corpusVec = vec(1000L)
    val rows = (0L until 40L).map { i =>
      val t = if (i % 2 == 0)
        s"the quick brown fox jumps over the lazy dog alpha$i beta$i gamma$i"
      else s"zzq$i xkcd${i * 7} qqz${i % 5} vvv${i * 3}"
      (i, t, vec(i), if (i % 2 == 0) 1 else 0)
    } :+ ((41L, corpusText, corpusVec, 1)) :+ ((42L, evalLeakText, vec(42L), 0))
    val feed = rows.toDF("doc_id", "text", "embedding", "label")
    val model = QualityLr.train(feed, "doc_id", "text", "label")
    val tmp = java.nio.file.Files.createTempDirectory("funnel_sem").toString
    val idx = new graft.llm.IvfMorIndexStore(spark, s"$tmp/idx",
      "embedding", "doc_id", Array(vec(2000L), vec(2001L)))
    idx.upsert(Seq((100L, corpusVec)).toDF("doc_id", "embedding"))
    feed.select("doc_id", "text", "embedding").repartition(1)
      .write.parquet(s"$tmp/feed")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/feed").schema).parquet(s"$tmp/feed")
    StreamOps.curationFunnelDrainWith(stream, Seq((900L, evalLeakText)).toDF("doc_id", "text"),
      model, b => idx.ingestNearDup(b.select("doc_id", "embedding"), 0.95),
      "doc_id", "text", s"$tmp/out", s"$tmp/ckpt")
    val out = spark.read.parquet(s"$tmp/out")
    def ids(stage: Int): Set[Long] =
      out.filter(col("stage") === stage).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    val clean = ids(0); val hq = ids(1); val admitted = ids(2)
    assert(clean == (0L until 40L).toSet + 41L, "eval plant falls at stage 0")
    assert(hq.contains(41L) && hq.subsetOf(clean) && hq != clean)
    assert(admitted == hq - 41L,
      "exactly the embedding copy of the corpus vector falls at the semantic stage")
  }

  test("the admit hook swaps in the CLIP backend: same funnel, temporal-alignment stage 3") {
    import graft.llm.Multimodal
    // per-doc synthetic videos: md5-pixel frames make unrelated streams
    // share no 64-bit frame hash, so only the PLANTED clip (doc 41 =
    // frames 7..30 of the corpus video's seed) trips the dedup stage
    def framesOf(rows: Seq[(Long, String, Long)]): DataFrame =
      Multimodal.videoFramePhash(spark,
          Multimodal.syntheticY4m(spark,
            rows.map { case (id, seed, off) => (id, seed, off, false) }
              .toDF("doc_id", "seed", "off", "pert"),
            "doc_id", "seed", "off", "pert", width = 8, height = 8, nFrames = 24),
          grid = 8)
        .toDF().select(col("media_id").as("doc_id"),
          col("frame_index").cast("long").as("f"), col("fhash"))
    val feedArr = framesOf(
        (0L until 40L).map(i => (i, s"v$i", 0L)) :+ ((41L, "vC", 7L)) :+ ((42L, "v42", 0L)))
      .groupBy("doc_id")
      .agg(transform(array_sort(collect_list(struct(col("f"), col("fhash")))),
        x => x.getField("fhash")).as("fhashes"))
    val texts = feedDocs.unionByName(
      Seq((41L, corpusText, 1), (42L, evalLeakText, 0)).toDF("doc_id", "text", "label"))
    val feed = texts.join(feedArr, Seq("doc_id"))
    val model = QualityLr.train(texts, "doc_id", "text", "label")
    val tmp = java.nio.file.Files.createTempDirectory("funnel_clip").toString
    val store = new graft.llm.ClipIndexStore(spark, s"$tmp/idx",
      "doc_id", "f", "fhash", minFrames = 8)
    store.append(framesOf(Seq((100L, "vC", 0L))))
    feed.select("doc_id", "text", "fhashes").repartition(1)
      .write.parquet(s"$tmp/feed")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/feed").schema).parquet(s"$tmp/feed")
    StreamOps.curationFunnelDrainWith(stream,
      Seq((900L, evalLeakText)).toDF("doc_id", "text"), model,
      b => {
        val fr = b.select(col("doc_id"), posexplode(col("fhashes")))
          .select(col("doc_id"), col("pos").cast("long").as("f"),
            col("col").as("fhash"))
        b.join(store.ingest(fr).select("doc_id").distinct(), Seq("doc_id"))
      },
      "doc_id", "text", s"$tmp/out", s"$tmp/ckpt")
    val out = spark.read.parquet(s"$tmp/out")
    def ids(stage: Int): Set[Long] =
      out.filter(col("stage") === stage).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    val clean = ids(0); val hq = ids(1); val admitted = ids(2)
    assert(clean == (0L until 40L).toSet + 41L, "eval plant falls at stage 0")
    assert(hq.contains(41L) && hq.subsetOf(clean) && hq != clean)
    assert(admitted == hq - 41L,
      "exactly the embedded clip of the corpus video falls at the clip stage")
  }

  test("versioned funnel refuses to gate without a published model") {
    val tmp = java.nio.file.Files.createTempDirectory("funnel_nm").toString
    feedDocs.limit(4).select("doc_id", "text").write.parquet(s"$tmp/feed")
    val store = new MinhashIndexStore(spark, s"$tmp/store", "doc_id", "text")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/feed").schema).parquet(s"$tmp/feed")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      StreamOps.curationFunnelDrainVersioned(stream,
        Seq((900L, evalLeakText)).toDF("doc_id", "text"),
        new QualityLr.ModelStore(spark, s"$tmp/models"),
        b => store.ingest(b.select("doc_id", "text")),
        "doc_id", "text", s"$tmp/out", s"$tmp/ckpt")
    }
    assert(e.getMessage.contains("no published model") ||
      Option(e.getCause).exists(_.getMessage.contains("no published model")))
  }

  test("mutual near-dups are order-decided: same batch admits both, split admits first only") {
    // two exact copies inside the feed — the documented at-least-once /
    // sequential-admission contract, shown rather than hidden
    val twin = "the quick brown fox jumps over the lazy dog twin pair body"
    val feed = feedDocs.unionByName(
      Seq((50L, twin, 1), (51L, twin, 1)).toDF("doc_id", "text", "label"))
    val together = java.nio.file.Files.createTempDirectory("funnel_tog").toString
    val outTogether = drain(feed, Seq(feed.select("doc_id", "text")), together, None)
    val admTogether = outTogether.filter(col("stage") === 2).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(admTogether.contains(50L) && admTogether.contains(51L),
      "a batch is never screened against itself")
    val split = java.nio.file.Files.createTempDirectory("funnel_split").toString
    val outSplit = drain(feed,
      Seq(feed.filter(col("doc_id") <= 50L).select("doc_id", "text"),
        feed.filter(col("doc_id") === 51L).select("doc_id", "text")),
      split, Some(1))
    val admSplit = outSplit.filter(col("stage") === 2).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(admSplit.contains(50L) && !admSplit.contains(51L),
      "a later batch screens against every earlier batch's survivors")
  }

  test("mid-drain index retrain gates the NEXT batch under the new geometry (reindex door)") {
    // hand-built 2-D geometry with a PROVABLE divergence: u = corpus
    // vector at 0deg; v (batch A) at +10deg, w (batch B) at -10deg.
    // cos(u,v) = cos(u,w) = cos(10deg) ~ 0.985 >= 0.95 — both are
    // near-dups of u by cosine. OLD geometry (centroids at 0deg,
    // +12deg, -12deg) puts u/v/w in THREE different cells, so the
    // same-cell screen admits v in batch A. The k=1 retrain published
    // after batch A collapses every residence into one cell, so w is
    // REJECTED in batch B — by geometry alone: under the old cells w
    // would have sat alone in cell 2 and been admitted (asserted
    // below). The admit hook reopens the index per tick through the
    // layout pointer; stage rows carry the gating index_v.
    import graft.llm.{IvfMorIndexStore, Similarity}
    def deg(a: Double) = Array(math.cos(math.toRadians(a)).toFloat,
      math.sin(math.toRadians(a)).toFloat)
    val centroidsOld = Array(deg(0), deg(12), deg(-12))
    val good = "the quick brown fox jumps over the lazy dog"
    val tmp = java.nio.file.Files.createTempDirectory("funnel_reidx").toString
    val root = s"$tmp/idx"
    val idx = new IvfMorIndexStore(spark, root, "embedding", "doc_id", centroidsOld)
    idx.upsert(Seq((100L, deg(0))).toDF("doc_id", "embedding"))
    val batchA = Seq((201L, s"$good alpha one two", deg(10)))
      .toDF("doc_id", "text", "embedding")
    val batchB = Seq((202L, s"$good beta three four", deg(-10)))
      .toDF("doc_id", "text", "embedding")
    batchA.repartition(1).write.mode("append").parquet(s"$tmp/feed")
    batchB.repartition(1).write.mode("append").parquet(s"$tmp/feed")
    // the counterfactual, asserted: under OLD cells w sits ALONE
    val cells = Seq(("u", deg(0)), ("v", deg(10)), ("w", deg(-10)))
      .toDF("tag", "embedding")
      .select(col("tag"), Similarity.cellOf(col("embedding"), centroidsOld).as("c"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(cells("u") == 0 && cells("v") == 1 && cells("w") == 2,
      s"fixture geometry broke: $cells")
    val model = QualityLr.train(feedDocs, "doc_id", "text", "label")
    val evalSet = Seq((900L, evalLeakText)).toDF("doc_id", "text")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/feed").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/feed")
    StreamOps.curationFunnelDrainWith(stream, evalSet, model,
      b => IvfMorIndexStore.open(spark, root, "embedding", "doc_id")
        .ingestNearDup(b.select("doc_id", "embedding"), 0.95),
      "doc_id", "text", s"$tmp/out", s"$tmp/ckpt",
      afterBatch = { id =>
        if (id == 0) IvfMorIndexStore.open(spark, root, "embedding", "doc_id")
          .retrain(Array(deg(0)))
      },
      indexVersion = () => IvfMorIndexStore.currentVersion(spark, root))
    val out = spark.read.parquet(s"$tmp/out")
    def stageIds(b: Long, stage: Int): Set[Long] =
      out.filter(col("batch") === b && col("stage") === stage)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    // both docs clear the text gates
    assert(stageIds(0, 1) == Set(201L) && stageIds(1, 1) == Set(202L))
    // batch A: v admitted under the OLD 3-cell geometry (cross-cell
    // 0.985-neighbor u is invisible to the same-cell screen)
    assert(stageIds(0, 2) == Set(201L))
    // batch B: w REJECTED — the k=1 retrain took effect at this tick
    assert(stageIds(1, 2) == Set.empty)
    // every stage row is stamped with the geometry that gated it
    val vByBatch = out.select("batch", "index_v").distinct()
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(vByBatch == Map(0L -> 1, 1L -> 2), s"index_v stamps: $vByBatch")
    // and the migrated store holds u, v in the single new cell
    val state = IvfMorIndexStore.open(spark, root, "embedding", "doc_id")
      .read.get.select("doc_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(state == Map(100L -> 0, 201L -> 0))
  }
}
