package graft

import graft.llm.{IvfMorIndexStore, Multimodal, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-18 soak: measured scale evidence for the round's operators.
  *
  *  1. Mid-drain retrain ladder — the reindex door's `afterBatch`
  *     retrain (IvfMorIndexStore.open → retrain) measured at 10× and
  *     100× index size, bracketed by per-tick ingestNearDup walls, so
  *     the hot-swap leg has the same ladder evidence as its siblings.
  *     The retrain wall now INCLUDES the post-flip catch-up pass (a
  *     second O(index) read — the price of never stalling a pinned
  *     door on the intent marker); the ladder shows both rungs and the
  *     flat tick cost around them.
  *  2. Perceptual-hash dedup ladder — the dedup_phash pipeline
  *     (synthetic PNG gen → guarded decode + integer thumbnail hash →
  *     banded Hamming pairs) at 1× and 10× document count; wall should
  *     scale with the corpus (per-image decode dominates), never
  *     quadratically (banding, not all-pairs).
  *  3. Video content-dedup ladder — the temporal-envelope fingerprint
  *     (dedup_video_fp) and embedded-clip vote (dedup_video_clip)
  *     pipelines at 1× and 10×; per-video Y4M decode dominates, the
  *     pair stages are banded / hash-keyed.
  *  4. ClipIndexStore tick ladder — a FIXED candidate batch probed
  *     against a 1× and a 10× stored frame index; plants must stay
  *     exactly detected at both rungs.
  *
  * Run: `sbt "Test/runMain graft.R18SoakMain [1|2|3|4|all]"`.
  */
object R18SoakMain {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("all")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-r18-soak")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (which == "1" || which == "all") retrainLadder(spark)
    if (which == "2" || which == "all") phashLadder(spark)
    if (which == "3" || which == "all") videoLadder(spark)
    if (which == "4" || which == "all") clipStoreLadder(spark)
    spark.stop()
  }

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Rotate each embedding's components by `rot` — novel vectors with
    * the corpus's scale/shape (the r16 drift trick). */
  private def rotated(df: org.apache.spark.sql.DataFrame, rot: Int, dim: Int) =
    df.withColumn("embedding",
      concat(slice(col("embedding"), rot + 1, dim - rot),
        slice(col("embedding"), 1, rot)))

  private def retrainLadder(spark: SparkSession): Unit = {
    val tenx = "/dev/shm/graft_soak10x"
    val hunx = "/dev/shm/graft_soak100x"
    Soak.generate(spark, "/root/testdata/sf0.001", tenx, 10)
    Soak.generate(spark, "/root/testdata/sf0.001", hunx, 100)
    // JVM warmup outside the timed rungs (first-op cost is ~2× warm)
    val warm = new IvfMorIndexStore(spark,
      java.nio.file.Files.createTempDirectory("r18w").toString + "/idx",
      "embedding", "vec_id",
      Array.fill(2)(Array.fill(64)(scala.util.Random.nextGaussian().toFloat)))
    warm.upsert(spark.read.parquet(s"$tenx/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).limit(100))
    for (dir <- Seq(tenx, hunx)) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding")).localCheckpoint(false)
      val n = emb.count()
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      val k8 = Similarity.ivfCentroids(emb, "embedding", "vec_id", k = 8)
      val k4 = Similarity.ivfCentroids(emb, "embedding", "vec_id", k = 4)
      val root = java.nio.file.Files.createTempDirectory("r18rl").toString + "/idx"
      val ivf = new IvfMorIndexStore(spark, root, "embedding", "vec_id", k8)
      val (_, tBuild) = time(ivf.upsert(emb))
      // a door tick before the retrain (reopen-per-tick, k=8 geometry)
      val b1 = rotated(emb.filter(col("vec_id") % 97 === 0), 7, dim)
        .withColumn("vec_id", col("vec_id") + 1000000L).localCheckpoint(false)
      val (_, tTickBefore) = time(
        IvfMorIndexStore.openPinned(spark, root, "embedding", "vec_id")
          .ingestNearDup(b1, 0.95).count())
      // THE mid-drain retrain — exactly the reindex door's afterBatch
      // call; wall includes the post-flip catch-up pass
      val (_, tRetrain) = time(
        IvfMorIndexStore.open(spark, root, "embedding", "vec_id").retrain(k4))
      // a door tick after: the next reopen gates under k=4
      val b2 = rotated(emb.filter(col("vec_id") % 89 === 0), 11, dim)
        .withColumn("vec_id", col("vec_id") + 2000000L).localCheckpoint(false)
      val (_, tTickAfter) = time(
        IvfMorIndexStore.openPinned(spark, root, "embedding", "vec_id")
          .ingestNearDup(b2, 0.95).count())
      // consistency: every stored row resides in its k=4 cell
      val h = IvfMorIndexStore.open(spark, root, "embedding", "vec_id")
      val misplaced = h.read.get
        .filter(Similarity.cellOf(col("embedding"), k4) =!= col("cell")).count()
      require(misplaced == 0, s"$misplaced rows misplaced after retrain")
      require(IvfMorIndexStore.currentVersion(spark, root).contains(2))
      println(f"[r18-soak] reindex ladder $n%6d vectors: build $tBuild%6.2f s, " +
        f"tick-before $tTickBefore%5.2f s, mid-drain retrain $tRetrain%6.2f s, " +
        f"tick-after $tTickAfter%5.2f s, misplaced 0")
    }
  }

  private def phashLadder(spark: SparkSession): Unit = {
    val tenx = "/dev/shm/graft_soak10x"
    Soak.generate(spark, "/root/testdata/sf0.001", tenx, 10)
    for ((dir, label) <- Seq(("/root/testdata/sf0.001", "1x"), (tenx, "10x"))) {
      val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id")
      val n = docs.count()
      val seeds = docs.select(col("doc_id"),
        concat(lit("img:"),
          when(col("doc_id") % 10 === 7, col("doc_id") - 7)
            .when(col("doc_id") % 10 === 4, col("doc_id") - 2)
            .otherwise(col("doc_id")).cast("string")).as("seed"),
        (col("doc_id") % 10 === 7).as("pert"))
      val (media, tGen) = time(Multimodal.syntheticGrayMedia(
        spark, seeds, "doc_id", "seed", "pert", 16, 16).localCheckpoint(false))
      val (hashed, tHash) = time(Multimodal.imagePhash(spark, media, grid = 8)
        .toDF().filter(col("ok"))
        .select(col("media_id").as("doc_id"), col("ahash").as("simhash"))
        .localCheckpoint(false))
      val (pairs, tPairs) = time(graft.llm.Dedup
        .simhashPairsFromSignatures(hashed, "doc_id", maxHamming = 3,
          bits = 64, blocks = 6).count())
      println(f"[r18-soak] phash ladder $label%3s ($n%5d docs): gen $tGen%5.2f s, " +
        f"hash $tHash%5.2f s, banded pairs $tPairs%5.2f s, pairs $pairs")
    }
  }

  /** 3. Video content-dedup ladder — BOTH video legs at 1× and 10×
    * document count: the temporal-envelope fingerprint pipeline
    * (dedup_video_fp: Y4M gen → luma decode + envelope hash → banded
    * Hamming pairs) and the embedded-clip vote (dedup_video_clip:
    * per-frame aHash → inverted-index join → (pair, offset) cells).
    * Per-video decode dominates both; the pair stages are banded /
    * hash-keyed, so the walls should scale with the corpus, never
    * quadratically. */
  private def videoLadder(spark: SparkSession): Unit = {
    val tenx = "/dev/shm/graft_soak10x"
    Soak.generate(spark, "/root/testdata/sf0.001", tenx, 10)
    for ((dir, label) <- Seq(("/root/testdata/sf0.001", "1x"), (tenx, "10x"))) {
      val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id")
      val n = docs.count()
      // dedup_video_fp's exact fixture and pipeline
      val fpSeeds = docs.select(col("doc_id"),
        concat(lit("vid:"),
          when(col("doc_id") % 10 === 5, col("doc_id") - 5)
            .when(col("doc_id") % 10 === 8, col("doc_id") - 6)
            .otherwise(col("doc_id")).cast("string")).as("seed"),
        lit(0L).as("off"), (col("doc_id") % 10 === 5).as("pert"))
      val (fpMedia, tGenFp) = time(Multimodal.syntheticY4m(
        spark, fpSeeds, "doc_id", "seed", "off", "pert", 4, 4, 64)
        .localCheckpoint(false))
      val (fp, tFp) = time(Multimodal.videoFingerprint(spark, fpMedia, blocks = 64)
        .toDF().filter(col("ok"))
        .select(col("media_id").as("doc_id"), col("vfp").as("simhash"))
        .localCheckpoint(false))
      val (fpPairs, tFpPairs) = time(graft.llm.Dedup
        .simhashPairsFromSignatures(fp, "doc_id", maxHamming = 3,
          bits = 64, blocks = 6).count())
      // dedup_video_clip's exact fixture and pipeline
      val clipSeeds = docs.select(col("doc_id"),
        concat(lit("vidc:"),
          when(col("doc_id") % 10 === 2, col("doc_id") - 2)
            .otherwise(col("doc_id")).cast("string")).as("seed"),
        when(col("doc_id") % 10 === 2, lit(7L)).otherwise(lit(0L)).as("off"),
        lit(false).as("pert"))
      val (clipMedia, tGenClip) = time(Multimodal.syntheticY4m(
        spark, clipSeeds, "doc_id", "seed", "off", "pert", 8, 8, 24)
        .localCheckpoint(false))
      val (frames, tFrames) = time(Multimodal.videoFramePhash(
        spark, clipMedia, grid = 8).toDF().localCheckpoint(false))
      val (clips, tClips) = time(graft.llm.Dedup.frameClipPairs(
        frames, "media_id", "frame_index", "fhash",
        minFrames = 8, maxHashDf = 64).count())
      println(f"[r18-soak] video ladder $label%3s ($n%5d docs): " +
        f"fp gen $tGenFp%5.2f s + hash $tFp%5.2f s + pairs $tFpPairs%5.2f s ($fpPairs pairs); " +
        f"clip gen $tGenClip%5.2f s + frame-hash $tFrames%5.2f s + vote $tClips%5.2f s ($clips clips)")
    }
  }

  /** 4. ClipIndexStore tick ladder — the streaming clip store's per-tick
    * probe/ingest wall for a FIXED candidate batch against a 1× and a
    * 10× stored frame index (the [[graft.llm.MinhashIndexStore]] soak's
    * video twin): the probe is a narrow stored-frame scan with the
    * batch broadcast, so the tick should track the index scan linearly
    * at worst — never quadratically — and the planted clips must stay
    * exactly detected at both rungs. */
  private def clipStoreLadder(spark: SparkSession): Unit = {
    import graft.llm.ClipIndexStore
    val tenx = "/dev/shm/graft_soak10x"
    Soak.generate(spark, "/root/testdata/sf0.001", tenx, 10)
    for ((dir, label) <- Seq(("/root/testdata/sf0.001", "1x"), (tenx, "10x"))) {
      val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id")
      val n = docs.count()
      val corpusSeeds = docs.select(col("doc_id"),
        concat(lit("vcs:"), col("doc_id").cast("string")).as("seed"),
        lit(0L).as("off"), lit(false).as("pert"))
      def framesOf(seeds: org.apache.spark.sql.DataFrame) =
        Multimodal.videoFramePhash(spark,
            Multimodal.syntheticY4m(spark, seeds, "doc_id", "seed", "off",
              "pert", 8, 8, 24), grid = 8)
          .toDF().select(col("media_id").as("vid_id"),
            col("frame_index").cast("long").as("f"), col("fhash"))
      val root = java.nio.file.Files.createTempDirectory("r18cs").toString + "/idx"
      val store = new ClipIndexStore(spark, root, "vid_id", "f", "fhash",
        minFrames = 8, maxHashDf = 64)
      val (_, tBuild) = time(store.append(framesOf(corpusSeeds)))
      // FIXED 100-video batch regardless of rung: half planted clips of
      // corpus videos 0..49 (offset 7), half novel
      val batchSeeds = spark.range(100).select(
        (col("id") + 9000000L).as("doc_id"),
        when(col("id") < 50, concat(lit("vcs:"), col("id").cast("string")))
          .otherwise(concat(lit("novel:"), col("id").cast("string"))).as("seed"),
        when(col("id") < 50, lit(7L)).otherwise(lit(0L)).as("off"),
        lit(false).as("pert"))
      val batch = framesOf(batchSeeds).localCheckpoint(false)
      val (admitted, tTick) = time(
        store.ingest(batch).select("vid_id").distinct().count())
      require(admitted == 50, s"$label: expected 50 novel survivors, got $admitted")
      println(f"[r18-soak] clip-store ladder $label%3s ($n%5d stored videos, " +
        f"${n * 24}%6d frame rows): build $tBuild%5.2f s, " +
        f"fixed-batch tick $tTick%5.2f s (50/100 admitted — all 50 clips caught)")
    }
  }
}
