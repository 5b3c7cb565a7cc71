package graft

import graft.llm.{IvfMorIndexStore, MinhashIndexStore, Pq, QualityLr, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 soak: measured scale evidence for the round's operators.
  *
  *  1. PQ codebook retrain ladder — retrainBooks is one O(index) pass
  *     whose snapshot commit also RESETS segment fan-in; measured at
  *     5k and 50k vectors with a zero-stale-codes scan assert.
  *  2. Books-retrain longevity — 10 alternating book migrations
  *     interleaved with re-embed mutations; end state ADC-equal to a
  *     from-scratch build (migrations compose with maintenance).
  *  3. Curation-funnel corpus ladder — the composed ingest door drains
  *     an IDENTICAL feed against a 1× and a 10× pre-admitted corpus;
  *     per-tick wall should follow the narrow signature scan, not
  *     corpus text bytes.
  *  4. Versioned-gate overhead — the hot-swappable drain vs the frozen
  *     drain on an identical 10-tick feed; the delta is the per-tick
  *     model re-open cost (one tiny driver-side file read).
  *
  * Run: `sbt "Test/runMain graft.R16SoakMain [1|2|3|4|all]"`.
  */
object R16SoakMain {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("all")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-r16-soak")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (which == "1" || which == "all") booksRetrainLadder(spark)
    if (which == "2" || which == "all") booksRetrainLongevity(spark, 10)
    if (which == "3" || which == "all") funnelCorpusLadder(spark)
    if (which == "4" || which == "all") versionedGateOverhead(spark)
    spark.stop()
  }

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Count of stored rows whose pq_codes differ from a fresh encode
    * under `books` — the corruption detector for a re-encode pass. */
  private def staleCodes(h: IvfMorIndexStore, books: Pq.Codebooks): Long =
    h.read.get.filter(
      col("pq_codes") =!= Pq.encode(col("embedding"), books)).count()

  private def booksRetrainLadder(spark: SparkSession): Unit = {
    val tenx = "/dev/shm/graft_soak10x"
    val hunx = "/dev/shm/graft_soak100x"
    Soak.generate(spark, "/root/testdata/sf0.001", tenx, 10)
    Soak.generate(spark, "/root/testdata/sf0.001", hunx, 100)
    val r = new scala.util.Random(7)
    val c32 = Array.fill(32)(Array.fill(64)(r.nextGaussian().toFloat))
    for (dir <- Seq(tenx, hunx)) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding")).localCheckpoint(false)
      val n = emb.count()
      val b0 = Pq.trainCodebooks(emb, "embedding", "vec_id", m = 8, ksub = 16)
      val b1 = Pq.trainCodebooks(emb.filter(col("vec_id") % 7 =!= 0),
        "embedding", "vec_id", m = 8, ksub = 16)
      val root = java.nio.file.Files.createTempDirectory("r16bl").toString + "/idx"
      val ivf = new IvfMorIndexStore(spark, root, "embedding", "vec_id",
        c32, Some(b0))
      // build in 4 appends so the pre-retrain store has real segment
      // fan-in for the snapshot to reset
      val (_, tBuild) = time(
        (0 until 4).foreach(k => ivf.upsert(emb.filter(col("vec_id") % 4 === k))))
      val segsBefore = ivf.segmentCounts._1
      val (migrated, tRetrain) = time(ivf.retrainBooks(b1))
      val segsAfter = migrated.segmentCounts._1
      val stale = staleCodes(migrated, b1)
      val nAfter = migrated.read.get.count()
      println(f"[r16-soak] books retrain $n%6d vectors: build ${tBuild}%6.2f s, " +
        f"retrainBooks ${tRetrain}%6.2f s, rows $nAfter, stale codes $stale, " +
        f"cell segments $segsBefore -> $segsAfter")
      require(stale == 0 && nAfter == n)
    }
  }

  private def booksRetrainLongevity(spark: SparkSession, cycles: Int): Unit = {
    val tenx = "/dev/shm/graft_soak10x"
    Soak.generate(spark, "/root/testdata/sf0.001", tenx, 10)
    val base = spark.read.parquet(s"$tenx/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint(false)
    val r = new scala.util.Random(13)
    val c16 = Array.fill(16)(Array.fill(64)(r.nextGaussian().toFloat))
    val bA = Pq.trainCodebooks(base, "embedding", "vec_id", m = 8, ksub = 16)
    val bB = Pq.trainCodebooks(base.filter(col("vec_id") % 3 =!= 0),
      "embedding", "vec_id", m = 8, ksub = 16)
    val root = java.nio.file.Files.createTempDirectory("r16bg").toString + "/idx"
    var handle = new IvfMorIndexStore(spark, root, "embedding", "vec_id",
      c16, Some(bA))
    handle.upsert(base)
    var cur = base
    val dim = 64
    var maxWall = 0.0
    (1 to cycles).foreach { t =>
      // drift between migrations: one residue slice re-embedded
      val rot = t % dim
      val slice = cur.filter(pmod(col("vec_id"), lit(13)) === t % 13)
        .withColumn("embedding",
          concat(org.apache.spark.sql.functions.slice(col("embedding"), rot + 1, dim - rot),
            org.apache.spark.sql.functions.slice(col("embedding"), 1, rot)))
        .localCheckpoint(false)
      handle.upsert(slice)
      cur = cur.join(slice.select(col("vec_id")), Seq("vec_id"), "left_anti")
        .unionByName(slice).localCheckpoint(false)
      val target = if (t % 2 == 1) bB else bA
      val (migrated, w) = time(handle.retrainBooks(target))
      handle = migrated
      maxWall = math.max(maxWall, w)
      val stale = staleCodes(handle, target)
      val n = handle.read.get.count()
      require(stale == 0 && n == 5000, s"tick $t: stale=$stale rows=$n")
      println(f"[r16-soak] books-longevity tick $t%2d: retrainBooks $w%5.2f s, " +
        f"stale 0, segments ${handle.segmentCounts}")
    }
    // end state ≡ from-scratch build over the mutated corpus under the
    // final books: ADC answers byte-equal for several queries
    val finalBooks = if (cycles % 2 == 1) bB else bA
    val fresh = new IvfMorIndexStore(spark,
      java.nio.file.Files.createTempDirectory("r16bf").toString + "/idx",
      "embedding", "vec_id", c16, Some(finalBooks))
    fresh.upsert(cur)
    for (qid <- Seq(7L, 123L, 10000123L)) {
      val q = cur.filter(col("vec_id") === qid)
        .select("embedding").head().getSeq[Float](0).toArray
      val a = handle.topKAdc(q, 10, nprobe = 4).collect().map(_.toSeq).toSeq
      val b = fresh.topKAdc(q, 10, nprobe = 4).collect().map(_.toSeq).toSeq
      require(a == b, s"ADC drift after $cycles book migrations for query $qid")
    }
    println(f"[r16-soak] books-longevity: $cycles migrations + mutations, " +
      f"end ADC ≡ from-scratch build, max retrain wall $maxWall%5.2f s")
  }

  private def funnelCorpusLadder(spark: SparkSession): Unit = {
    import spark.implicits._
    val baseDir = "/root/testdata/sf0.001"
    // BOTH rungs use Soak-generated corpora (x=1 and x=10), so replica
    // 0's r0-tagged docs exist in each — the feed's exact-copy half
    // dups against both corpus sizes identically, and only the
    // signature-scan size varies between the rungs
    val onex = "/dev/shm/graft_soak1x"
    val tenx = "/dev/shm/graft_soak10x"
    Soak.generate(spark, baseDir, onex, 1)
    Soak.generate(spark, baseDir, tenx, 10)
    val r0Docs = spark.read.parquet(s"$onex/documents.parquet")
    val model = QualityLr.train(
      r0Docs.withColumn("__label", when(col("lang") === "en", 1).otherwise(0)),
      "doc_id", "text", "__label")
    val evalSet = r0Docs.filter(col("doc_id") % 10 === 3)
      .select("doc_id", "text").localCheckpoint(false)
    // identical feed against both corpus sizes: half exact copies of
    // replica-0 docs (max candidate-verify load), half novel — only
    // vowel-initial tokens tagged, which breaks enough shingles to
    // stay clear of the dedup threshold (measured pairwise J vs the
    // source: 0.45–0.73, all < 0.8) while leaving most hashed-unigram
    // features intact so the quality gate still admits a real subset
    val feed = r0Docs.filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") + 900000000L).as("doc_id"), col("text"))
      .unionByName(r0Docs.filter(col("doc_id") % 2 === 1)
        .select((col("doc_id") + 950000000L).as("doc_id"),
          // the replica tag prefixes every token with r0 — the vowel
          // test applies to the char after it
          regexp_replace(col("text"), "\\b(r0[aeiou]\\S*)", "f$1").as("text")))
      .localCheckpoint(false)
    // JIT/codegen warmup outside the timed rungs (first-ever drain in
    // the JVM measures ~2× its warm cost)
    locally {
      val tmp = java.nio.file.Files.createTempDirectory("r16fw").toString
      val store = new MinhashIndexStore(spark, s"$tmp/store", "doc_id", "text")
      store.append(r0Docs.limit(50).select("doc_id", "text"))
      feed.limit(50).repartition(1).write.parquet(s"$tmp/feed")
      val stream = spark.readStream
        .schema(spark.read.parquet(s"$tmp/feed").schema).parquet(s"$tmp/feed")
      graft.streaming.StreamOps.curationFunnelDrain(stream, evalSet, model,
        store, "doc_id", "text", s"$tmp/out", s"$tmp/ckpt", qualityThreshold = 0.3)
    }
    for ((dir, tag) <- Seq(onex -> "1x", tenx -> "10x")) {
      val corpus = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text")
      val tmp = java.nio.file.Files.createTempDirectory(s"r16f$tag").toString
      val store = new MinhashIndexStore(spark, s"$tmp/store", "doc_id", "text")
      val (_, tSeed) = time(store.append(corpus))
      feed.filter(col("doc_id") < 925000000L).repartition(1)
        .write.mode("append").parquet(s"$tmp/feed")
      feed.filter(col("doc_id") >= 925000000L).repartition(1)
        .write.mode("append").parquet(s"$tmp/feed")
      val stream = spark.readStream
        .schema(spark.read.parquet(s"$tmp/feed").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$tmp/feed")
      var ticks = List.empty[Double]
      val (_, tDrain) = time(
        graft.streaming.StreamOps.curationFunnelDrain(stream, evalSet, model,
          store, "doc_id", "text", s"$tmp/out", s"$tmp/ckpt",
          // sf0.001-corpus margins top out ~0.41, and the tagged
          // novel half loses ~35% of its weight mass to unseen-token
          // buckets — 0.3 keeps the gate proper (admits copies AND a
          // novel subset, rejects the rest) on this fixture
          qualityThreshold = 0.3,
          onStage = (_, sec) => ticks ::= sec))
      val admitted = spark.read.parquet(s"$tmp/out")
        .filter(col("stage") === 2).count()
      println(f"[r16-soak] funnel corpus $tag: seed ${tSeed}%6.2f s, " +
        f"drain ${tDrain}%6.2f s (ticks ${ticks.reverse.map(t => f"$t%.2f").mkString("/")}), " +
        f"admitted $admitted")
    }
  }

  private def versionedGateOverhead(spark: SparkSession): Unit = {
    val baseDir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$baseDir/documents.parquet")
      .withColumn("__label", when(col("lang") === "en", 1).otherwise(0))
    val model = QualityLr.train(docs, "doc_id", "text", "__label")
    def feedDir(): String = {
      val tmp = java.nio.file.Files.createTempDirectory("r16v").toString
      (0 until 10).foreach(k => docs.filter(col("doc_id") % 10 === k)
        .select("doc_id", "text").repartition(1)
        .write.mode("append").parquet(s"$tmp/feed"))
      tmp
    }
    def stream(tmp: String) = spark.readStream
      .schema(spark.read.parquet(s"$tmp/feed").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/feed")
    // warmup drain (JIT) outside the timed pair
    locally {
      val t = feedDir()
      graft.streaming.StreamOps.qualityGateDrain(stream(t), model,
        "doc_id", "text", s"$t/adm", s"$t/ckpt", threshold = 0.4)
    }
    val tF = feedDir()
    val (_, frozen) = time(graft.streaming.StreamOps.qualityGateDrain(
      stream(tF), model, "doc_id", "text", s"$tF/adm", s"$tF/ckpt", threshold = 0.4))
    val tV = feedDir()
    val store = new QualityLr.ModelStore(spark, s"$tV/models")
    store.publish(model)
    val (_, versioned) = time(graft.streaming.StreamOps.qualityGateDrainVersioned(
      stream(tV), store, "doc_id", "text", s"$tV/adm", s"$tV/ckpt", threshold = 0.4))
    println(f"[r16-soak] 10-tick quality gate: frozen $frozen%5.2f s, " +
      f"versioned $versioned%5.2f s, per-tick reload overhead " +
      f"${(versioned - frozen) / 10 * 1000}%6.1f ms")
  }
}
