package graft

import graft.llm.{IvfIndexStore, IvfMorIndexStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 soak: the IVF-MOR write-amplification DECADE proof.
  *
  * r14 measured one point: an identical hash-spread re-embed tick
  * wrote 4.1× fewer gross bytes through the MOR store than the CoW
  * store on a 400-vector index, with the claim that the gap grows
  * linearly in index size because CoW is O(touched cells' bytes) and
  * MOR is O(batch). One point can't carry a linear claim — this main
  * measures the SAME fixed-size batch (40 vectors, hash-spread so it
  * touches essentially every cell) against 400 / 4,000 / 20,000-vector
  * indexes and prints the ratio ladder for the SCALE_SOAK addendum.
  * Gross bytes come from task output metrics (the spec's exact
  * harness), not dir sizes, so compaction-reclaimed bytes still count.
  *
  * Run: `sbt "Test/runMain graft.R15SoakMain"`.
  */
object R15SoakMain {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("all")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-r15-soak")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (which == "1" || which == "all") writeAmpDecade(spark, args.drop(1))
    if (which == "2" || which == "all") intervalJoinAttribution(spark)
    if (which == "3" || which == "all") newOperatorScale(spark)
    if (which == "4" || which == "all") retrainLongevity(spark, 20)
    spark.stop()
  }

  /** Retrain LONGEVITY: a production index doesn't migrate once — it
    * re-trains on a cadence as the embedding distribution drifts. 20
    * alternating retrains (k=32 ⇄ k=16) over a 5k-vector store, a
    * re-embed mutation batch upserted between each pair, a probe every
    * tick. Asserts after EVERY migration that no residence is
    * misplaced and rows are preserved, and at the end that the store
    * state equals a from-scratch build over the mutated corpus —
    * migrations must compose with maintenance indefinitely, not just
    * survive one pass. */
  private def retrainLongevity(spark: SparkSession, cycles: Int): Unit = {
    val tenx = "/dev/shm/graft_soak10x"
    Soak.generate(spark, "/root/testdata/sf0.001", tenx, 10)
    val base = spark.read.parquet(s"$tenx/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint(false)
    val r = new scala.util.Random(11)
    val cA = Array.fill(32)(Array.fill(64)(r.nextGaussian().toFloat))
    val cB = Array.fill(16)(Array.fill(64)(r.nextGaussian().toFloat))
    val root = java.nio.file.Files.createTempDirectory("r15rl").toString + "/idx"
    var handle = new graft.llm.IvfMorIndexStore(spark, root, "embedding", "vec_id", cA)
    handle.upsert(base)
    var cur = base
    val dim = 64
    var maxSegs = 0
    (1 to cycles).foreach { t =>
      // drift: one residue slice re-embedded with a tick-dependent rotation
      val rot = t % dim
      val slice = cur.filter(pmod(col("vec_id"), lit(17)) === t % 17)
        .withColumn("embedding",
          concat(org.apache.spark.sql.functions.slice(col("embedding"), rot + 1, dim - rot),
            org.apache.spark.sql.functions.slice(col("embedding"), 1, rot)))
        .localCheckpoint(false)
      handle.upsert(slice)
      cur = cur.join(slice.select(col("vec_id")), Seq("vec_id"), "left_anti")
        .unionByName(slice).localCheckpoint(false)
      val target = if (t % 2 == 1) cB else cA
      val (migrated, w) = time(handle.retrain(target))
      handle = migrated
      val misplaced = handle.read.get
        .filter(graft.llm.Similarity.cellOf(col("embedding"), target) =!= col("cell"))
        .count()
      val n = handle.read.get.count()
      require(misplaced == 0 && n == 5000, s"tick $t: misplaced=$misplaced rows=$n")
      val segs = handle.segmentCounts
      maxSegs = math.max(maxSegs, math.max(segs._1, segs._2))
      val q = base.filter(col("vec_id") === 7L)
        .select("embedding").head().getSeq[Float](0).toArray
      val probed = handle.topK(q, 10, nprobe = 2).count()
      if (t % 5 == 0)
        println(f"[r15-rl] tick $t%2d: retrain ${w}%5.2f s, segs $segs, probe rows $probed")
    }
    // end-state exactness: the migrated+mutated store ≡ a fresh build
    val finalCents = if (cycles % 2 == 1) cB else cA
    val want = graft.llm.Similarity.buildIvfIndex(cur, "embedding", finalCents)
      .select(col("vec_id"), col("cell"))
    val got = handle.read.get.select(col("vec_id"), col("cell"))
    val drift = got.exceptAll(want).count() + want.exceptAll(got).count()
    println(s"[r15-rl] after $cycles retrains + ${cycles} mutation batches: " +
      s"exceptAll drift $drift, max segment fan-in $maxSegs")
    require(drift == 0, "store diverged from the from-scratch build")
  }

  /** Scale evidence for the round's NEW operators: trained-classifier
    * train+score walls at 1× and 10× docs (expect ~linear — the corpus
    * is touched once per gradient round through two partial+final
    * aggregates), and a full centroid RETRAIN of a 20k-vector MOR index
    * (one O(index) pass; equality asserted against a fresh build). */
  private def newOperatorScale(spark: SparkSession): Unit = {
    val base = "/root/testdata/sf0.001"
    val tenx = "/dev/shm/graft_soak10x"
    val hunx = "/dev/shm/graft_soak100x"
    Soak.generate(spark, base, tenx, 10)
    Soak.generate(spark, base, hunx, 100)
    def docs(dir: String) = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("__label", when(col("lang") === "en", 1).otherwise(0))
    // JIT/codegen warmup OUTSIDE the timed ladder (the first training
    // ever run in the JVM measured 2x its warm cost)
    graft.llm.QualityLr.train(docs(base).limit(50), "doc_id", "text", "__label")
    for (dir <- Seq(base, tenx, hunx)) {
      val d = docs(dir).localCheckpoint(false)
      val n = d.count()
      val (model, tTrain) = time(
        graft.llm.QualityLr.train(d, "doc_id", "text", "__label"))
      val (nScored, tScore) = time(
        graft.llm.QualityLr.score(d, "doc_id", "text", model).count())
      println(f"[r15-new] classifier $n%6d docs: train ${tTrain}%6.2f s, " +
        f"score ${tScore}%5.2f s ($nScored scored)")
    }
    // 50k-vector retrain: k=32 → k=16 in one pass
    val emb = spark.read.parquet(s"$hunx/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint(false)
    val r = new scala.util.Random(5)
    val c32 = Array.fill(32)(Array.fill(64)(r.nextGaussian().toFloat))
    val c16 = Array.fill(16)(Array.fill(64)(r.nextGaussian().toFloat))
    val root = java.nio.file.Files.createTempDirectory("r15rt").toString + "/idx"
    val ivf = new graft.llm.IvfMorIndexStore(spark, root, "embedding", "vec_id", c32)
    val (_, tBuild) = time(ivf.upsert(emb))
    val (migrated, tRetrain) = time(ivf.retrain(c16))
    val nAfter = migrated.read.get.count()
    val misplaced = migrated.read.get
      .filter(graft.llm.Similarity.cellOf(col("embedding"), c16) =!= col("cell")).count()
    println(f"[r15-new] MOR retrain ${emb.count()} vectors k=32→16: build ${tBuild}%6.2f s, " +
      f"retrain ${tRetrain}%6.2f s, rows $nAfter, misplaced $misplaced")
  }

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def writeAmpDecade(spark: SparkSession, rest: Seq[String]): Unit = {
    val sizes = if (rest.isEmpty) Seq(400, 4000, 20000) else rest.map(_.toInt)
    val rows = sizes.map(n => measureTick(spark, n))
    println("\n[r15-soak] MOR vs CoW gross bytes, IDENTICAL 40-vector hash-spread re-embed tick:")
    println(f"${"index"}%8s ${"MOR B"}%10s ${"CoW B"}%10s ${"ratio"}%7s")
    rows.foreach { case (n, mor, cow) =>
      println(f"$n%8d $mor%10d $cow%10d ${cow.toDouble / mor}%7.1f")
    }
    val first = rows.head; val last = rows.last
    val growth = (last._3.toDouble / last._2) / (first._3.toDouble / first._2)
    println(f"[r15-soak] ratio growth across ${last._1 / first._1}x index: ${growth}%.1fx " +
      "(linear-in-index-size claim predicts ~the index growth factor)")
  }

  /** VERDICT r14 item 4: where does a stateful drain's wall go when
    * STAGE_TIMINGS shows ~0.4 s of jobs inside a ~6 s pass? Rebuild the
    * stream_interval_join fixture EXACTLY (sf0.1 events → 3-file view +
    * purchase feeds, maxFilesPerTrigger=1, 8 shuffle partitions) and
    * drain it under each knob, counting micro-batches, jobs, summed
    * job wall, and total wall. Knobs: HDFS vs RocksDB state store,
    * state-partition count (a stream-stream join commits 4 state
    * stores × partitions per micro-batch), and files/trigger (batch
    * count — pure fixed-cost leverage, printed for attribution only
    * since the bench query's any-split contract keeps 1 file/trigger). */
  private def intervalJoinAttribution(spark: SparkSession): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tmp = java.nio.file.Files.createTempDirectory("r15ij").toString
    val ev = Tables.events(spark, d)
    ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"))
      .repartition(3).write.parquet(s"$tmp/views")
    ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"), col("value").as("purchase_value"))
      .repartition(3).write.parquet(s"$tmp/purchases")

    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val jobNanos = new java.util.concurrent.atomic.AtomicLong()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        { starts.put(js.jobId, java.lang.Long.valueOf(js.time)); () }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s0 = starts.remove(je.jobId)
        if (s0 != null) { jobs.incrementAndGet(); jobNanos.addAndGet((je.time - s0) * 1000000L) }
      }
    }

    def drain(tag: String, partitions: Int, provider: Option[String],
              filesPerTrigger: Int): Unit = {
      val prevPart = spark.conf.get("spark.sql.shuffle.partitions")
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val prevProv = spark.conf.getOption(provKey)
      spark.conf.set("spark.sql.shuffle.partitions", partitions)
      provider.foreach(spark.conf.set(provKey, _))
      spark.sparkContext.addSparkListener(l)
      try {
        jobs.set(0); jobNanos.set(0)
        val t0 = System.nanoTime()
        def feed(sub: String) = spark.readStream
          .schema(spark.read.parquet(s"$tmp/$sub").schema)
          .option("maxFilesPerTrigger", filesPerTrigger.toString).parquet(s"$tmp/$sub")
        val joined = graft.streaming.StreamOps.intervalJoin(
          feed("views"), feed("purchases"),
          leftTs = "view_ts", rightTs = "purchase_ts", keys = Seq("user_id"),
          within = "6 hours", lateness = "3650 days")
        val outName = "r15ij_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val q = joined.writeStream.format("memory").queryName(outName)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // listener bus drain
        val batches = q.recentProgress.length
        val rows = spark.table(outName).count()
        println(f"[r15-ij] $tag%-34s wall ${wall}%6.2f s  jobs ${jobs.get()}%4d  " +
          f"jobWall ${jobNanos.get() / 1e9}%5.2f s  microbatches $batches%3d  rows $rows")
      } catch { case e: Throwable =>
        println(s"[r15-ij] $tag FAILED: ${e.getClass.getSimpleName} ${e.getMessage}")
      } finally {
        spark.sparkContext.removeSparkListener(l)
        spark.conf.set("spark.sql.shuffle.partitions", prevPart)
        prevProv.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
      }
    }

    val rocks = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    (1 to 3).foreach { pass =>
      println(s"[r15-ij] pass $pass")
      drain("A baseline hdfs p=8 f=1", 8, None, 1)
      drain("B rocksdb  p=8 f=1", 8, Some(rocks), 1)
      drain("C hdfs     p=2 f=1", 2, None, 1)
      drain("D hdfs     p=8 f=3 (2 batches)", 8, None, 3)
    }
  }

  /** Deterministic clustered corpus (the IvfMorIndexStoreSpec shape,
    * scaled): n vectors of dim 16 around 8 anchor directions. */
  private def corpus(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val r = new scala.util.Random(31)
    val centers = Array.fill(8)(Array.fill(16)(r.nextGaussian()))
    (0L until n.toLong).map { i =>
      val c = centers((i % 8).toInt)
      i -> c.map(x => (x + r.nextGaussian() * 0.05).toFloat)
    }.toDF("vec_id", "embedding")
  }

  /** Gross task-output bytes for the SAME 40-vector re-embed tick on an
    * n-vector index, (n, morBytes, cowBytes). k=32 cells so the
    * hash-spread batch touches essentially all of them. */
  def measureTick(spark: SparkSession, n: Int): (Int, Long, Long) = {
    val full = corpus(spark, n).localCheckpoint(false)
    val r = new scala.util.Random(77)
    val centroids = Array.fill(32)(Array.fill(16)(r.nextGaussian().toFloat))
    def root() = java.nio.file.Files.createTempDirectory("r15amp").toString + "/idx"
    val mor = new IvfMorIndexStore(spark, root(), "embedding", "vec_id", centroids)
    val cow = new IvfIndexStore(spark, root(), "embedding", "vec_id",
      centroids, idIndex = true)
    mor.upsert(full); cow.append(full)
    // FIXED batch: 40 ids strided across the corpus (hash-spread over
    // cells), re-embedded as negations so most move cells
    val batch = full.filter(col("vec_id") % lit(math.max(n / 40, 1)) === 0)
      .limit(40)
      .withColumn("embedding", transform(col("embedding"), x => -x))
      .localCheckpoint(false)
    val written = new java.util.concurrent.atomic.AtomicLong()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          { written.addAndGet(te.taskMetrics.outputMetrics.bytesWritten); () }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      written.set(0); mor.upsert(batch); Thread.sleep(400)
      val morB = written.get()
      written.set(0); cow.upsertEmbeddings(batch); Thread.sleep(400)
      (n, morB, written.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
