package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{JoinView, ManifestStore, MorStore}
import graft.schema.TableConfig

/** Round-14 soak driver (SCALE_SOAK protocol): JOIN-VIEW LONGEVITY —
  * the production centerpiece's last unmeasured scale claim.
  *
  * 100 consecutive [[JoinView.maintainMulti]] ticks over a 10× fact
  * (1M events ⟕ user dim ⟕ event-type dim), with:
  *   - per-tick fact CDC (a ~2k-row restatement concentrated on the
  *     tick's hot buckets — the hot-partition CDC shape),
  *   - a hash-spread dim update every 7th tick (the mass-propagation
  *     path: changed dim keys re-join their referencing fact slice),
  *   - fact DELETES every 10th tick (tombstone path through
  *     applyDelta),
  *   - a full view read every 10th tick (read amplification under the
  *     accumulated segment state).
  *
  * Claims under test (VERDICT r13 item 1):
  *   1. tick wall stays FLAT — drift (last-10 / first-10) ≈ 1;
  *   2. view segment fan-in stays BOUNDED — compaction saw-tooths,
  *      never trends (the r14 fix: maintainMulti now runs
  *      MorStore.compactHot after every delta-bearing fold);
  *   3. the view equals the from-scratch fact ⟕ dims recompute after
  *      all 100 ticks (exactness survives compaction + tombstones).
  *
  * Usage: sbt "Test/runMain graft.R14SoakMain [ticks]"
  */
object R14SoakMain {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("all")
    val nTicks = args.drop(1).headOption.map(_.toInt)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-r14-soak")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (which == "1" || which == "all") joinViewLongevity(spark, nTicks.getOrElse(100))
    if (which == "2" || which == "all") ivfLongevity(spark, nTicks.getOrElse(50))
    spark.stop()
  }

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def joinViewLongevity(spark: SparkSession, nTicks: Int): Unit = {
    val replicaDir = "/dev/shm/graft_soak10x"
    Soak.generate(spark, "/root/testdata/sf0.1", replicaDir, 10)
    val events = spark.read.parquet(s"$replicaDir/events.parquet")
      .withColumn("bucket", pmod(col("event_id"), lit(16L)))
      .localCheckpoint(false)
    val nRows = events.count()

    // dims: users with synthetic attributes (broadcast-size, hash-spread
    // over 8 partitions) + the tiny event-type dim
    val users = events.select(col("user_id")).distinct()
      .withColumn("cohort", concat(lit("c"), pmod(col("user_id"), lit(20L))))
      .withColumn("udp", pmod(col("user_id"), lit(8L)))
      .localCheckpoint(false)
    val nUsers = users.count()
    val types = events.select(col("event_type")).distinct()
      .withColumn("type_rank", length(col("event_type")).cast("long"))
      .withColumn("tdp", lit(0L))
      .localCheckpoint(false)

    val t = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "jv_soak").toString
    val factCfg = TableConfig("soak.fact", null, Seq("event_id"), cursorField = Some("ts"))
    val dimACfg = TableConfig("soak.users", null, Seq("user_id"))
    val dimBCfg = TableConfig("soak.types", null, Seq("event_type"))
    val fact = new ManifestStore(spark, s"$t/fact", "bucket")
    val dimA = new ManifestStore(spark, s"$t/dimA", "udp")
    val dimB = new ManifestStore(spark, s"$t/dimB", "tdp")
    val view = new MorStore(spark, s"$t/view", "bucket",
      TableConfig("soak.view", null, Seq("event_id")))

    def tick() = JoinView.maintainMulti(spark, s"$t/view", view, fact,
      Seq((dimA, "user_id"), (dimB, "event_type")), Seq("event_id"))

    // bootstrap: full build through the same code path
    fact.upsert(events, factCfg)
    dimA.upsert(users, dimACfg)
    dimB.upsert(types, dimBCfg)
    val (_, bootSec) = time(tick())
    println(f"""{"soak":"join_view_longevity","ticks":$nTicks,"fact_rows":$nRows,"users":$nUsers,"bootstrap_sec":$bootSec%.1f}""")

    var wallFirst10 = 0.0; var wallLast10 = 0.0
    var maxSegs = 0; var compactions = 0; var prevSegs = view.liveSegments
    var deleted = 0L
    for (k <- 0 until nTicks) {
      // fact CDC: restate the k-th residue slice (~nRows/500 rows,
      // concentrated — pmod(event_id,500)=k hits only buckets where
      // bucket ≡ k mod gcd(500,16)=4, i.e. 4 of 16 buckets)
      val cdc = events.filter(pmod(col("event_id"), lit(500L)) === (k % 500).toLong)
        .withColumn("value", col("value") * 1.01)
        .withColumn("ts", col("ts") + expr("INTERVAL 1 HOUR"))
      val (_, sec) = time {
        fact.upsert(cdc, factCfg)
        if (k % 7 == 3) {
          // hash-spread dim update: ~nUsers/64 keys, every dim partition
          dimA.upsert(users.filter(pmod(col("user_id"), lit(64L)) === (k % 64).toLong)
            .withColumn("cohort", concat(lit("u"), lit(k))), dimACfg)
        }
        if (k % 10 == 9) {
          // fact deletes: drop a thin residue of one bucket's partition
          val b = (k / 10 % 16).toLong
          val slice = fact.read.get.filter(col("bucket") === b)
          val victims = slice.filter(pmod(col("event_id"), lit(997L)) === (k % 997).toLong)
          deleted += victims.count()
          fact.replacePartitions(slice.join(victims.select("event_id"),
            Seq("event_id"), "left_anti"), Seq(b.toString))
        }
        tick()
      }
      val segs = view.liveSegments
      // the read-amplification metric proper: the widest single
      // partition's segment list (what one partition-pruned read pays)
      val fanIn = view.latestManifestVersion
        .map(v => view.readManifest(v).values.map(_.size).max).getOrElse(0)
      if (segs < prevSegs) compactions += 1
      prevSegs = segs
      maxSegs = math.max(maxSegs, fanIn)
      if (k < 10) wallFirst10 += sec
      if (k >= nTicks - 10) wallLast10 += sec
      val readNote = if (k % 10 == 9) {
        val (n, rs) = time(view.read.get.count())
        f""","read_sec":$rs%.2f,"view_rows":$n"""
      } else ""
      println(f"""{"tick":$k,"tick_sec":$sec%.2f,"view_segments":$segs,"max_fan_in":$fanIn$readNote}""")
    }
    println(f"""{"soak":"join_view_longevity","first10_sec":$wallFirst10%.1f,"last10_sec":$wallLast10%.1f,"drift":${wallLast10 / wallFirst10}%.2f,"max_partition_fan_in":$maxSegs,"compactions":$compactions,"deleted":$deleted}""")

    // exactness after 100 ticks of CDC + dim updates + deletes + compaction
    val expect = fact.read.get
      .join(broadcast(dimA.read.get), Seq("user_id"), "left")
      .join(broadcast(dimB.read.get), Seq("event_type"), "left")
    val got = view.read.get
    val cols = expect.columns.sorted.toSeq
    val d1 = expect.select(cols.map(col): _*).exceptAll(got.select(cols.map(col): _*)).count()
    val d2 = got.select(cols.map(col): _*).exceptAll(expect.select(cols.map(col): _*)).count()
    println(s"""{"exactness":{"expect_minus_view":$d1,"view_minus_expect":$d2}}""")
    require(d1 == 0 && d2 == 0, "view diverged from recompute")
  }

  /** IVF INDEX LONGEVITY — the embeddings twin of the r13 MinHash soak:
    * 50 consecutive re-embed ticks through [[graft.llm.IvfIndexStore
    * .upsertEmbeddings]] over the 10× corpus (each tick rotates one
    * vec_id residue slice — most vectors MOVE cells, the stale-row
    * eviction path), takedowns every 5th tick, a probe every tick.
    * Claims under test: probe wall flat (cell-pruned reads never pay
    * for index age), segment fan-in saw-tooths under auto-compaction,
    * and after 50 ticks of moves + deletes the store holds EXACTLY the
    * expected per-slice-rotated corpus (no ghost rows, no losses). */
  private def ivfLongevity(spark: SparkSession, nTicks: Int): Unit = {
    import graft.llm.{IvfIndexStore, IvfMorIndexStore, Similarity}
    val replicaDir = "/dev/shm/graft_soak10x"
    Soak.generate(spark, "/root/testdata/sf0.1", replicaDir, 10)
    val emb = spark.read.parquet(s"$replicaDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint(false)
    val nRows = emb.count()
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).toArray
    val centroids = Similarity.ivfCentroids(emb, "embedding", "vec_id", k = 32)
    val t = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "ivf_soak").toString
    val ivf = new IvfIndexStore(spark, s"$t/idx", "embedding", "vec_id",
      centroids, idIndex = true)
    // the MERGE-ON-READ twin rides the SAME ticks — paired comparison
    // of the CoW rewrite-touched-cells cost vs the O(batch) delta cost
    val mor = new IvfMorIndexStore(spark, s"$t/mor", "embedding", "vec_id", centroids)
    val (_, buildSec) = time(ivf.append(emb))
    val (_, morBuildSec) = time(mor.upsert(emb))
    println(f"""{"soak":"ivf_longevity","ticks":$nTicks,"rows":$nRows,"dim":$dim,"build_sec":$buildSec%.1f,"mor_build_sec":$morBuildSec%.1f}""")

    def rotated(df: DataFrame, rot: Int): DataFrame =
      if (rot % dim == 0) df
      else df.withColumn("embedding",
        concat(slice(col("embedding"), rot % dim + 1, dim - rot % dim),
               slice(col("embedding"), 1, rot % dim)))
    def victims(tick: Int): DataFrame =
      emb.filter(pmod(col("vec_id"), lit(nTicks.toLong)) === (tick - 3).toLong &&
        pmod(floor(col("vec_id") / nTicks), lit(5)) === 0).select("vec_id")

    var wallFirst10 = 0.0; var wallLast10 = 0.0
    var morFirst10 = 0.0; var morLast10 = 0.0
    var probeFirst10 = 0.0; var probeLast10 = 0.0
    var maxSegs = 0; var compactions = 0; var prevSegs = ivf.liveSegments
    for (k <- 0 until nTicks) {
      val batch = rotated(
        emb.filter(pmod(col("vec_id"), lit(nTicks.toLong)) === k.toLong), k)
        .localCheckpoint(false)
      val (_, sec) = time {
        ivf.upsertEmbeddings(batch)
        if (k % 5 == 4 && k >= 3) ivf.delete(victims(k))
      }
      val (_, morSec) = time {
        mor.upsert(batch)
        if (k % 5 == 4 && k >= 3) mor.delete(victims(k))
      }
      val (_, probeSec) = time(mor.topK(q, 10, nprobe = 4).collect())
      val segs = ivf.liveSegments
      val (morSegs, morIdSegs) = mor.segmentCounts
      if (segs < prevSegs) compactions += 1
      prevSegs = segs
      maxSegs = math.max(maxSegs, math.max(segs, morSegs))
      if (k < 10) { wallFirst10 += sec; morFirst10 += morSec; probeFirst10 += probeSec }
      if (k >= nTicks - 10) { wallLast10 += sec; morLast10 += morSec; probeLast10 += probeSec }
      println(f"""{"tick":$k,"cow_sec":$sec%.2f,"mor_sec":$morSec%.2f,"probe_sec":$probeSec%.2f,"cow_segments":$segs,"mor_segments":$morSegs,"mor_id_segments":$morIdSegs}""")
    }
    println(f"""{"soak":"ivf_longevity","cow_first10_sec":$wallFirst10%.1f,"cow_last10_sec":$wallLast10%.1f,"cow_drift":${wallLast10 / wallFirst10}%.2f,"mor_first10_sec":$morFirst10%.1f,"mor_last10_sec":$morLast10%.1f,"mor_drift":${morLast10 / morFirst10}%.2f,"probe_first10":$probeFirst10%.1f,"probe_last10":$probeLast10%.1f,"probe_drift":${probeLast10 / probeFirst10}%.2f,"max_segments":$maxSegs,"compactions":$compactions}""")

    // exactness: every residue slice rotated by its tick, minus takedowns
    val expected = (0 until nTicks).map(k =>
        rotated(emb.filter(pmod(col("vec_id"), lit(nTicks.toLong)) === k.toLong), k))
      .reduce(_.unionByName(_))
      .unionByName(emb.filter(pmod(col("vec_id"), lit(nTicks.toLong)) >= nTicks.toLong))
      .join((3 until nTicks).filter(k => k % 5 == 4).map(victims)
          .reduceOption(_.unionByName(_))
          .getOrElse(emb.select("vec_id").filter(lit(false))).distinct(),
        Seq("vec_id"), "left_anti")
    val got = ivf.read.get.select("vec_id", "embedding")
    val d1 = expected.exceptAll(got).count()
    val d2 = got.exceptAll(expected).count()
    val gotMor = mor.read.get.select("vec_id", "embedding")
    val m1 = expected.exceptAll(gotMor).count()
    val m2 = gotMor.exceptAll(expected).count()
    println(s"""{"exactness":{"cow":{"expect_minus_index":$d1,"index_minus_expect":$d2},"mor":{"expect_minus_index":$m1,"index_minus_expect":$m2}}}""")
    require(d1 == 0 && d2 == 0, "CoW IVF index diverged from expected corpus state")
    require(m1 == 0 && m2 == 0, "MOR IVF index diverged from expected corpus state")
  }
}
