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
    val nTicks = args.headOption.map(_.toInt).getOrElse(100)
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
    joinViewLongevity(spark, nTicks)
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
}
