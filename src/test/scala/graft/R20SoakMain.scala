package graft

import graft.llm.{IvfMorIndexStore, Pq, Similarity}
import graft.pipeline.MorStore
import graft.schema.TableConfig
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-20 soak: the LAST untested concurrency cell — retention racing
  * a retrain — plus the measured witness that the hazard it guards is
  * real.
  *
  *  1. HAZARD WITNESS (staged, raw store): a migration-shaped writer
  *     re-appends rows it read BEFORE a retention tombstone committed,
  *     and its commit out-sequences the tombstone (these tables have no
  *     reconcile cursor — commit sequence decides), physically
  *     RESURRECTING the evicted row under the new geometry. The witness
  *     runs the exact interleaving at the [[MorStore]] commit protocol
  *     level and requires the resurrection to OCCUR — proving the bug
  *     class the index-level maintenance lock exists to close (the
  *     catch-up protocol cannot heal it: a resurrected row sits in its
  *     correct new cell).
  *  2. THREE-WRITER soak (door × retrain × retention), 4 seeds: a
  *     pinned ingest door drains on its own thread, a retention thread
  *     fires `expire` + `gcTombstones` on a cadence (retrying through
  *     the documented refusals: pending intent, stale handle after a
  *     flip, gc losing a publish race), and THIS thread fires `retrain`
  *     then `retrainBooks` mid-drain at seeded-random points. Asserted
  *     at quiescence, under ANY interleaving: the expired generation is
  *     GONE (never resurrected by a migration pass), the live
  *     generation and every novel door row survive in their
  *     current-geometry cells with current codes, and nothing is
  *     invented. The race-hit histogram (healed commits, catch-up
  *     runs/skips, deferred opens, gc refusals, retention refusals)
  *     is published per seed.
  *
  * Run: `sbt "Test/runMain graft.R20SoakMain [1|2|all]"`.
  */
object R20SoakMain {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("all")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-r20-soak")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (which == "1" || which == "all") resurrectionWitness(spark)
    if (which == "2" || which == "all") threeWriterSoak(spark)
    spark.stop()
  }

  /** 1. The staged resurrection witness at the raw commit protocol. */
  private def resurrectionWitness(spark: SparkSession): Unit = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("r20wit").toString + "/t"
    // the admission stores' shape: keyed (id, cell), partitioned by
    // cell, NO cursor — reconcile order is commit sequence alone
    val store = new MorStore(spark, root, "cell",
      TableConfig("r20_witness", null, Seq("id", "cell")))
    store.appendDelta(Seq((1L, "c0", "x")).toDF("id", "cell", "v")) // seq 1
    // a migration-shaped writer captures its reconciled read FIRST...
    val migrationRead = store.read.get.localCheckpoint(false)
    // ...then retention's eviction tombstone commits (seq 2)...
    store.delete(Seq(("c0", 1L)).toDF("cell", "id"))
    require(store.read.get.count() == 0, "the eviction must be live before the race")
    // ...and the stale-read migration commits AFTER it (seq 3): the
    // moved residence out-sequences the eviction
    val moved = migrationRead.withColumn("cell", lit("c1"))
    store.applyDelta(moved, migrationRead.select(col("cell"), col("id")))
    val resurrected = store.read.get.collect()
    require(resurrected.length == 1 && resurrected.head.getAs[String]("cell") == "c1",
      "witness failed to fire — the staged interleaving should resurrect the row")
    println("[r20-soak] resurrection witness: an evicted row re-surfaced in its " +
      "new cell when a migration-shaped commit out-sequenced the tombstone — " +
      "the hazard the IvfMorIndexStore maintenance lock closes (rung 2 proves " +
      "the locked index never exhibits it)")
  }

  /** 2. The three-writer matrix: door × retrain × retention, 4 seeds. */
  private def threeWriterSoak(spark: SparkSession): Unit = {
    import spark.implicits._
    val tenx = "/dev/shm/graft_soak10x"
    Soak.generate(spark, "/root/testdata/sf0.001", tenx, 10)
    val emb = spark.read.parquet(s"$tenx/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint(false)
    val corpusVecs = emb.as[(Long, Array[Float])].collect().sortBy(_._1)
    // generations split by id PARITY (a value predicate, applied
    // identically to the upserts below and the assertion sets here)
    val gen1Ids = corpusVecs.map(_._1).filter(_ % 2 == 0).toSet // adm 1 — expires
    val gen2Ids = corpusVecs.map(_._1).filter(_ % 2 == 1).toSet // adm 2 — stays
    val gen2Vecs = corpusVecs.filter(_._1 % 2 == 1)
    val dim = corpusVecs.head._2.length
    val k8 = Similarity.ivfCentroids(emb, "embedding", "vec_id", k = 8)
    val k4 = Similarity.ivfCentroids(emb, "embedding", "vec_id", k = 4)
    val books = Pq.trainCodebooks(emb, "embedding", "vec_id", m = 8, ksub = 16)

    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(2000 + seed)
      val root = java.nio.file.Files.createTempDirectory(s"r20tw$seed")
        .toString + "/idx"
      val ivf0 = new IvfMorIndexStore(spark, root, "embedding", "vec_id", k8)
      ivf0.upsert(emb.filter(col("vec_id") % 2 === 0), adm = 1L)
      ivf0.upsert(emb.filter(col("vec_id") % 2 === 1), adm = 2L)
      IvfMorIndexStore.healedCommits.reset()
      IvfMorIndexStore.catchupRuns.reset()
      IvfMorIndexStore.catchupSkips.reset()
      val ticks = 8
      val novelIds = scala.collection.mutable.Set.empty[Long]
      val copyIds = scala.collection.mutable.Set.empty[Long]
      val batches = (0 until ticks).map { t =>
        // synthetic id ranges sit ABOVE the replica corpus ids (which
        // reach k·10⁷ + base under the 10× fixture)
        val novel = (0 until 20).map { j =>
          val id = 100_000_000L + t * 1000 + j; novelIds += id
          id -> Array.fill(dim)((rnd.nextGaussian() * 3).toFloat)
        }
        // copies reference the NON-expiring generation only, so a
        // reject is the steady-state answer and every admission is
        // attributable to a race window, never to the sliding window
        val copies = (0 until 20).map { j =>
          val src = gen2Vecs((t * 40 + j) % gen2Vecs.length)
          val id = 200_000_000L + t * 1000 + j; copyIds += id
          id -> src._2
        }
        (novel ++ copies).toDF("vec_id", "embedding").localCheckpoint(false)
      }
      @volatile var doorErr: Throwable = null
      @volatile var doorTicks = 0
      val deferred = new java.util.concurrent.atomic.LongAdder
      val door = new Thread(() => {
        try batches.zipWithIndex.foreach { case (b, t) =>
          var h: IvfMorIndexStore = null
          while (h == null)
            try h = IvfMorIndexStore.openPinned(spark, root, "embedding", "vec_id")
            catch {
              case e: Exception
                if e.getMessage != null && (e.getMessage.contains("interrupted") ||
                  e.getMessage.contains("torn")) =>
                deferred.increment(); Thread.sleep(25)
            }
          h.ingestNearDup(b, 0.95, adm = 10L + t).count()
          doorTicks = t + 1
        } catch { case e: Throwable => doorErr = e }
      }, s"graft-door-$seed")
      @volatile var retErr: Throwable = null
      val expireRounds = new java.util.concurrent.atomic.LongAdder
      val gcRefusals = new java.util.concurrent.atomic.LongAdder
      val retentionRefusals = new java.util.concurrent.atomic.LongAdder
      val retention = new Thread(() => {
        // the retention cadence against BOTH other writers: reopen per
        // firing; refusals (pending intent, post-flip stale handle,
        // mid-publish torn read) and gc publish races retry next round
        try while (doorTicks < ticks && doorErr == null) {
          Thread.sleep(200L + rnd.nextInt(300))
          try {
            val h = IvfMorIndexStore.open(spark, root, "embedding", "vec_id")
            h.expire(2L)
            expireRounds.increment()
            try h.gcTombstones()
            catch { case _: java.util.ConcurrentModificationException =>
              gcRefusals.increment() }
          } catch {
            case _: IllegalStateException => retentionRefusals.increment()
          }
        } catch { case e: Throwable => retErr = e }
      }, s"graft-retention-$seed")
      val t0 = System.nanoTime()
      door.start(); retention.start()
      // fire the CENTROID retrain mid-drain, then the CODEBOOK adoption,
      // both against the live door AND the live retention cadence; the
      // books snapshot may lose its publish race — re-run (documented)
      Thread.sleep(500L + rnd.nextInt(3000))
      val (_, tRetrain) = time(
        IvfMorIndexStore.open(spark, root, "embedding", "vec_id").retrain(k4))
      Thread.sleep(200L + rnd.nextInt(800))
      var booksRetries = 0
      var migrated: IvfMorIndexStore = null
      while (migrated == null)
        try migrated = new IvfMorIndexStore(spark, root, "embedding", "vec_id", k4)
          .retrainBooks(books)
        catch {
          case _: java.util.ConcurrentModificationException => booksRetries += 1
        }
      door.join(600000); retention.join(600000)
      require(!door.isAlive && !retention.isAlive, s"seed $seed: soak hung")
      require(doorErr == null, s"seed $seed: door tick failed: $doorErr")
      require(retErr == null, s"seed $seed: retention thread failed: $retErr")
      // slide the window once more at quiescence (the cadence may have
      // fired last before the final admissions), then GC
      migrated.expire(2L)
      migrated.gcTombstones()
      val wall = (System.nanoTime() - t0) / 1e9

      require(IvfMorIndexStore.currentVersion(spark, root).contains(3),
        s"seed $seed: expected layout version 3")
      val h = IvfMorIndexStore.open(spark, root, "embedding", "vec_id")
      val state = h.read.get.select(col("vec_id"),
          (Similarity.cellOf(col("embedding"), k4) === col("cell")).as("cellOk"),
          (Pq.encode(col("embedding"), books) <=> col("pq_codes")).as("codeOk"))
        .collect()
      def cat(id: Long): String =
        if (novelIds.contains(id)) "novel" else if (copyIds.contains(id)) "copy"
        else if (gen1Ids.contains(id)) "gen1" else if (gen2Ids.contains(id)) "gen2"
        else "???"
      val misplacedIds = state.filter(r => !r.getBoolean(1)).map(_.getLong(0))
      val staleIds = state.filter(r => !r.getBoolean(2)).map(_.getLong(0))
      if (misplacedIds.nonEmpty || staleIds.nonEmpty)
        println(s"[r20-soak] seed $seed DIAG: misplaced " +
          s"${misplacedIds.take(10).map(i => s"$i(${cat(i)})").mkString(",")} " +
          s"(${misplacedIds.length} total); stale " +
          s"${staleIds.take(10).map(i => s"$i(${cat(i)})").mkString(",")} " +
          s"(${staleIds.length} total)")
      require(misplacedIds.isEmpty, s"seed $seed: misplaced rows")
      require(staleIds.isEmpty, s"seed $seed: stale codes")
      val ids = state.map(_.getLong(0)).toSet
      val resurrected = ids.intersect(gen1Ids)
      require(resurrected.isEmpty,
        s"seed $seed: ${resurrected.size} EXPIRED ids live after the race — " +
          s"a migration pass out-sequenced the eviction (e.g. ${resurrected.take(5)})")
      require(gen2Ids.subsetOf(ids), s"seed $seed: live-generation rows lost")
      val missingNovel = novelIds.filterNot(ids.contains)
      require(missingNovel.isEmpty,
        s"seed $seed: sequential lower bound violated — missing $missingNovel")
      require(ids.subsetOf(gen1Ids ++ gen2Ids ++ novelIds ++ copyIds),
        s"seed $seed: invented rows")
      val raceExtras = copyIds.count(ids.contains)
      println(f"[r20-soak] three-writer seed $seed: wall $wall%6.1f s, " +
        f"retrain $tRetrain%5.2f s, ${corpusVecs.length} corpus vecs, " +
        f"$ticks ticks x 40 docs | expired-resurrected 0/${gen1Ids.size}, " +
        f"misplaced 0, stale-codes 0, novel ${novelIds.size}/${novelIds.size}, " +
        f"race extras $raceExtras/${copyIds.size}, " +
        f"expire rounds ${expireRounds.sum()}, " +
        f"retention refusals ${retentionRefusals.sum()}, " +
        f"gc refusals ${gcRefusals.sum()}, " +
        f"healed ${IvfMorIndexStore.healedCommits.sum()}, " +
        f"catch-up runs/skips ${IvfMorIndexStore.catchupRuns.sum()}/" +
        f"${IvfMorIndexStore.catchupSkips.sum()}, " +
        f"deferred-open waits ${deferred.sum()}, books-snapshot retries $booksRetries")
    }
  }

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }
}
