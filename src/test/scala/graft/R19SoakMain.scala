package graft

import graft.llm.{IvfMorIndexStore, MinhashIndexStore, Pq, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 soak: measured scale evidence for the round's claims.
  *
  *  1. CONCURRENT retrain soak — the concurrent-retrain protocol run
  *     genuinely concurrently: a pinned ingest door drains N ticks on
  *     its own thread while THIS thread fires `retrain` (and then the
  *     `retrainBooks` adoption) mid-drain at seeded-random points,
  *     repeated across seeds. Asserted at quiescence, under ANY
  *     interleaving: zero misplaced residences (every row in its
  *     current-geometry cell, codes under the current books), the
  *     admitted set ⊇ the sequential lower bound (every novel row
  *     admitted — the documented at-least-once recall window may only
  *     ADD admissions), and nothing invented. Reported per seed: the
  *     race-hit histogram (extra admissions, healed commits, catch-up
  *     runs/skips, ticks deferred on the intent window, snapshot
  *     refusal retries).
  *  2. Retention ladder — a MinhashIndexStore under a sliding
  *     admission window (`expire(t-3)` per tick + periodic
  *     `gcTombstones`) vs an unbounded control: the windowed store's
  *     signature state must FLATTEN at O(window × batch) while the
  *     control grows linearly — the state-size claim behind the
  *     stores' retention leg.
  *  3. CONCURRENT retention — the retention leg run against a LIVE
  *     door: a second thread fires `expire` + `gcTombstones` while
  *     the door ingests, across the OCC append path (door commits
  *     retry past the retention tombstones) and the snapshot-refusal
  *     path (a GC racing a door commit refuses and is retried by the
  *     retention thread — the documented single-writer contract).
  *     Asserted at quiescence: every tick inside the final window
  *     still screens, every tick outside it re-admits, and state is
  *     bounded by the window.
  *
  * Run: `sbt "Test/runMain graft.R19SoakMain [1|2|3|all]"`.
  */
object R19SoakMain {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("all")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-r19-soak")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (which == "1" || which == "all") concurrentRetrainSoak(spark)
    if (which == "2" || which == "all") retentionLadder(spark)
    if (which == "3" || which == "all") concurrentRetentionSoak(spark)
    spark.stop()
  }

  /** 1. The genuinely-concurrent door × retrain soak. */
  private def concurrentRetrainSoak(spark: SparkSession): Unit = {
    import spark.implicits._
    val tenx = "/dev/shm/graft_soak10x"
    Soak.generate(spark, "/root/testdata/sf0.001", tenx, 10)
    val emb = spark.read.parquet(s"$tenx/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint(false)
    val corpusIds = emb.select("vec_id").as[Long].collect().toSet
    val corpusVecs = emb.as[(Long, Array[Float])].collect().sortBy(_._1)
    val dim = corpusVecs.head._2.length
    val k8 = Similarity.ivfCentroids(emb, "embedding", "vec_id", k = 8)
    val k4 = Similarity.ivfCentroids(emb, "embedding", "vec_id", k = 4)
    val books = Pq.trainCodebooks(emb, "embedding", "vec_id", m = 8, ksub = 16)
    val booksStamp = IvfMorIndexStore.stampOf(k4, Some(books))

    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(1000 + seed)
      val root = java.nio.file.Files.createTempDirectory(s"r19cc$seed")
        .toString + "/idx"
      new IvfMorIndexStore(spark, root, "embedding", "vec_id", k8).upsert(emb)
      IvfMorIndexStore.healedCommits.reset()
      IvfMorIndexStore.catchupRuns.reset()
      IvfMorIndexStore.catchupSkips.reset()
      val ticks = 8
      val novelIds = scala.collection.mutable.Set.empty[Long]
      val copyIds = scala.collection.mutable.Set.empty[Long]
      val batches = (0 until ticks).map { t =>
        val novel = (0 until 20).map { j =>
          val id = 10_000_000L + t * 1000 + j; novelIds += id
          id -> Array.fill(dim)((rnd.nextGaussian() * 3).toFloat)
        }
        val copies = (0 until 20).map { j =>
          val src = corpusVecs((t * 40 + j) % corpusVecs.length)
          val id = 20_000_000L + t * 1000 + j; copyIds += id
          id -> src._2
        }
        (novel ++ copies).toDF("vec_id", "embedding").localCheckpoint(false)
      }
      @volatile var doorErr: Throwable = null
      val deferred = new java.util.concurrent.atomic.LongAdder
      val door = new Thread(() => {
        try batches.foreach { b =>
          var h: IvfMorIndexStore = null
          while (h == null)
            try h = IvfMorIndexStore.openPinned(spark, root, "embedding", "vec_id")
            catch {
              case e: Exception
                if e.getMessage != null && (e.getMessage.contains("interrupted") ||
                  e.getMessage.contains("torn")) =>
                deferred.increment(); Thread.sleep(25)
            }
          h.ingestNearDup(b, 0.95).count()
        } catch { case e: Throwable => doorErr = e }
      }, s"graft-door-$seed")
      val t0 = System.nanoTime()
      door.start()
      // fire the CENTROID retrain mid-drain at a seeded-random point
      Thread.sleep(500L + rnd.nextInt(4000))
      val (_, tRetrain) = time(
        IvfMorIndexStore.open(spark, root, "embedding", "vec_id").retrain(k4))
      // then the CODEBOOK adoption, also against the live door; the
      // snapshot's single-writer publish may refuse when a door commit
      // races it — recovery is re-running with the same target (the
      // documented contract), counted here as snapshot retries
      Thread.sleep(200L + rnd.nextInt(800))
      var booksRetries = 0
      var migrated: IvfMorIndexStore = null
      while (migrated == null)
        try migrated = new IvfMorIndexStore(spark, root, "embedding", "vec_id", k4)
          .retrainBooks(books)
        catch {
          case _: java.util.ConcurrentModificationException => booksRetries += 1
        }
      door.join(600000)
      require(!door.isAlive, s"seed $seed: door thread hung")
      require(doorErr == null, s"seed $seed: door tick failed: $doorErr")
      val wall = (System.nanoTime() - t0) / 1e9

      // quiescence: stamp is the k4+books layout, version 3, and EVERY
      // row resides in its current-geometry cell with current codes
      require(IvfMorIndexStore.currentVersion(spark, root).contains(3),
        s"seed $seed: expected version 3")
      val h = IvfMorIndexStore.open(spark, root, "embedding", "vec_id")
      val state = h.read.get.select(col("vec_id"),
          (Similarity.cellOf(col("embedding"), k4) === col("cell")).as("cellOk"),
          (Pq.encode(col("embedding"), books) <=> col("pq_codes")).as("codeOk"))
        .collect()
      val misplaced = state.count(r => !r.getBoolean(1))
      val staleCodes = state.count(r => !r.getBoolean(2))
      require(misplaced == 0, s"seed $seed: $misplaced rows misplaced")
      require(staleCodes == 0, s"seed $seed: $staleCodes rows under stale codes")
      val ids = state.map(_.getLong(0)).toSet
      val missingNovel = novelIds.filterNot(ids.contains)
      require(missingNovel.isEmpty,
        s"seed $seed: sequential lower bound violated — missing $missingNovel")
      require(ids.subsetOf(corpusIds ++ novelIds ++ copyIds),
        s"seed $seed: invented rows")
      val raceExtras = copyIds.count(ids.contains)
      println(f"[r19-soak] concurrent seed $seed: wall $wall%6.1f s, " +
        f"retrain $tRetrain%5.2f s, ${corpusVecs.length} corpus vecs, " +
        f"$ticks ticks x 40 docs | misplaced 0, stale-codes 0, " +
        f"novel ${novelIds.size}/${novelIds.size} admitted, " +
        f"race extras $raceExtras/${copyIds.size}, " +
        f"healed ${IvfMorIndexStore.healedCommits.sum()}, " +
        f"catch-up runs/skips ${IvfMorIndexStore.catchupRuns.sum()}/" +
        f"${IvfMorIndexStore.catchupSkips.sum()}, " +
        f"deferred-open waits ${deferred.sum()}, books-snapshot retries $booksRetries")
      val stampPath = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(root), "_centroids")
      val fs = stampPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(stampPath)
      val stamp = try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
      require(stamp == booksStamp, s"seed $seed: wrong final layout stamp")
    }
  }

  /** 2. Retention ladder: sliding-window expire flattens state. */
  private def retentionLadder(spark: SparkSession): Unit = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").localCheckpoint(false)
    val n = docs.count()
    val windowRoot = java.nio.file.Files.createTempDirectory("r19ret_w").toString
    val controlRoot = java.nio.file.Files.createTempDirectory("r19ret_c").toString
    val windowed = new MinhashIndexStore(spark, s"$windowRoot/idx", "doc_id", "text")
    val control = new MinhashIndexStore(spark, s"$controlRoot/idx", "doc_id", "text")
    def sigRows(s: MinhashIndexStore): Long =
      s.indexedDocs.map(_.count()).getOrElse(0L)
    val ticks = 12
    val trace = (1 to ticks).map { t =>
      // per-tick batch: every token tick-tagged (the Soak replica
      // trick) so ticks' shingle spaces are DISJOINT — each tick's
      // docs genuinely admit; state SIZE is under test, not screening
      val batch = docs.select(
        (col("doc_id") + lit(t * 1_000_000L)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"t$t$$1").as("text"))
      windowed.ingest(batch, 0.8, adm = t.toLong)
      control.ingest(batch, 0.8, adm = t.toLong)
      val evicted = windowed.expire(t.toLong - 3) // keep the last 4 ticks
      if (t % 4 == 0) windowed.gcTombstones()
      val (w, c) = (sigRows(windowed), sigRows(control))
      println(f"[r19-soak] retention tick $t%2d: windowed docs $w%7d " +
        f"(evicted $evicted%6d), control docs $c%7d")
      (w, c)
    }
    val (wFinal, cFinal) = trace.last
    require(cFinal >= n * ticks * 9 / 10, "control must grow with every tick")
    require(wFinal <= n * 5,
      s"windowed state must flatten at O(window x batch): $wFinal vs batch $n")
    // flatness: the windowed curve stops growing once the window fills
    val plateau = trace.drop(4).map(_._1)
    require(plateau.max <= plateau.min * 11 / 10,
      s"windowed state must plateau, got ${plateau.mkString(",")}")
    println(f"[r19-soak] retention ladder: control ${cFinal}%d docs after " +
      f"$ticks ticks vs windowed ${wFinal}%d — state flattened at the window")
  }

  /** 3. Retention fired CONCURRENTLY against a live door. */
  private def concurrentRetentionSoak(spark: SparkSession): Unit = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").localCheckpoint(false)
    val n = docs.count()
    val root = java.nio.file.Files.createTempDirectory("r19ccret").toString
    val store = new MinhashIndexStore(spark, s"$root/idx", "doc_id", "text")
    val ticks = 10
    def batchOf(t: Int) = docs.select(
      (col("doc_id") + lit(t * 1_000_000L)).as("doc_id"),
      regexp_replace(col("text"), "(\\S+)", s"t$t$$1").as("text"))
    @volatile var doorErr: Throwable = null
    @volatile var doorTick = 0
    val door = new Thread(() => {
      try (1 to ticks).foreach { t =>
        store.ingest(batchOf(t), 0.8, adm = t.toLong)
        doorTick = t
      } catch { case e: Throwable => doorErr = e }
    }, "graft-ret-door")
    @volatile var retErr: Throwable = null
    val gcRefusals = new java.util.concurrent.atomic.LongAdder
    val expireRounds = new java.util.concurrent.atomic.LongAdder
    val retention = new Thread(() => {
      try while (doorTick < ticks && doorErr == null) {
        Thread.sleep(400)
        store.expire(doorTick.toLong - 3)
        expireRounds.increment()
        // GC's snapshot is single-writer: a door commit racing it makes
        // the conditional publish REFUSE — the retention thread's
        // documented recovery is skip-and-retry next round
        try store.gcTombstones()
        catch { case _: java.util.ConcurrentModificationException =>
          gcRefusals.increment() }
      } catch { case e: Throwable => retErr = e }
    }, "graft-ret")
    val t0 = System.nanoTime()
    door.start(); retention.start()
    door.join(600000); retention.join(600000)
    require(!door.isAlive && !retention.isAlive, "concurrent-retention soak hung")
    require(doorErr == null, s"door failed under concurrent retention: $doorErr")
    require(retErr == null, s"retention thread failed: $retErr")
    val wall = (System.nanoTime() - t0) / 1e9
    // quiescence: slide the window to its final position, then assert
    // the invariants under ANY interleaving of the racing threads
    store.expire(ticks.toLong - 3)
    def copyOf(t: Int) = batchOf(t)
      .select((col("doc_id") + 50_000_000L).as("doc_id"), col("text"))
    for (t <- (ticks - 3) to ticks)
      require(store.probe(copyOf(t), 0.8).count() == 0,
        s"tick $t is inside the window and must still screen")
    for (t <- 1 to 2)
      require(store.probe(copyOf(t), 0.8).count() == n,
        s"tick $t slid out of the window and must re-admit")
    val live = store.indexedDocs.get.count()
    require(live <= n * 4, s"state must stay bounded by the window: $live")
    println(f"[r19-soak] concurrent retention: $ticks door ticks x $n docs in " +
      f"$wall%5.1f s against ${expireRounds.sum()} expire rounds " +
      f"(${gcRefusals.sum()} GC snapshot refusals retried); window docs $live, " +
      "in-window ticks screen, slid-out ticks re-admit")
  }

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }
}
