package graft.llm

import graft.pipeline.MorStore
import graft.schema.TableConfig
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{abs, broadcast, col, lit, pmod, xxhash64}

/** MERGE-ON-READ twin of [[IvfIndexStore]] — the O(batch) re-embed path.
  *
  * The copy-on-write store's [[IvfIndexStore.upsertEmbeddings]] rewrites
  * every TOUCHED cell's merged slice. That is the right trade when
  * mutations are cell-local, but the production re-embed shape — a new
  * model revision re-encoding a slice of the corpus — scatters the batch
  * across essentially EVERY cell (the r14 IVF soak measures exactly
  * this: a 400-row rotated batch touches all 32 cells, so each tick
  * rewrites the whole index). Here the same tick appends O(batch) delta
  * bytes instead:
  *
  *   - rows are keyed by '''(id, cell)''' — a RESIDENCE, not an id. A
  *     vector moving cells is one new-residence row in the new cell plus
  *     one equality-delete tombstone at the old residence, both in ONE
  *     [[MorStore.applyDelta]] commit. Keying by id alone cannot work in
  *     a partitioned MOR table: the move's insert and tombstone would
  *     collide on the key within one commit and tombstone-wins would
  *     kill the moved vector.
  *   - old residences resolve through a small (id, cell) SUPERSET side
  *     table partitioned on an id-hash bucket — O(batch buckets) read,
  *     never an index scan. The superset contract makes the two-table
  *     update crash-safe without cross-table transactions: new
  *     residences are added BEFORE the main commit and vacated ones
  *     removed AFTER it, so a crash anywhere leaves extra entries whose
  *     only cost is a redundant (no-op) tombstone on the next touch of
  *     that id — probes can over-delete a residence that was already
  *     dead, never under-delete a live one.
  *   - probes are partition-pruned reconciled reads of the nprobe cells
  *     ([[MorStore.readPartitions]]), read amplification bounded by the
  *     post-tick [[MorStore.compactHot]] cadence.
  *
  * Centroids are frozen at construction — and, because the cell layout
  * they induce IS the on-disk format, their fingerprint is STAMPED at
  * the root (`_centroids`, the [[MinhashIndexStore]] format-stamp
  * discipline): opening a stamped store with different centroids
  * refuses instead of silently probing the wrong cells. PQ codebooks
  * are part of the same stamp: they define what every stored
  * `pq_codes` word MEANS, so opening under different books refuses
  * rather than ADC-scoring garbage. A production index periodically
  * re-trains both: [[retrain]] migrates every residence under new
  * centroids, [[retrainBooks]] re-encodes every code word under new
  * codebooks — each one crash-safe O(index) pass with the shared
  * intent-marker recovery protocol.
  */
final class IvfMorIndexStore(spark: SparkSession, root: String,
                             embCol: String, idCol: String,
                             centroids: Array[Array[Float]],
                             books: Option[Pq.Codebooks] = None,
                             pinned: Boolean = false) {
  require(centroids.nonEmpty, "IvfMorIndexStore needs at least one centroid")

  // the stamped layout version covers BOTH frozen inputs: the centroid
  // set (cell layout) and, when configured, the PQ codebooks (the
  // meaning of every stored pq_codes word) — opening a PQ store under
  // different books would ADC-score silently wrong otherwise
  private val fp = IvfMorIndexStore.stampOf(centroids, books)
  private val StampFile = IvfMorIndexStore.StampFile
  private val IntentFile = IvfMorIndexStore.IntentFile
  private val LayoutFile = IvfMorIndexStore.LayoutFile
  private val VersionFile = IvfMorIndexStore.VersionFile

  private def fs = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def marker(name: String) =
    new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(root), name)

  private def readMarker(name: String): Option[String] = {
    val p = marker(name)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim) finally in.close()
    }
  }

  /** Marker writes scope their delete+rename under the per-root
    * publish lock: local-FS rename REPLACES an existing target, so two
    * in-process writers racing one marker would last-writer-win
    * silently (the r19 MorStore manifest lesson applied to the stamp
    * files — the check-then-adopt callers additionally hold the lock
    * across their read, see [[ensureCentroids]]). */
  private def writeMarker(name: String, content: String): Unit =
    MorStore.publishLock(root).synchronized {
      val rootP = new org.apache.hadoop.fs.Path(root)
      fs.mkdirs(rootP)
      val tmp = new org.apache.hadoop.fs.Path(rootP, s"._tmp_$name")
      val out = fs.create(tmp, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
      val dst = marker(name)
      fs.delete(dst, false)
      if (!fs.rename(tmp, dst) && !fs.exists(dst))
        throw new java.io.IOException(s"failed to write $name at $root")
    }

  // ── door-write markers: the catch-up's quiet-path detector ─────────
  // Every upsert-path commit drops one uniquely-named touch file in
  // `_writes/` AFTER its store commits complete and BEFORE its
  // commit-time geometry re-verification. retrain/retrainBooks list
  // the set before their main pass's read (S0) and again after the
  // stamp flip (S1): S1 == S0 proves no door commit landed in the
  // window the catch-up exists for, so the second O(index) pass is
  // skipped — two directory listings instead of a full reconciled
  // read on the (overwhelmingly common) uncontended retrain. The
  // two legs stay gapless: a marker in S0 means its commit finished
  // before the main pass's read (migrated there); in S1∖S0, before
  // the catch-up's read (migrated there); after S1, the writer's own
  // reverifyCommit necessarily reads the stamp after the flip and
  // self-heals. Unique CREATE files (not a counter) so concurrent
  // doors can never lose an increment; S1's files are deleted once
  // their commits are provably migrated, bounding the directory.
  private def writesDir =
    new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(root), "_writes")

  private def noteWrite(): Unit = {
    fs.mkdirs(writesDir)
    val p = new org.apache.hadoop.fs.Path(writesDir,
      s"w_${java.util.UUID.randomUUID().toString.take(12)}")
    fs.create(p, true).close()
  }

  private def writeMarkerSet(): Set[String] =
    if (!fs.exists(writesDir)) Set.empty
    else fs.listStatus(writesDir).map(_.getPath.getName)
      .filter(_.startsWith("w_")).toSet

  private def clearWriteMarkers(names: Set[String]): Unit =
    names.foreach(n =>
      fs.delete(new org.apache.hadoop.fs.Path(writesDir, n), false))

  /** The stamp state machine: no intent + no stamp → stamp this
    * handle's fingerprint (new store, or adoption of a pre-stamp store
    * whose layout is this handle's claim going forward); no intent +
    * matching stamp → fine; mismatched stamp → refuse; an intent
    * marker present → an interrupted [[retrain]] left the layout
    * indeterminate, so EVERY op refuses until retrain re-runs with the
    * intent's target centroids.
    *
    * Verified on EVERY operation, not once per handle (two tiny
    * driver-side marker reads — noise next to any op's Spark jobs):
    * a handle captured by a long-lived closure (a draining ingest
    * door's `admit` hook) must fail LOUDLY at its next tick when a
    * retrain published a new layout through a different handle —
    * a cached first-op check would keep gating through stale
    * centroids/books silently, which is exactly the failure
    * [[IvfMorIndexStore.open]]'s per-tick reopen pattern exists to
    * prevent.
    *
    * The whole state machine runs under the per-root publish lock: the
    * ADOPTION arm (no stamp → stamp this handle's fingerprint) is a
    * check-then-write, and two handles first-opening one root
    * concurrently under DIFFERENT geometries would otherwise both pass
    * the missing-stamp check and rename-replace would let the LAST
    * stamp win silently — both doors then proceed, one of them probing
    * the wrong cells forever (silent recall loss, the exact failure
    * the stamp refuses). Under the lock exactly one adoption wins; the
    * loser re-reads the winner's stamp and REFUSES on mismatch. */
  private def ensureCentroids(): Unit =
    MorStore.publishLock(root).synchronized { ensureCentroidsBody() }

  private def ensureCentroidsBody(): Unit = {
    readMarker(IntentFile).foreach { target =>
      throw new IllegalStateException(
        s"IVF index at $root has an interrupted centroid retrain (target $target); " +
          "re-run retrain with the target centroids to recover before using the store")
    }
    readMarker(StampFile) match {
      case Some(got) if got != fp =>
        throw new IllegalStateException(
          s"IVF index at $root was built under centroid/codebook set '$got'; " +
            s"this handle carries '$fp' — open it with the stamped layout " +
            "(IvfMorIndexStore.open follows the current one), or migrate " +
            "(retrain for centroids, retrainBooks for codebooks)")
      case Some(_) =>
        // adoption of a pre-_layout store: persist the layout once so
        // open()/reopen-per-tick work on stores stamped before it existed
        if (readMarker(LayoutFile).isEmpty) publishLayout(centroids, books)
      case None =>
        publishLayout(centroids, books)
        writeMarker(StampFile, fp)
    }
  }

  /** Persist the full layout (centroids + books, exact float
    * round-trip) WITH its version number in the same file — ONE atomic
    * marker write, so the pointer can never tear between "which
    * geometry" and "which version" (the r17 torn window: layout and
    * version were two writes, and a crash between them let a recovery
    * re-run skip the bump, stamping the new geometry's admissions with
    * the OLD version forever). Written BEFORE the stamp flips, so a
    * stamp always implies a readable matching layout.
    *
    * Idempotence is geometry-keyed: a crash-recovery re-run of retrain
    * republishing the SAME geometry doesn't burn a version number —
    * and because the version rides INSIDE the geometry file, a skipped
    * re-publish is by construction a COMPLETE one. Legacy stores
    * (`ivfl1` layout + separate `_layout_v`) upgrade in place here: the
    * stamp tells whether the old two-write publish completed (stamp
    * matches the layout ⇒ keep the recorded version) or tore
    * mid-migration (stamp still names the previous geometry ⇒ the bump
    * never landed — apply it now). */
  private def publishLayout(cs: Array[Array[Float]], bk: Option[Pq.Codebooks]): Unit = {
    val targetFp = IvfMorIndexStore.stampOf(cs, bk)
    val cur = readMarker(LayoutFile).map(t =>
      (IvfMorIndexStore.layoutVersionOf(t), IvfMorIndexStore.parseLayout(t)))
    val sameGeometry = cur.exists { case (_, (ccs, cbk)) =>
      IvfMorIndexStore.stampOf(ccs, cbk) == targetFp }
    if (sameGeometry) cur.get._1 match {
      case Some(_) => () // ivfl2: version atomic with the geometry — fully published
      case None => // legacy ivfl1 layout: upgrade, recovering the true version
        val recorded = readMarker(VersionFile).map(_.toInt)
        val completed = readMarker(StampFile).contains(targetFp)
        val v = if (completed) recorded.getOrElse(1)
                else recorded.map(_ + 1).getOrElse(1)
        writeMarker(LayoutFile, IvfMorIndexStore.serializeLayout(cs, bk, v))
        fs.delete(marker(VersionFile), false)
    } else {
      val prev = cur.flatMap(_._1)
        .orElse(readMarker(VersionFile).map(_.toInt)).getOrElse(0)
      writeMarker(LayoutFile, IvfMorIndexStore.serializeLayout(cs, bk, prev + 1))
      fs.delete(marker(VersionFile), false)
    }
  }

  /** The per-op verification gate. Unpinned handles (the default) run
    * the full stamp state machine on EVERY op — a captured handle
    * fails loudly at its first op after a foreign retrain. PINNED
    * handles ([[IvfMorIndexStore.openPinned]]) verified once at open
    * and then TOLERATE a concurrent layout flip until their next
    * reopen: gating decisions (probe candidates, cell assignment)
    * stay under the pinned geometry for the handle's lifetime — one
    * tick, by the reopen-per-tick contract — so an out-of-band
    * retrainer and a draining ingest door compose without the door
    * stalling on the retrain's intent marker or crashing mid-tick.
    * Store CONSISTENCY under the race is owned by the write side, not
    * by this gate: every commit re-verifies the geometry afterwards
    * ([[reverifyCommit]]) and the retrain runs a post-flip catch-up
    * pass, so no interleaving can leave a row resident under a
    * superseded cell assignment (the two legs meet: a commit that saw
    * the intent marker happened before the catch-up read; a commit
    * that didn't necessarily observes the flipped stamp and heals
    * itself). The only pinned-tolerance cost is RECALL inside the
    * racing tick: a probe may screen against pre-move cell contents —
    * a near-dup admitted through that window is the documented
    * at-least-once admission trade, never a lost or mis-resident
    * row. */
  private def verifyOp(): Unit = if (!pinned) ensureCentroids()

  private val store = new MorStore(spark, s"$root/cells", "cell",
    TableConfig("ivf_mor", null, Seq(idCol, "cell")))
  private val IdBuckets = 32
  private val idStore = new MorStore(spark, s"$root/__ids", "bucket",
    TableConfig("ivf_mor_ids", null, Seq(idCol, "cell")))

  private def withBucket(df: DataFrame): DataFrame =
    df.withColumn("bucket", pmod(abs(xxhash64(col(idCol))), lit(IdBuckets)))

  private def buildRows(batch: DataFrame): DataFrame = {
    val b = Similarity.buildIvfIndex(batch, embCol, centroids)
    books.fold(b)(bk => b.withColumn("pq_codes", Pq.encode(col(embCol), bk)))
  }

  /** Every residence the superset table knows for `idsOnly` — a
    * bucket-pruned read of the two-column side table joined against the
    * broadcast batch ids. */
  private def knownResidences(idsOnly: DataFrame): DataFrame = {
    val buckets = withBucket(idsOnly).select(col("bucket").cast("string"))
      .distinct().collect().map(_.getString(0)).toSeq
    idStore.readPartitions(buckets)
      .map(_.join(broadcast(idsOnly), Seq(idCol), "left_semi")
        .select(col(idCol), col("cell")))
      .getOrElse(idsOnly.select(col(idCol)).filter(lit(false))
        .withColumn("cell", lit(0)))
  }

  /** Upsert a batch of (possibly re-embedded) vectors: O(batch) bytes
    * appended, no cell rewritten. Replay-safe — re-delivery reconciles
    * to the identical state by (id, cell) key. `adm` is the retention
    * clock ([[expire]]); it rides every row and survives migrations
    * (retrain re-appends the full rows) and heals (threaded through
    * the re-upsert). */
  def upsert(batch: DataFrame, adm: Long = 0L): Unit = {
    verifyOp()
    val fresh = buildRows(
      graft.merge.MergeEngine.latestPerKey(batch, Seq(idCol), Seq.empty))
      .withColumn(MinhashIndexStore.AdmCol, lit(adm))
      .localCheckpoint(false)
    upsertBuilt(fresh, adm)
  }

  /** The commit half of [[upsert]], for callers that already hold the
    * cell-assigned (and PQ-encoded) rows. */
  private def upsertBuilt(fresh: DataFrame, adm: Long): Unit = {
    val idsOnly = fresh.select(col(idCol)).distinct()
    // superset add BEFORE the main commit (crash ⇒ over-tombstoning
    // later, never a ghost)
    idStore.appendDelta(withBucket(fresh.select(col(idCol), col("cell"))))
    val stale = knownResidences(idsOnly)
      .join(fresh.select(col(idCol), col("cell")), Seq(idCol, "cell"), "left_anti")
      .localCheckpoint(false)
    // one commit: new residences + tombstones for vacated ones
    store.applyDelta(fresh, stale.select(col("cell"), col(idCol)))
    // post-commit: shrink the superset back to exactly-current
    idStore.delete(withBucket(stale))
    store.compactHot(); idStore.compactHot()
    // marker AFTER the commits, BEFORE the re-verification read: the
    // ordering the catch-up skip's two-leg proof needs (see writesDir)
    noteWrite()
    StoreFormat.bumpFloor(spark, root, adm)
    reverifyCommit(fresh, adm)
  }

  /** COMMIT-TIME geometry re-verification — the write-side half of the
    * concurrent-retrain protocol (two tiny driver-side marker reads
    * per commit). A retrain racing this commit lands in exactly one of
    * three states, each safe:
    *
    *   - intent marker still pending ⇒ the retrain pass has not
    *     CLEARED yet, so its post-flip catch-up read happens strictly
    *     after this (already-committed) write — the retrain migrates
    *     these rows; nothing to do here.
    *   - stamp matches this handle's geometry ⇒ no flip raced the
    *     commit (or a no-op retrain republished the same layout) —
    *     the rows are correctly resident.
    *   - stamp flipped and no intent pending ⇒ this commit landed
    *     AFTER the retrain's catch-up read, under the superseded
    *     geometry — re-upsert the same batch through a handle opened
    *     on the CURRENT pointer: cells and PQ codes are recomputed
    *     under the live layout and the superset table evicts the
    *     stale residences, O(batch). (If yet another retrain's intent
    *     appears while reopening, that retrain's catch-up owns these
    *     rows — first case again.)
    *
    * Applied to EVERY handle, pinned or not: an unpinned op verifies
    * at op START, so a retrain completing between that check and the
    * commit hits the same window. */
  private def reverifyCommit(fresh: DataFrame, adm: Long): Unit = {
    if (readMarker(StampFile).contains(fp)) return // no flip raced this commit
    // The stamp flipped before this check. Heal HERE, under the
    // CURRENT LAYOUT — never defer to the flipping publisher, and
    // never key the heal off the stamp:
    //   - mid-publish (layout written, stamp not yet flipped) the
    //     layout is already the committed future — the intent marker
    //     pins the target, so even a publisher that crashes here can
    //     only be recovered toward the SAME geometry;
    //   - deferring to the publisher is sound only for a CENTROID
    //     retrain, whose catch-up re-derives cells. A CODEBOOK
    //     publisher's catch-up re-encodes code words in place and
    //     preserves residences — it can never move this commit's rows
    //     out of their superseded cells (the r20 three-writer soak
    //     caught exactly this: a door pinned two geometries back
    //     committed mid-retrainBooks-publish, the old deferral left
    //     its rows mis-resident with freshly-encoded codes);
    //   - if the intent is still pending, the publisher's catch-up may
    //     also migrate these rows — heal and catch-up converge to the
    //     same residences, so healing unconditionally stays correct.
    // The heal re-upserts through a PINNED handle on the layout's
    // geometry (an unpinned op would refuse while the intent clears);
    // if the layout advances yet again, the heal's own commit
    // re-verifies and re-heals — the chain terminates because each
    // heal lands on a strictly newer layout. The layout read retries
    // through writeMarker's atomic-swap window (delete+rename, µs) and
    // fails LOUDLY on a genuinely torn store rather than silently
    // leaving rows under a superseded geometry.
    var layout = readMarker(LayoutFile)
    var spins = 0
    while (layout.isEmpty && spins < 80) { // swap window is µs; 2 s cap
      Thread.sleep(25); spins += 1; layout = readMarker(LayoutFile)
    }
    val text = layout.getOrElse(throw new IllegalStateException(
      s"IVF index at $root has a flipped stamp but no readable layout — torn " +
        "publish; re-run the interrupted migration before ingesting"))
    val (cs, bk) = IvfMorIndexStore.parseLayout(text)
    // layout equals this handle's geometry: the flip is heading back to
    // exactly our cells/codes (a re-publish of the same layout) — the
    // rows are correctly resident already
    if (IvfMorIndexStore.stampOf(cs, bk) == fp) return
    IvfMorIndexStore.healedCommits.increment()
    new IvfMorIndexStore(spark, root, embCol, idCol, cs, bk, pinned = true)
      .upsert(fresh.select(col(idCol), col(embCol)), adm)
  }

  /** Near-dup ADMISSION through the index: screen `batch` against the
    * indexed corpus — candidates are SAME-CELL rows only (the IVF
    * bucket shape: recall follows cell locality, exactly the trade
    * `ivfTopK` makes) scored by exact cosine — admit the rows with no
    * indexed neighbor at `threshold`, upsert the survivors, return
    * them. The batch is NOT screened against itself (admission order
    * decides — the [[MinhashIndexStore]] ingest contract), and a
    * re-delivered batch converges the STORE: its rows are their own
    * stored twins (excluded by the id-inequality) and the upsert
    * reconciles by key — though a row whose mutual near-dup sat in the
    * SAME first batch screens against that now-stored twin on replay,
    * so the returned survivor set is at-least-once, not idempotent
    * (see [[graft.streaming.StreamOps.annDedupDrain]]).
    * Per tick: one partition-pruned read of the batch's ≤ k
    * cells with the BATCH side broadcast (the corpus side streams —
    * O(batch × cell population) comparisons, never all-pairs), plus
    * the O(batch) upsert. */
  def ingestNearDup(batch: DataFrame, threshold: Double,
                    adm: Long = 0L): DataFrame =
    ingestNearDupWithMatches(batch, threshold, adm)._1

  /** [[ingestNearDup]] with the reject side attributed: returns
    * `(admitted, matches)` where `matches` carries one
    * `(id, match_id)` row per rejected doc, `match_id` the SMALLEST
    * same-cell indexed neighbor at `threshold` — one probe pass feeds
    * both the screen (the matches' anti-join) and the quarantine
    * relation, the [[MinhashIndexStore.ingestWithMatches]] contract
    * with the IVF cell as the candidate generator. */
  def ingestNearDupWithMatches(batch: DataFrame, threshold: Double,
                               adm: Long = 0L): (DataFrame, DataFrame) = {
    verifyOp()
    val fresh = buildRows(
      graft.merge.MergeEngine.latestPerKey(batch, Seq(idCol), Seq.empty))
      .withColumn(MinhashIndexStore.AdmCol, lit(adm))
      .localCheckpoint(false)
    val cells = fresh.select(col("cell").cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq
    val matches = (store.readPartitions(cells) match {
      case None => fresh.select(col(idCol), col(idCol).as("match_id")).filter(lit(false))
      case Some(stored) =>
        stored.join(
            broadcast(fresh.select(col(idCol).as("__nid"),
              col(embCol).as("__nemb"), col("cell"))),
            Seq("cell"))
          .filter(graft.functions.VectorOps
            .vectorCosine(col(embCol), col("__nemb")) >= threshold &&
            col(idCol) =!= col("__nid"))
          .groupBy(col("__nid"))
          .agg(org.apache.spark.sql.functions.min(col(idCol)).as("match_id"))
          .select(col("__nid").as(idCol), col("match_id"))
    }).localCheckpoint(false)
    val admitted = fresh.join(matches, Seq(idCol), "left_anti")
      .localCheckpoint(false)
    if (!admitted.isEmpty) upsertBuilt(admitted, adm)
    (admitted.drop("cell", "pq_codes", MinhashIndexStore.AdmCol), matches)
  }

  /** Remove ids from probe visibility: tombstones at every known
    * residence, O(ids) appended bytes.
    *
    * SERIALIZED AGAINST RETRAIN via the per-root maintenance lock (and
    * the intent marker for the cross-start direction): a tombstone and
    * a retrain's migration pass both commit through the OCC append
    * path, and reconcile order is commit SEQUENCE (these tables have no
    * cursor) — so a migration segment whose reconciled read predates
    * this tombstone but whose commit lands after it would OUT-SEQUENCE
    * the tombstone and RESURRECT the removed id under the new geometry
    * (the r20 three-writer soak fires exactly this window with the
    * lock removed). The retrain's catch-up protocol cannot heal it:
    * catch-up re-migrates mis-resident rows, and a resurrected row sits
    * in its CORRECT new cell. Mutual exclusion is the fix the intent
    * window already implies — a delete/expire STARTING mid-retrain
    * refuses on the intent marker ([[ensureCentroids]]); the lock
    * closes the reverse direction (a retrain starting while a delete's
    * read→commit is in flight) within the JVM, which is where the
    * engine's writers live (doors, retrainer, retention cadence all
    * share the driver). Cross-process retrainers keep the documented
    * discipline: quiesce retention before retraining. Door ticks never
    * take this lock — ingest concurrency is untouched. */
  def delete(ids: DataFrame): Unit =
    IvfMorIndexStore.maintLock(root).synchronized {
      ensureCentroids()
      val idsOnly = ids.select(col(idCol)).distinct().localCheckpoint(false)
      val known = knownResidences(idsOnly).localCheckpoint(false)
      store.delete(known.select(col("cell"), col(idCol)))
      idStore.delete(withBucket(known))
      store.compactHot(); idStore.compactHot()
    }

  /** The reconciled index (all cells). */
  def read: Option[DataFrame] = { verifyOp(); store.read }

  /** RETENTION: evict every id whose latest admission stamp precedes
    * `beforeAdm` — the signature stores' contract
    * ([[MinhashIndexStore.expire]]) on the ANN admission index:
    * eviction rides [[delete]] (tombstones at every known residence,
    * O(expired) bytes), replay converges, an expired near-dup's
    * re-delivery RE-ADMITS (recall horizon, not a ban), and rows
    * written before the stamp existed read NULL and never expire.
    * One narrow (id, stamp) reconciled scan per call — retention
    * cadence, not the tick path. Serialized against retrain (the
    * maintenance lock + intent marker — see [[delete]] for why a
    * racing migration pass would otherwise resurrect expired rows). */
  def expire(beforeAdm: Long): Long =
    IvfMorIndexStore.maintLock(root).synchronized {
      ensureCentroids()
      val expired = store.read match {
        case Some(df) if df.columns.contains(MinhashIndexStore.AdmCol) =>
          df.groupBy(col(idCol))
            .agg(org.apache.spark.sql.functions.max(
              col(MinhashIndexStore.AdmCol)).as("__a"))
            .filter(col("__a").isNotNull && col("__a") < lit(beforeAdm))
            .select(col(idCol)).localCheckpoint(false)
        case _ => return 0L
      }
      val n = expired.count()
      if (n > 0) delete(expired)
      n
    }

  /** Highest admission stamp ever upserted (persisted, never
    * regresses) — the drains' checkpoint-re-creation clock base; see
    * [[MinhashIndexStore.admFloor]]. */
  def admFloor: Option[Long] = StoreFormat.readFloor(spark, root)

  /** Segment GC for the retention path: re-materialize both tables'
    * live rows, physically dropping tombstone winners (legal: neither
    * table reconciles by cursor — see
    * [[MinhashIndexStore.gcTombstones]]). Refuses mid-retrain like
    * every unpinned op, REFUSES UNDER DOOR CONTENTION like the whole
    * gc family: each snapshot's publish is pinned to the version its
    * read was taken at, so a door delta landing anywhere in the
    * read→publish window throws instead of silently vanishing (the
    * retention cadence retries next tick). Also sweeps the door-write
    * markers: retrain is their only other consumer, so a door that
    * never retrains would accumulate one tiny file per commit forever.
    * The sweep set is captured at ENTRY — before the two O(index)
    * snapshot jobs, not after — which is what makes it safe against a
    * retrain STARTING mid-gc: a marker present at entry belongs to a
    * commit durable before entry, and any retrain whose intent landed
    * after this method's intent check captures its S0 later still, so
    * its main-pass read covers that commit with or without the marker
    * (a retrain whose intent landed earlier makes the check refuse).
    * Deleting an S0 marker can only force a spurious catch-up
    * (S1 ≠ S0), never suppress a needed one — the r19 hazard was the
    * post-snapshot sweep deleting markers that landed AFTER a racing
    * retrain's S0, which entry-capture makes unreachable (markers
    * created after entry are never in the sweep set). The maintenance
    * lock additionally serializes gc against retrain in-JVM. */
  def gcTombstones(): Unit =
    IvfMorIndexStore.maintLock(root).synchronized {
      ensureCentroids()
      val sweep = writeMarkerSet()
      store.readVersioned.foreach { case (df, v) => store.snapshotFrom(df, Some(v)) }
      idStore.readVersioned.foreach { case (df, v) => idStore.snapshotFrom(df, Some(v)) }
      clearWriteMarkers(sweep)
    }

  /** Re-train migration: move every residence to its cell under
    * `newCentroids` in ONE crash-safe O(index) pass — the production
    * answer to centroid drift without a full re-ingest. Mechanics
    * reuse the superset-table contract verbatim: new residences enter
    * the superset BEFORE the single [[MorStore.applyDelta]] commit
    * (moves + old-residence tombstones land atomically together) and
    * vacated entries clean up AFTER it, so a crash anywhere leaves
    * only harmless superset over-entries. The layout switch itself is
    * guarded by an INTENT marker: it is written before the pass, every
    * other op refuses while it exists, and it clears only after the
    * centroid stamp flips — a crash mid-retrain therefore can never be
    * probed under the wrong centroid set; recovery is re-running
    * `retrain` with the same target (the pass is idempotent — rows
    * already in their target cell are skipped). Returns the store
    * handle bound to the new centroids; the receiver handle is dead
    * after this call (its stamp check fails on next use). */
  def retrain(newCentroids: Array[Array[Float]]): IvfMorIndexStore =
    retrainStaged(newCentroids, () => ())

  /** [[retrain]] with a staged-interleaving seam: `midWindow` runs
    * after the main migration pass and before the layout publish —
    * inside the exact window whose door commits only the post-flip
    * catch-up can migrate. Test-only (the specs pin the contended
    * path deterministically with it); production calls [[retrain]]. */
  private[llm] def retrainStaged(newCentroids: Array[Array[Float]],
                                 midWindow: () => Unit): IvfMorIndexStore =
    // the maintenance lock holds for the whole migration: an in-flight
    // expire/delete blocks the retrain from starting (its read-derived
    // tombstones must commit before the pass's read, or the pass's
    // re-appended rows would out-sequence them — see [[delete]]), and
    // none can start mid-pass (the lock in-JVM, the intent marker
    // cross-process). Door ticks never take it — ingest concurrency,
    // the protocol's whole point, is untouched.
    IvfMorIndexStore.maintLock(root).synchronized {
      retrainStagedBody(newCentroids, midWindow)
    }

  private def retrainStagedBody(newCentroids: Array[Array[Float]],
                                midWindow: () => Unit): IvfMorIndexStore = {
    require(newCentroids.nonEmpty, "retrain needs at least one centroid")
    val targetFp = IvfMorIndexStore.stampOf(newCentroids, books)
    readMarker(IntentFile) match {
      case Some(t) =>
        require(t == targetFp,
          s"IVF index at $root has an interrupted retrain toward '$t'; " +
            s"recovery must re-run with those centroids, not '$targetFp'")
      case None =>
        ensureCentroids() // clean store under THIS handle's centroids
        writeMarker(IntentFile, targetFp)
    }
    val s0 = writeMarkerSet() // BEFORE the pass's read — the skip's anchor
    migratePass(newCentroids)
    midWindow()
    publishLayout(newCentroids, books)
    writeMarker(StampFile, targetFp)
    // POST-FLIP CATCH-UP, inside the intent window: a pinned door
    // handle (openPinned) may have committed rows under the OLD
    // geometry while the main pass ran — a commit the pass's read
    // missed is EITHER earlier than this second read (migrated here)
    // OR later than the stamp flip above, in which case the writer's
    // own commit-time re-verification observes the flipped stamp and
    // self-heals (reverifyCommit's case analysis — the two legs meet
    // with no gap). Running the catch-up BEFORE the intent clears
    // makes it crash-safe too: a retrainer dying mid-catch-up leaves
    // the intent pending, so recovery re-runs the (idempotent) pass.
    // CONDITIONAL on the door-write markers: the uncontended retrain —
    // the overwhelmingly common case — pays two directory listings
    // instead of a second O(index) reconciled read; a racing commit's
    // marker (created post-commit, pre-reverify) forces the pass, and
    // a commit whose marker lands after the S1 listing is the
    // writer-self-heals leg. Cost when contended: a second O(index)
    // read, O(racing commits) write — the price of never stalling a
    // draining door.
    val s1 = writeMarkerSet()
    if (s1 != s0) {
      IvfMorIndexStore.catchupRuns.increment()
      migratePass(newCentroids)
    } else IvfMorIndexStore.catchupSkips.increment()
    // S1's commits are migrated (by the main pass or the catch-up) —
    // their markers are spent; later markers stay for the next retrain
    clearWriteMarkers(s1)
    fs.delete(marker(IntentFile), false)
    // the receiver handle re-verifies the stamp on every op, so its
    // next use fails loudly against the flipped layout
    new IvfMorIndexStore(spark, root, embCol, idCol, newCentroids, books)
  }

  /** One idempotent migration pass: move every row whose residence
    * disagrees with `newCentroids` — rows already in their target cell
    * are untouched, so re-running is free-ish (one reconciled read). */
  private def migratePass(newCentroids: Array[Array[Float]]): Unit =
    store.read.foreach { rows =>
      // materialized BEFORE the commit below mutates the manifests —
      // the one full-index read of the pass
      val moved = rows
        .withColumn("__nc", Similarity.cellOf(col(embCol), newCentroids))
        .filter(col("__nc") =!= col("cell"))
        .localCheckpoint(false)
      if (!moved.isEmpty) {
        val fresh = moved.drop("cell").withColumnRenamed("__nc", "cell")
        val stale = moved.select(col(idCol), col("cell"))
        idStore.appendDelta(withBucket(fresh.select(col(idCol), col("cell"))))
        store.applyDelta(fresh, stale.select(col("cell"), col(idCol)))
        idStore.delete(withBucket(stale))
        store.compactHot(); idStore.compactHot()
      }
    }

  /** PQ CODEBOOK re-train + full re-encode: replace the frozen
    * codebooks and rewrite every stored row's `pq_codes` under the new
    * ones in ONE crash-safe O(index) pass — the production answer to
    * codebook staleness after an embedding-model revision (stale books
    * degrade ADC recall corpus-wide; [[retrain]] moves residences but
    * deliberately preserves codes). Also the ADOPTION path: a store
    * built without books gains them here, every row encoded.
    *
    * Mechanics: cells do not change (centroids are untouched), so the
    * pass is a pure column rewrite — one reconciled read, re-encode
    * through the native expression, one atomic
    * [[graft.pipeline.MorStore.snapshot]] full-replace commit (which
    * also resets segment fan-in; an applyDelta would re-append every
    * row as delta bytes ON TOP of the old segments for no benefit,
    * since a re-encode touches the whole index by definition). The
    * superset side table is untouched — residences are identical.
    *
    * Crash contract mirrors [[retrain]] verbatim: the INTENT marker
    * (carrying the target layout stamp) is written before the pass,
    * every other op refuses while it exists, the stamp flips after the
    * snapshot commit, and the intent clears last. Recovery is
    * re-running `retrainBooks` with the same target books — the pass
    * is idempotent (re-encoding is a pure function of the stored
    * vectors). Returns the handle bound to the new books; the receiver
    * handle is dead after this call. */
  def retrainBooks(newBooks: Pq.Codebooks): IvfMorIndexStore =
    // serialized against expire/delete/gc like [[retrain]] — the
    // snapshot pass re-appends every row it read, so a tombstone
    // committing inside the pass's read→publish window must refuse the
    // pass (single-writer parent check), never be out-sequenced by it
    IvfMorIndexStore.maintLock(root).synchronized {
      retrainBooksBody(newBooks)
    }

  private def retrainBooksBody(newBooks: Pq.Codebooks): IvfMorIndexStore = {
    val targetFp = IvfMorIndexStore.stampOf(centroids, Some(newBooks))
    readMarker(IntentFile) match {
      case Some(t) =>
        require(t == targetFp,
          s"IVF index at $root has an interrupted migration toward '$t'; " +
            s"recovery must re-run with that target, not '$targetFp'")
      case None =>
        ensureCentroids() // clean store under THIS handle's layout
        writeMarker(IntentFile, targetFp)
    }
    val s0 = writeMarkerSet() // BEFORE the snapshot's read
    store.read.foreach { rows =>
      store.snapshot(rows.withColumn("pq_codes", Pq.encode(col(embCol), newBooks)))
    }
    publishLayout(centroids, Some(newBooks))
    writeMarker(StampFile, targetFp)
    // POST-FLIP CATCH-UP, inside the intent window (the retrain twin's
    // protocol): a pinned door handle may have committed rows mid-pass
    // with codes encoded under the OLD books. A commit racing the
    // snapshot itself is refused by the snapshot's single-writer
    // parent check (the retrain then throws with the intent pending
    // and recovery re-runs); a commit landing after the snapshot
    // survives as a delta with stale codes — re-encode exactly the
    // rows whose stored word disagrees with the new books (O(index)
    // compare, O(racing commits) write, same residences). Commits
    // later than this read happened after the stamp flip, so their
    // writer self-heals (reverifyCommit); running the catch-up before
    // the intent clears keeps it crash-safe. CONDITIONAL on the
    // door-write markers exactly like [[retrain]]'s: the uncontended
    // re-encode skips the second O(index) compare for two directory
    // listings.
    val s1 = writeMarkerSet()
    if (s1 != s0) {
      IvfMorIndexStore.catchupRuns.increment()
      // a racing commit may have come through a handle pinned TWO
      // geometries back (old centroids AND no/old books): re-derive
      // residences under THIS store's centroids first — codes are a
      // pure function of the vector, so moved rows keep theirs and the
      // re-encode below fixes any stale/missing word either way. The
      // writer's own reverifyCommit also heals this case (it reads the
      // layout, not the stamp); running the migration here keeps leg 1
      // sufficient on its own, the retrain twin's defense-in-depth.
      migratePass(centroids)
      store.read.foreach { rows =>
        val enc = Pq.encode(col(embCol), newBooks)
        val stale = rows.filter(!(col("pq_codes") <=> enc))
          .withColumn("pq_codes", enc).localCheckpoint(false)
        if (!stale.isEmpty)
          store.applyDelta(stale, stale.select(col("cell"), col(idCol)).limit(0))
      }
    } else IvfMorIndexStore.catchupSkips.increment()
    clearWriteMarkers(s1)
    fs.delete(marker(IntentFile), false)
    new IvfMorIndexStore(spark, root, embCol, idCol, centroids, Some(newBooks))
  }

  /** WHEN to retrain — the drift SIGNAL that triggers the machinery
    * ([[retrain]]/[[retrainBooks]] are the mechanism, [[expire]] the
    * horizon): one row per occupied cell with its population `n` and
    * `sum_cos_micro`, the integer-micro sum of each resident's cosine
    * to its cell centroid (per-row `⌊cos·10⁶⌋` then an exact integer
    * sum — order-independent, so the report is deterministic across
    * partitionings and engine-replayable). Consumers derive the two
    * production triggers: mean cohesion (`sum_cos_micro / n / 10⁶`)
    * falling as re-embed waves land far from the trained centroids,
    * and population imbalance (hot cells make nprobe recall collapse
    * and per-cell scans skew). Cost: one narrow reconciled scan × a
    * broadcast k-row centroid table — cheap enough for a cadence
    * probe, never O(k · index). */
  def driftReport(): DataFrame = {
    verifyOp()
    import org.apache.spark.sql.functions.{count, floor, sum}
    import spark.implicits._
    val cdf = centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toSeq.toDF("cell", "centroid")
    store.read match {
      case None => Seq.empty[(Long, Long, Long)].toDF("cell", "n", "sum_cos_micro")
      case Some(df) =>
        df.join(broadcast(cdf), Seq("cell"))
          .withColumn("cos_micro",
            floor(graft.functions.VectorOps
              .vectorCosine(col(embCol), col("centroid")) * lit(1e6)).cast("long"))
          .groupBy(col("cell").cast("long").as("cell"))
          .agg(count(lit(1)).as("n"), sum("cos_micro").as("sum_cos_micro"))
    }
  }

  /** (cell segments, id-superset segments) — the probe's read
    * amplification, bounded by compactHot. */
  def segmentCounts: (Int, Int) = (store.liveSegments, idStore.liveSegments)

  // the geometry this handle carries, for openPinned's re-wrap
  private[llm] def centroidsSnapshot: Array[Array[Float]] = centroids
  private[llm] def booksSnapshot: Option[Pq.Codebooks] = books

  /** Exact-cosine top-k inside the `nprobe` cells nearest the query —
    * a partition-pruned reconciled read. */
  def topK(query: Array[Float], k: Int, nprobe: Int = 2): DataFrame = {
    verifyOp()
    val cells = centroids.indices
      .sortBy(c => -Similarity.cosArr(query, centroids(c))).take(nprobe)
    val probed = store.readPartitions(cells.map(_.toString))
      .getOrElse(throw new IllegalStateException(s"IVF index at $root is empty"))
    Similarity.bruteForceTopK(probed, embCol, idCol, query, k)
  }

  /** The IVF-PQ probe (parity with [[IvfIndexStore.topKAdc]]): ADC over
    * the stored code words inside the nprobe cells; the reconcile is
    * over (id, cell, codes) — the vector column never leaves disk
    * unless `rerank` > 0 asks for the exact refine. Requires `books`. */
  def topKAdc(query: Array[Float], k: Int, nprobe: Int = 2,
              rerank: Int = 0): DataFrame = {
    verifyOp()
    val bk = books.getOrElse(throw new IllegalStateException(
      s"IVF index at $root was built without PQ codebooks"))
    val cells = centroids.indices
      .sortBy(c => -Similarity.cosArr(query, centroids(c))).take(nprobe)
    val probed = store.readPartitions(cells.map(_.toString))
      .getOrElse(throw new IllegalStateException(s"IVF index at $root is empty"))
    val scored = probed
      .select(col(idCol) +: col("pq_codes") +:
        (if (rerank > 0) Seq(col(embCol)) else Nil): _*)
      .withColumn("adc_micro",
        Pq.adcMicroScoreFromCodes(col("pq_codes"), bk, query))
      .orderBy(col("adc_micro").asc, col(idCol).asc)
    if (rerank <= 0) scored.limit(k).select(idCol, "adc_micro")
    else scored.limit(math.max(rerank, k))
      .select(col(idCol),
        graft.functions.VectorOps.vectorCosine(col(embCol),
          graft.functions.VectorOps.floatVectorLit(query)).as("cosine"))
      .filter(col("cosine").isNotNull)
      .orderBy(col("cosine").desc, col(idCol).asc).limit(k)
  }
}

object IvfMorIndexStore {

  /** Healed-commit telemetry: incremented each time a writer's
    * commit-time re-verification ([[IvfMorIndexStore.reverifyCommit]])
    * finds the stamp flipped under it and re-upserts its batch through
    * the current layout — the write-side leg of the concurrent-retrain
    * protocol actually firing. Process-wide (a JVM hosts one engine);
    * the concurrent soak reports it per round. */
  val healedCommits = new java.util.concurrent.atomic.LongAdder

  /** Catch-up telemetry: how many retrains ran their second O(index)
    * pass because a door commit's marker raced the window vs how many
    * proved the quiet path and skipped it. */
  val catchupRuns = new java.util.concurrent.atomic.LongAdder
  val catchupSkips = new java.util.concurrent.atomic.LongAdder

  // per-root MAINTENANCE locks: expire/delete/gcTombstones vs
  // retrain/retrainBooks are mutually exclusive — a migration pass
  // re-appends rows it read, so a tombstone committing between its
  // read and its commit would be out-sequenced and its row resurrected
  // under the new geometry (no cursor arbitrates these tables). The
  // intent marker already refuses retention ops that START mid-retrain;
  // this lock closes the reverse window in-JVM, where the engine's
  // writers (doors, retrainer thread, retention cadence) live. Door
  // ticks never take it.
  private val maintLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[llm] def maintLock(root: String): Object =
    maintLocks.computeIfAbsent(root, _ => new Object)

  private[llm] val StampFile = "_centroids"
  private[llm] val IntentFile = "_retrain_intent"
  private[llm] val LayoutFile = "_layout"
  private[llm] val VersionFile = "_layout_v"

  private def readMarkerAt(spark: SparkSession, root: String,
                           name: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(root), name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim) finally in.close()
    }
  }

  /** Serialize a layout (centroids + optional PQ codebooks) as text,
    * with its VERSION NUMBER in the header — one file carries both, so
    * the pointer publishes atomically (`ivfl2 <version> k dim m ksub
    * dsub`). `java.lang.Float.toString` round-trips every float
    * bit-exactly, so a reopened handle carries the IDENTICAL geometry —
    * its stamp fingerprint (over the float BITS) matches by
    * construction, which [[open]] verifies. */
  private[llm] def serializeLayout(cs: Array[Array[Float]],
                                   books: Option[Pq.Codebooks],
                                   version: Int): String = {
    val dim = cs.headOption.map(_.length).getOrElse(0)
    val hdr = books match {
      case Some(b) => s"ivfl2 $version ${cs.length} $dim ${b.m} ${b.ksub} ${b.dsub}"
      case None => s"ivfl2 $version ${cs.length} $dim 0 0 0"
    }
    val rows = cs.iterator.map(_.mkString(" ")) ++
      books.iterator.flatMap(_.cb.iterator.flatMap(_.iterator.map(_.mkString(" "))))
    (Iterator(hdr) ++ rows).mkString("\n")
  }

  /** The version number embedded in an `ivfl2` layout; None for the
    * legacy two-file `ivfl1` format (whose version, if any, lives in
    * the separate `_layout_v` marker). */
  private[llm] def layoutVersionOf(text: String): Option[Int] = {
    val head = text.linesIterator.next().split(" ", 3)
    if (head(0) == "ivfl2") Some(head(1).toInt) else None
  }

  private[llm] def parseLayout(text: String): (Array[Array[Float]], Option[Pq.Codebooks]) = {
    val lines = text.linesIterator.toArray
    val head = lines.head.split(" ")
    val (k, m, ksub) = head(0) match {
      case "ivfl1" => (head(1).toInt, head(3).toInt, head(4).toInt)
      case "ivfl2" => (head(2).toInt, head(4).toInt, head(5).toInt)
      case tag => throw new IllegalArgumentException(
        s"unrecognized index layout format '$tag'")
    }
    def floats(line: String) = line.split(" ").map(_.toFloat)
    val cs = lines.slice(1, 1 + k).map(floats)
    val books =
      if (m == 0) None
      else Some(Pq.Codebooks(
        lines.drop(1 + k).map(floats).grouped(ksub).toArray))
    (cs, books)
  }

  /** Open the index under its CURRENT persisted layout — the versioned
    * index pointer: the centroids/books a handle needs are read back
    * from `_layout` (published atomically with every stamp flip), so a
    * caller needs no out-of-band copy of the geometry and a handle
    * reopened per tick always gates under the latest retrain — the
    * [[QualityLr.ModelStore]] hot-swap pattern applied to the index
    * (`[[graft.streaming.StreamOps.curationFunnelDrainWith]]`'s
    * `admit` hook reopens here each tick; cost is two tiny driver-side
    * file reads). Refuses while a retrain intent marker is pending
    * (recovery owns the store), on a missing layout (pre-layout store:
    * open it once with its explicit centroids to adopt), and on a
    * stamp/layout mismatch (torn publish). */
  def open(spark: SparkSession, root: String,
           embCol: String, idCol: String): IvfMorIndexStore = {
    readMarkerAt(spark, root, IntentFile).foreach { target =>
      throw new IllegalStateException(
        s"IVF index at $root has an interrupted retrain (target $target); " +
          "re-run the retrain with its target layout to recover before opening")
    }
    val stamp = readMarkerAt(spark, root, StampFile).getOrElse(
      throw new IllegalStateException(
        s"IVF index at $root has no layout stamp — not an initialized index"))
    val layout = readMarkerAt(spark, root, LayoutFile).getOrElse(
      throw new IllegalStateException(
        s"IVF index at $root predates persisted layouts — open it once with " +
          "its explicit centroids/books to adopt, then reopen"))
    val (cs, books) = parseLayout(layout)
    require(stampOf(cs, books) == stamp,
      s"IVF index at $root: persisted layout does not match the stamp '$stamp' — " +
        "torn layout publish; re-run the interrupted migration")
    new IvfMorIndexStore(spark, root, embCol, idCol, cs, books)
  }

  /** [[open]] with the geometry PINNED for the handle's lifetime — the
    * tick-scoped handle that lets a draining ingest door and a
    * SEPARATE retrainer process compose without either stalling or
    * crashing. An unpinned handle re-verifies the stamp on every op,
    * which is exactly right for a captured long-lived handle but makes
    * an out-of-band retrain FAIL the door mid-tick (safely, loudly —
    * and at 100 TB a retrain runs for minutes-to-hours, so every tick
    * that overlaps it would die or have to wait out the intent
    * marker). A pinned handle instead verifies once HERE and then
    * tolerates a concurrent flip until its next reopen:
    *
    *   - GATING (probe candidates, cell assignment) runs under the
    *     pinned geometry for the whole tick — deterministic verdicts,
    *     stamped with the tick-start `index_v`;
    *   - WRITES stay consistent under any interleaving: every commit
    *     re-verifies the geometry afterwards and re-upserts itself
    *     through the current pointer if it lost the race, while the
    *     retrain's post-flip catch-up pass migrates every row
    *     committed before its final read — between the two legs no
    *     row can stay resident under a superseded layout;
    *   - the NEXT tick's reopen (this method, again) gates under the
    *     new geometry.
    *
    * The one tolerance cost is recall inside the racing tick (a probe
    * may read pre-move cell contents — an extra admission, never a
    * lost row). Refusal conditions are [[open]]'s: pending intent at
    * open time, uninitialized store, torn publish. */
  def openPinned(spark: SparkSession, root: String,
                 embCol: String, idCol: String): IvfMorIndexStore = {
    val h = open(spark, root, embCol, idCol)
    new IvfMorIndexStore(spark, root, embCol, idCol,
      h.centroidsSnapshot, h.booksSnapshot, pinned = true)
  }

  /** The layout-version pointer: 1 at first stamp, +1 per completed
    * [[IvfMorIndexStore.retrain]]/[[IvfMorIndexStore.retrainBooks]] —
    * the integer streaming drains stamp admission rows with (`index_v`)
    * so every verdict is attributable to the exact geometry that made
    * it, without hashing floats into the row. Read from the `ivfl2`
    * layout header (version and geometry publish in ONE atomic write);
    * the separate `_layout_v` marker is the legacy fallback for stores
    * written before the header carried it. */
  def currentVersion(spark: SparkSession, root: String): Option[Int] =
    readMarkerAt(spark, root, LayoutFile).flatMap(layoutVersionOf)
      .orElse(readMarkerAt(spark, root, VersionFile).map(_.toInt))

  /** md5 fingerprint of a centroid set's exact float bits (k, dim, and
    * every component) — the layout-version value the `_centroids`
    * stamp and retrain intent marker carry. */
  def centroidFingerprint(cs: Array[Array[Float]]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bb = java.nio.ByteBuffer.allocate(8)
    bb.putInt(cs.length).putInt(cs.headOption.map(_.length).getOrElse(0))
    md.update(bb.array())
    cs.foreach { c =>
      val bytes = java.nio.ByteBuffer.allocate(4 * c.length)
      c.foreach(bytes.putFloat)
      md.update(bytes.array())
    }
    s"k=${cs.length};md5=${md.digest().map("%02x".format(_)).mkString}"
  }

  /** md5 fingerprint of a PQ codebook set's exact float bits. */
  def booksFingerprint(b: Pq.Codebooks): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hdr = java.nio.ByteBuffer.allocate(12)
    hdr.putInt(b.m).putInt(b.ksub).putInt(b.dsub)
    md.update(hdr.array())
    b.cb.foreach(_.foreach { c =>
      val bytes = java.nio.ByteBuffer.allocate(4 * c.length)
      c.foreach(bytes.putFloat)
      md.update(bytes.array())
    })
    s"m=${b.m};md5=${md.digest().map("%02x".format(_)).mkString}"
  }

  /** The full layout-version stamp: centroid fingerprint plus, for PQ
    * stores, the codebook fingerprint — what `_centroids` and the
    * retrain intent markers carry. For a books-less store this is
    * exactly [[centroidFingerprint]] (the pre-PQ stamp format, so
    * existing stores keep validating). */
  def stampOf(cs: Array[Array[Float]], books: Option[Pq.Codebooks]): String =
    centroidFingerprint(cs) + books.map(b => s";books=${booksFingerprint(b)}").getOrElse("")
}
