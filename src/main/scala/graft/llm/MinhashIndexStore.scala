package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.MorStore
import graft.schema.TableConfig

/** Persistent MinHash-LSH dedup index (Broder '97 resemblance sketches
  * in banded LSH form) — the INCREMENTAL-STATE form of
  * [[Dedup.nearDedupIncremental]].
  *
  * `nearDedupIncremental` re-shingles and re-hashes the WHOLE corpus on
  * every batch — O(corpus) CPU per tick, which is the wrong shape for a
  * daily-crawl pipeline admitting batches against a 100 TB corpus. This
  * store computes each document's band signatures ONCE, at admission,
  * and keeps them in merge-on-read tables: a probe costs one scan of
  * the NARROW signature table (three columns — a few percent of corpus
  * bytes, never the corpus text) joined against the broadcast batch
  * signatures, plus exact Jaccard verification restricted to candidate
  * ids, whose texts are fetched from the text table through a broadcast
  * semi probe. The embeddings twin of this pattern is
  * [[IvfIndexStore]]; at full scale the text table is the lakehouse
  * table itself (id-clustered via `pipeline/Layout`, so the candidate
  * fetch also file-skips).
  *
  * State is [[MorStore]] on BOTH tables deliberately: a batch's
  * signatures span every band, so a copy-on-write store partitioned by
  * band would rewrite the entire signature table on every tick —
  * exactly the O(corpus)-per-tick shape this store exists to avoid.
  * Merge-on-read appends O(batch) delta bytes instead; hot-partition
  * auto-compaction bounds the scan-time segment fan-in.
  *
  * Semantics are EXACTLY `nearDedupIncremental`'s: a batch is screened
  * against the accumulated corpus (not against itself), with the same
  * seeded signatures and the same exact-Jaccard verification — the spec
  * asserts probe ≡ the recompute form on every fixture.
  *
  * Crash contract: both sub-tables commit atomically (manifest rename)
  * and re-appends reconcile away by key — a crash between the text and
  * signature commits leaves the batch partially invisible to probes
  * until the tick REPLAYS, which heals the store (the same replay
  * contract as the engine's other stores).
  */
final class MinhashIndexStore(spark: SparkSession, root: String,
                              idCol: String, textCol: String,
                              numHashes: Int = 64, bands: Int = 16,
                              shingleSize: Int = 3) {

  private val sigs = new MorStore(spark, s"$root/sigs", "band",
    TableConfig("mhidx_sigs", null, Seq(idCol, "band")))
  private val txts = new MorStore(spark, s"$root/texts", "__tp",
    TableConfig("mhidx_texts", null, Seq(idCol)))

  /** The text-table partition function is PART OF THE ON-DISK FORMAT:
    * tombstones and re-appends must land in the same partition as the
    * live row, or a partition-scoped compaction whose window excludes a
    * mis-partitioned tombstone would re-emit the row — a removed text
    * resurrecting at read time. The stamp below names the current
    * function; opening a store that has data but no (or a different)
    * stamp refuses instead of silently mixing schemes — migration is an
    * explicit full rebuild (re-ingest), never an implicit corruption. */
  private val FormatStamp = "tp=pmod(xxhash64(id),16);v=2"

  /** The SIGNATURE parameters are on-disk layout too: stored bandHash
    * values are a function of (numHashes, bands, shingleSize), so a
    * probe recomputing the batch side under different values stops
    * colliding with stored keys SILENTLY — recall quietly drops, the
    * worst dedup-gate failure. Stamped separately from the partition
    * scheme because their remedies differ: the text partitioning is
    * migratable in place ([[migrateFormat]]); a signature-parameter
    * change means re-shingling, i.e. a rebuild. */
  private val SigStamp = s"mh=$numHashes;bands=$bands;shingle=$shingleSize"
  @volatile private var formatChecked = false

  private def ensureFormat(): Unit = if (!formatChecked) synchronized {
    if (!formatChecked) {
      StoreFormat.ensure(spark, root, "_sig", SigStamp, "minhash index")
      val rootP = new org.apache.hadoop.fs.Path(root)
      val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val marker = new org.apache.hadoop.fs.Path(rootP, "_format")
      if (fs.exists(marker)) {
        val in = fs.open(marker)
        val got = try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
        require(got == FormatStamp,
          s"minhash index at $root was written under partition scheme '$got'; " +
            s"this build expects '$FormatStamp' — run migrateFormat() to migrate " +
            "in place, or rebuild (re-ingest)")
      } else if (txts.latestManifestVersion.nonEmpty) {
        throw new IllegalStateException(
          s"minhash index at $root predates partition-scheme versioning; its text " +
            s"partitioning is unknowable — run migrateFormat() to migrate in place, " +
            "or rebuild (re-ingest)")
      } else {
        fs.mkdirs(rootP)
        val tmp = new org.apache.hadoop.fs.Path(rootP, "._tmp_format")
        val out = fs.create(tmp, true)
        try out.write(FormatStamp.getBytes("UTF-8")) finally out.close()
        if (!fs.rename(tmp, marker) && !fs.exists(marker))
          throw new java.io.IOException(s"failed to stamp format of $root")
      }
      formatChecked = true
    }
  }

  /** Full-compact-migrate for a store written before partition-scheme
    * versioning (or under an older scheme): one GLOBAL latest-per-key
    * reconcile of the text table — reads are partition-agnostic, so
    * the unknown old partitioning cannot corrupt it; only
    * partition-SCOPED compaction windows were ever at risk — then one
    * atomic full [[graft.pipeline.MorStore.snapshot]] re-partitioned
    * under the CURRENT scheme, then the stamp. O(texts) bytes, the
    * kinder alternative to [[ensureFormat]]'s rebuild-by-re-ingest
    * refusal. Signatures are partitioned by their band column
    * (structural, scheme-independent) and untouched. Crash-safe: the
    * stamp lands only after the snapshot commit, so an interrupted
    * migration just refuses again and re-runs (the snapshot is
    * idempotent — it re-reads whatever state is live). */
  def migrateFormat(): Unit = synchronized {
    val rootP = new org.apache.hadoop.fs.Path(root)
    val fsys = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val markerP = new org.apache.hadoop.fs.Path(rootP, "_format")
    val current =
      if (!fsys.exists(markerP)) None
      else {
        val in = fsys.open(markerP)
        try Some(new String(in.readAllBytes(), "UTF-8").trim) finally in.close()
      }
    if (current.contains(FormatStamp)) { formatChecked = true; return }
    txts.read.foreach { live =>
      txts.snapshot(live.drop("__tp").withColumn("__tp", textPartition))
    }
    fsys.mkdirs(rootP)
    val tmp = new org.apache.hadoop.fs.Path(rootP, "._tmp_format")
    val out = fsys.create(tmp, true)
    try out.write(FormatStamp.getBytes("UTF-8")) finally out.close()
    fsys.delete(markerP, false)
    if (!fsys.rename(tmp, markerP) && !fsys.exists(markerP))
      throw new java.io.IOException(s"failed to stamp format of $root")
    formatChecked = true
  }

  def isEmpty: Boolean = sigs.read.isEmpty

  /** Live segment fan-in of the (signature, text) state tables — the
    * probe's read amplification, bounded by MorStore's hot-partition
    * auto-compaction; the longevity soak graphs this per tick. */
  def segmentCounts: (Int, Int) = (sigs.liveSegments, txts.liveSegments)

  /** The admitted corpus as (id, text) — what probes screen against. */
  def indexedDocs: Option[DataFrame] = txts.read.map(_.drop("__tp"))

  /** Admit documents: their signatures and texts become probe-visible
    * state. O(batch) delta bytes per commit; replaying a batch
    * reconciles to the identical table. */
  /** Text-table partition: a HASH of the id, not the id itself — ids
    * may be strings (crawl URLs), and pmod over a numeric cast would
    * null out on them. xxhash64 is deterministic across sessions, so
    * re-appends land in their original partition. */
  private def textPartition = pmod(xxhash64(col(idCol)), lit(16L))

  def append(docs: DataFrame, adm: Long = 0L): Unit = {
    ensureFormat()
    txts.mergeBatch(
      docs.select(col(idCol), col(textCol))
        .withColumn("__tp", textPartition),
      TableConfig("mhidx_texts", null, Seq(idCol)))
    sigs.mergeBatch(
      Dedup.minhashBands(Dedup.parallelize(docs), idCol, textCol,
        numHashes, bands, shingleSize)
        .withColumn(MinhashIndexStore.AdmCol, lit(adm)),
      TableConfig("mhidx_sigs", null, Seq(idCol, "band")))
    StoreFormat.bumpFloor(spark, root, adm)
  }

  /** The highest admission stamp ever appended here (persisted marker,
    * never regresses — survives [[expire]] evicting every stamped row).
    * The streaming drains derive a RE-CREATED checkpoint's stamp base
    * from it so the retention clock stays monotone across checkpoint
    * lifetimes; None for a store that predates the floor (historical
    * base-0 behavior). */
  def admFloor: Option[Long] = StoreFormat.readFloor(spark, root)

  /** RETENTION: drop every doc whose latest admission stamp precedes
    * `beforeAdm` — the sliding-window leg a year-long ingest door needs
    * (without it admission state grows forever; the reference's analog
    * is its partition-window delete-and-reload). `adm` is whatever
    * monotonic tick the caller stamps at [[append]]/[[ingest]] time
    * (batch id, event-time day). Eviction goes through the MorStore
    * DELTA path ([[remove]] — O(expired) tombstone bytes, replay still
    * converges), so an expired near-dup RE-ADMITS on its next
    * delivery: retention is a recall horizon, exactly the bounded
    * backdate-window trade the streaming family documents. Rows
    * written before the stamp existed read NULL and never expire
    * (unknowable age — honest refusal, not silent eviction). Cost: one
    * narrow (id, stamp) scan of the signature table per call — the
    * retention cadence, not the tick path. Returns the evicted-id
    * count. */
  def expire(beforeAdm: Long): Long = {
    ensureFormat()
    val expired = sigs.read match {
      case Some(df) if df.columns.contains(MinhashIndexStore.AdmCol) =>
        df.groupBy(col(idCol))
          .agg(max(col(MinhashIndexStore.AdmCol)).as("__a"))
          .filter(col("__a").isNotNull && col("__a") < beforeAdm)
          .select(col(idCol)).localCheckpoint(false)
      case _ => return 0L
    }
    val n = expired.count()
    if (n > 0) remove(expired)
    n
  }

  /** Segment GC for the retention path: re-materialize both tables'
    * LIVE rows in one snapshot each, physically dropping tombstone
    * winners and superseded versions (legal here and only here:
    * neither table has a reconcile cursor, so a future re-append beats
    * the vanished tombstone by commit sequence anyway — the hazard
    * [[graft.pipeline.MorStore.compact]] retains tombstones against
    * cannot occur). Without this an expire-on-a-cadence store still
    * holds every evicted doc's tombstone keys forever. O(live) rewrite
    * — the retention cadence; read-equivalent at every point (the
    * snapshot commit is atomic).
    *
    * REFUSES UNDER CONTENTION (like
    * [[graft.pipeline.MorStore.compactHot]]'s compaction): each
    * snapshot's conditional publish is pinned to the version its read
    * was taken at ([[graft.pipeline.MorStore.readVersioned]] +
    * `snapshotFrom`), so a concurrent door's delta landing anywhere in
    * the read→publish window makes this throw
    * `ConcurrentModificationException` instead of silently dropping
    * the delta's rows (the materialized snapshot holds winners of the
    * PRE-delta manifest — publishing it over the delta would vanish
    * the door's admissions with no error). The retention thread
    * retries at its next cadence tick; state is unchanged on refusal. */
  def gcTombstones(): Unit = {
    ensureFormat()
    sigs.readVersioned.foreach { case (df, v) => sigs.snapshotFrom(df, Some(v)) }
    txts.readVersioned.foreach { case (df, v) => txts.snapshotFrom(df, Some(v)) }
  }

  /** Batch docs that survive screening against the indexed corpus:
    * no indexed near-dup at `threshold` n-gram Jaccard. The batch is
    * NOT screened against itself (admission order decides, exactly as
    * in the recompute form). */
  def probe(newDocs: DataFrame, threshold: Double = 0.8): DataFrame =
    if (isEmpty) newDocs
    else newDocs.join(probeMatches(newDocs, threshold), Seq(idCol), "left_anti")

  /** The probe's REJECT side, attributed: one row `(id, match_id)` per
    * batch doc with an indexed near-dup at `threshold`, `match_id` the
    * SMALLEST matching indexed id — the quarantine answer to "why did
    * doc X disappear" without a second probe pass ([[ingestWithMatches]]
    * reuses it for both the screen and the reject relation). Same cost
    * shape as [[probe]]: the narrow signature scan with the batch side
    * broadcast, then Jaccard verification of band-colliding pairs. */
  def probeMatches(newDocs: DataFrame, threshold: Double = 0.8): DataFrame = {
    ensureFormat() // the read path verifies the signature stamp too
    if (isEmpty)
      return newDocs.select(col(idCol), col(idCol).as("match_id")).filter(lit(false))
    val nb = Dedup.minhashBands(Dedup.parallelize(newDocs), idCol, textCol,
      numHashes, bands, shingleSize).toDF("ida", "band", "bandHash")
    val cb = sigs.read.get.select(col(idCol).as("idb"), col("band"), col("bandHash"))
    // batch side broadcast: the stored-signature scan is the only
    // corpus-sized pass in the probe, and it is the narrow one.
    // ida =!= idb: a SAME-ID hit is this very document re-delivered
    // (CDC replay), which is a restatement, never a duplicate — this
    // is what makes replayed ingests converge
    val cand = cb.join(broadcast(nb), Seq("band", "bandHash"))
      .filter(col("ida") =!= col("idb"))
      .select("ida", "idb").distinct()
      .localCheckpoint(false)
    // on id collision the BATCH's text wins: a re-delivered doc whose
    // text changed must be verified against its current bytes, not
    // yield two rows per id (which would double candidate pairs and
    // let the stale text decide a dup verdict)
    val batchTexts = newDocs.select(col(idCol), col(textCol))
    val texts = batchTexts
      .unionByName(indexedDocs.get.join(batchTexts.select(idCol),
        Seq(idCol), "left_anti"))
    Dedup.jaccardVerify(cand, texts, idCol, textCol, shingleSize)
      .filter(col("jaccard") >= threshold)
      .groupBy(col("ida"))
      .agg(min(col("idb")).as("match_id"))
      .select(col("ida").as(idCol), col("match_id"))
  }

  /** Remove documents from probe visibility (the GDPR/takedown path):
    * equality-delete tombstones on both tables — O(ids) appended bytes,
    * no segment rewritten. TEXT tombstones commit FIRST: a crash
    * between the two leaves signatures whose candidate pairs find no
    * text to verify against (the verify join drops them — fail-open to
    * ADMIT, never to leak removed content into a dup verdict), and a
    * re-run heals. A later [[append]] of the same id supersedes the
    * tombstone by commit order — removal is not a ban. Tombstoned
    * bytes persist in old segments until compaction + vacuum, the
    * standard merge-on-read reclamation. */
  def remove(ids: DataFrame): Unit = {
    ensureFormat()
    val idOnly = ids.select(col(idCol)).distinct().localCheckpoint(false)
    txts.delete(idOnly.withColumn("__tp", textPartition))
    sigs.delete(idOnly.select(col(idCol),
      explode(sequence(lit(0), lit(bands - 1))).as("band")))
  }

  /** The CDC tick: screen the batch, admit only the survivors, return
    * them. Replay-safe at the STATE level: re-running a delivered batch
    * never changes the store (appends reconcile by key; same-id hits
    * are restatements) and never loses an admitted doc. The returned
    * survivor list of a replay may be smaller — a first-tick survivor
    * whose in-batch near-dup twin was also admitted now reads as a dup
    * of store content, which is the truthful answer. */
  def ingest(newDocs: DataFrame, threshold: Double = 0.8,
             adm: Long = 0L): DataFrame = {
    val survivors = probe(newDocs, threshold).localCheckpoint(false)
    append(survivors, adm)
    survivors
  }

  /** [[ingest]] with the reject side attributed: returns
    * `(survivors, matches)` where `matches` is [[probeMatches]]' output
    * — one `(id, match_id)` row per rejected doc naming the smallest
    * indexed near-dup that caused it. ONE probe pass feeds both sides
    * (the screen is the matches' anti-join), so observability costs no
    * extra corpus scan — the audited ingest door's stage-3 backend
    * ([[graft.streaming.StreamOps.curationFunnelDrainAudited]]). Same
    * replay contract as [[ingest]]. */
  def ingestWithMatches(newDocs: DataFrame,
                        threshold: Double = 0.8,
                        adm: Long = 0L): (DataFrame, DataFrame) = {
    val matches = probeMatches(newDocs, threshold).localCheckpoint(false)
    val survivors = newDocs.join(matches, Seq(idCol), "left_anti")
      .localCheckpoint(false)
    append(survivors, adm)
    (survivors, matches)
  }
}

object MinhashIndexStore {
  /** The admission stamp column every signature-store ingest writes —
    * the retention clock [[MinhashIndexStore.expire]] (and the
    * Phash/Clip twins) evicts against. */
  private[llm] val AdmCol = "__adm"
}
