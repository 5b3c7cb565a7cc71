package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.MorStore
import graft.schema.TableConfig

/** Persistent perceptual-hash near-dup admission index — the IMAGE
  * twin of [[MinhashIndexStore]] (text shingles) and
  * [[IvfMorIndexStore.ingestNearDup]] (embeddings): batches of
  * [[Multimodal.imagePhash]] aHashes screen against everything
  * admitted BEFORE them, survivors become probe-visible state.
  *
  * State is ONE merge-on-read table of banded signatures
  * `(id, simhash, band, bandHash)` partitioned by band
  * ([[Dedup.simhashIndexOf]]'s pigeonhole split: every pair within
  * `maxHamming` shares at least one band key, so banded candidates
  * are recall-EXACT — banding changes cost, not answers). The full
  * 64-bit hash rides in the band rows, so Hamming verification needs
  * no second table fetch — a probe is one narrow scan of the
  * signature table joined against the BROADCAST batch index, the
  * 100 TB cost shape shared with the MinHash store. O(batch·blocks)
  * state bytes per admitted doc; replaying a batch reconciles by
  * (id, band) key.
  *
  * Ingest semantics are the family contract verbatim: a batch is
  * never screened against itself (admission order decides; mutual
  * in-batch near-dups both admit on first delivery), same-id hits are
  * re-deliveries (restatements, not duplicates — the `ida =!= idb`
  * exemption is what makes replays converge), and
  * [[ingestWithMatches]] feeds the audited door: one probe pass
  * yields both the screen and the `(id, match_id)` reject relation,
  * `match_id` the SMALLEST indexed near-dup at `maxHamming`.
  */
final class PhashIndexStore(spark: SparkSession, root: String, idCol: String,
                            maxHamming: Int = 3, blocks: Int = 6) {

  private val cfg = TableConfig("phidx_sigs", null, Seq(idCol, "band"))
  private val sigs = new MorStore(spark, s"$root/sigs", "band", cfg)

  // the banding geometry is part of the on-disk layout: which band
  // keys exist (and what they select from the 64-bit hash) follows
  // from (maxHamming, blocks) — reopening under different values makes
  // stored and probe-side band keys stop colliding SILENTLY (recall
  // loss, not an error). Stamped once, verified on every first-op.
  private val SigStamp = s"ham=$maxHamming;blocks=$blocks;bits=64"
  @volatile private var sigChecked = false
  private def ensureSig(): Unit = if (!sigChecked) {
    StoreFormat.ensure(spark, root, "_sig", SigStamp, "phash index")
    sigChecked = true
  }

  def isEmpty: Boolean = sigs.read.isEmpty

  /** Live segment fan-in — the probe's read amplification, bounded by
    * MorStore's hot-partition auto-compaction. */
  def segmentCount: Int = sigs.liveSegments

  /** Reconciled signature-row count (id × band) — the replay-
    * convergence witness. */
  def sigRows: Long = sigs.read.map(_.count()).getOrElse(0L)

  private def indexOf(hashes: DataFrame): DataFrame =
    Dedup.simhashIndexOf(
      hashes.select(col(idCol), col("ahash").as("simhash")),
      idCol, maxHamming, bits = 64, blocks = blocks)

  // band ids run 0 until C(blocks, blocks − maxHamming) — the
  // pigeonhole split's combination count, what remove() must tombstone
  private val numBands =
    (0 until blocks).combinations(blocks - maxHamming).size

  /** Admit hashes `(id, ahash)` unscreened: their band signatures
    * become probe-visible state (stamped `adm` — the retention clock).
    * Replay reconciles by key. */
  def append(hashes: DataFrame, adm: Long = 0L): Unit = {
    ensureSig()
    sigs.mergeBatch(indexOf(hashes).withColumn(MinhashIndexStore.AdmCol, lit(adm)), cfg)
    StoreFormat.bumpFloor(spark, root, adm)
  }

  /** Highest admission stamp ever appended (persisted, never
    * regresses) — the drains' checkpoint-re-creation clock base; see
    * [[MinhashIndexStore.admFloor]]. */
  def admFloor: Option[Long] = StoreFormat.readFloor(spark, root)

  /** Remove ids from probe visibility: equality-delete tombstones at
    * every band — O(ids · bands) appended bytes through the MorStore
    * delta path, the [[MinhashIndexStore.remove]] contract. */
  def remove(ids: DataFrame): Unit = {
    ensureSig()
    sigs.delete(ids.select(col(idCol)).distinct()
      .select(col(idCol),
        explode(sequence(lit(0), lit(numBands - 1))).as("band")))
  }

  /** RETENTION: evict every id whose latest admission stamp precedes
    * `beforeAdm` — [[MinhashIndexStore.expire]]'s contract verbatim
    * (tombstones through the delta path; expired near-dups re-admit;
    * pre-stamp rows never expire; one narrow scan per call). */
  def expire(beforeAdm: Long): Long = {
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

  /** Segment GC: re-materialize the live signature rows, physically
    * dropping tombstone winners (legal: no reconcile cursor — see
    * [[MinhashIndexStore.gcTombstones]]). Pinned to the read's version:
    * a concurrent door delta in the read→publish window REFUSES loudly
    * instead of being silently dropped (the family contract). */
  def gcTombstones(): Unit =
    sigs.readVersioned.foreach { case (df, v) => sigs.snapshotFrom(df, Some(v)) }

  /** The probe's REJECT side, attributed: one `(id, match_id)` row per
    * batch doc with an indexed near-dup within `maxHamming`,
    * `match_id` the smallest matching indexed id. Cost: the narrow
    * stored-signature scan with the batch index broadcast, Hamming
    * verified inline on the banded candidates. */
  def probeMatches(batch: DataFrame): DataFrame = {
    ensureSig()
    if (isEmpty)
      return batch.select(col(idCol), col(idCol).as("match_id")).filter(lit(false))
    val nb = indexOf(batch).toDF("ida", "sima", "band", "bandHash")
    val cb = sigs.read.get.select(col(idCol).as("idb"),
      col("simhash").as("simb"), col("band"), col("bandHash"))
    cb.join(broadcast(nb), Seq("band", "bandHash"))
      .filter(col("ida") =!= col("idb") &&
        Dedup.hamming(col("sima"), col("simb")) <= maxHamming)
      .groupBy(col("ida")).agg(min(col("idb")).as("match_id"))
      .select(col("ida").as(idCol), col("match_id"))
  }

  /** Batch rows that survive screening against the indexed corpus. */
  def probe(batch: DataFrame): DataFrame =
    if (isEmpty) batch
    else batch.join(probeMatches(batch), Seq(idCol), "left_anti")

  /** The CDC tick with the reject side attributed: screen, admit the
    * survivors (their signatures persist), return
    * `(survivors, matches)` — ONE probe pass feeds both. `batch` must
    * carry `(idCol, ahash)`; extra columns ride along on the survivor
    * side. Same replay contract as [[MinhashIndexStore.ingest]]:
    * the STORE converges; the survivor list is at-least-once. */
  def ingestWithMatches(batch: DataFrame,
                        adm: Long = 0L): (DataFrame, DataFrame) = {
    val matches = probeMatches(batch).localCheckpoint(false)
    val survivors = batch.join(matches, Seq(idCol), "left_anti")
      .localCheckpoint(false)
    if (!survivors.isEmpty)
      append(survivors.select(col(idCol), col("ahash")), adm)
    (survivors, matches)
  }

  /** [[ingestWithMatches]]' survivor side alone. */
  def ingest(batch: DataFrame, adm: Long = 0L): DataFrame =
    ingestWithMatches(batch, adm)._1
}
