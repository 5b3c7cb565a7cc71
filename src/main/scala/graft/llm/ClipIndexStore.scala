package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.MorStore
import graft.schema.TableConfig

/** Persistent embedded-CLIP admission index — the VIDEO twin of
  * [[MinhashIndexStore]] (text) / [[PhashIndexStore]] (images), with
  * [[Dedup.frameClipPairs]]' temporal-alignment vote as the screen: a
  * candidate video is rejected when ≥ `minFrames` of its sampled frame
  * hashes match ONE indexed video at ONE consistent temporal offset —
  * so a video containing a segment of an already-admitted one is caught
  * even though whole-stream fingerprints (and any single-signature
  * store) disagree.
  *
  * State is ONE merge-on-read table of frame-hash rows
  * `(id, frame, hash)` keyed by (id, frame) and partitioned by a hash
  * bucket (compaction locality; the probe is hash-keyed, not
  * partition-pruned). A probe is one narrow scan of the stored frame
  * rows joined against the BROADCAST batch frames on the hash — only
  * frames SHARING a signature ever meet (inverted index, never
  * all-pairs), then one count per `(batch id, indexed id, offset)`
  * vote cell. O(frames-per-video) state rows per admitted video;
  * replaying a batch reconciles by (id, frame) key.
  *
  * Ingest semantics are the family contract verbatim: a batch is never
  * screened against itself (admission order decides), same-id frame
  * hits are re-deliveries (the `ida =!= idb` exemption that makes
  * replays converge), and [[ingestWithMatches]] feeds an audited
  * caller: one probe pass yields both the screen and the
  * `(id, match_id)` reject relation, `match_id` the SMALLEST indexed
  * video with a qualifying vote cell.
  *
  * `maxHashDf > 0` drops stored hashes occurring in more than that many
  * stored frames BEFORE the join — the stop-hash guard (a black-frame
  * hash shared by every video would otherwise go quadratic). The cap is
  * computed over the stored side only: that is the side that grows
  * unboundedly; the batch side is O(batch) by construction. Cost: one
  * partial-aggregated count over the SAME narrow (hash) column the
  * probe already scans — a 2× constant on the per-tick stored read,
  * not a new asymptotic term (the probe's tick is O(index scan)
  * either way, the family's published shape).
  *
  * `buckets` sizes the frame table's partition fan-out (the siblings'
  * pattern — a constructor knob, not a constant): 16 fits fixture
  * scale; a 10⁹-frame index wants enough buckets that one bucket's
  * winner slice fits a compaction task. The bucket function is part of
  * the on-disk layout (tombstones must land beside their live rows),
  * so reopen an existing store with the bucket count it was built
  * with. `broadcastFrameLimit` bounds the probe's broadcast side: a
  * micro-batch is small by construction, but a caller probing a BULK
  * batch beyond the limit falls back to a shuffle join instead of
  * materializing the batch on the driver. */
final class ClipIndexStore(spark: SparkSession, root: String,
                           idCol: String, frameCol: String, hashCol: String,
                           minFrames: Int, maxHashDf: Int = 0,
                           buckets: Int = 16,
                           broadcastFrameLimit: Long = 4L * 1000 * 1000) {
  require(minFrames >= 1, "minFrames must be positive")
  require(buckets >= 1, "buckets must be positive")

  private val cfg = TableConfig("clipidx_frames", null, Seq(idCol, frameCol))
  private val frames = new MorStore(spark, s"$root/frames", "hb", cfg)

  // the bucket function is part of the on-disk layout: tombstones must
  // land in the same partition as their live rows, so reopening a store
  // under a different bucket count would mis-partition every later
  // delete (a partition-scoped compaction could then resurrect removed
  // rows). Stamped once, verified on every first-op.
  private val FormatStamp = s"hb=pmod(xxhash64(hash),$buckets);v=1"
  @volatile private var formatChecked = false
  private def ensureFormat(): Unit = if (!formatChecked) {
    StoreFormat.ensure(spark, root, "_format", FormatStamp, "clip index")
    formatChecked = true
  }

  def isEmpty: Boolean = frames.read.isEmpty

  /** Live segment fan-in — the probe's read amplification, bounded by
    * MorStore's hot-partition auto-compaction. */
  def segmentCount: Int = frames.liveSegments

  /** Reconciled frame-row count (id × frame) — the replay-convergence
    * witness. */
  def frameRows: Long = frames.read.map(_.count()).getOrElse(0L)

  private def withBucket(fr: DataFrame): DataFrame =
    fr.select(col(idCol), col(frameCol), col(hashCol),
      pmod(xxhash64(col(hashCol)), lit(buckets)).as("hb"))

  /** Admit frame rows `(id, frame, hash)` unscreened: they become
    * probe-visible state (stamped `adm` — the retention clock).
    * Replay reconciles by (id, frame). */
  def append(fr: DataFrame, adm: Long = 0L): Unit = {
    ensureFormat()
    frames.mergeBatch(withBucket(fr)
      .withColumn(MinhashIndexStore.AdmCol, lit(adm)), cfg)
    StoreFormat.bumpFloor(spark, root, adm)
  }

  /** Highest admission stamp ever appended (persisted, never
    * regresses) — the drains' checkpoint-re-creation clock base; see
    * [[MinhashIndexStore.admFloor]]. */
  def admFloor: Option[Long] = StoreFormat.readFloor(spark, root)

  /** Remove videos from probe visibility: tombstones at every stored
    * (id, frame) residence. The frame table partitions on a HASH
    * bucket, so the tombstones are derived from the stored rows
    * themselves (an id-semi-joined scan — the partition of each live
    * row is only knowable from its hash); O(ids' frames) appended
    * bytes through the delta path. */
  def remove(ids: DataFrame): Unit = {
    ensureFormat()
    val idOnly = ids.select(col(idCol)).distinct()
    frames.read.foreach { st =>
      val doomed = st.join(broadcast(idOnly), Seq(idCol), "left_semi")
        .select(col(idCol), col(frameCol), col("hb")).localCheckpoint(false)
      if (!doomed.isEmpty) frames.delete(doomed)
    }
  }

  /** RETENTION: evict every video whose latest admission stamp
    * precedes `beforeAdm` — [[MinhashIndexStore.expire]]'s contract
    * verbatim (tombstones through the delta path; an expired clip
    * source stops screening so its re-delivery re-admits; pre-stamp
    * rows never expire; one narrow scan per call). */
  def expire(beforeAdm: Long): Long = {
    val expired = frames.read match {
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

  /** Segment GC: re-materialize the live frame rows, physically
    * dropping tombstone winners (legal: no reconcile cursor — see
    * [[MinhashIndexStore.gcTombstones]]). Pinned to the read's version:
    * a concurrent door delta in the read→publish window REFUSES loudly
    * instead of being silently dropped (the family contract). */
  def gcTombstones(): Unit =
    frames.readVersioned.foreach { case (df, v) => frames.snapshotFrom(df, Some(v)) }

  /** The probe's REJECT side, attributed: one `(id, match_id)` row per
    * batch video with a qualifying vote cell against the index,
    * `match_id` the smallest matching indexed id. Cost: the narrow
    * stored-frame scan with the batch frames broadcast, joined on the
    * hash, one partial-aggregated count per (pair, offset) cell. */
  def probeMatches(batch: DataFrame): DataFrame = {
    ensureFormat()
    if (isEmpty)
      return batch.select(col(idCol), col(idCol).as("match_id")).filter(lit(false))
    val stored0 = frames.read.get
      .select(col(idCol).as("idb"), col(frameCol).as("fb"), col(hashCol).as("h"))
    val stored =
      if (maxHashDf <= 0) stored0
      else {
        val keep = stored0.groupBy("h").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= maxHashDf).select("h")
        stored0.join(keep, Seq("h"))
      }
    val nb = batch.select(col(idCol).as("ida"), col(frameCol).as("fa"),
      col(hashCol).as("h"))
    // broadcast the batch only while it provably fits: limit+1 probes
    // whether the frame count exceeds the ceiling without a full count
    // of a large batch — past it, the hash equi-join shuffles instead
    // (same answer, batch-side exchange instead of a driver broadcast)
    val probeCap = math.min(broadcastFrameLimit + 1, Int.MaxValue.toLong).toInt
    val small = nb.limit(probeCap).count() <= broadcastFrameLimit
    stored.join(if (small) broadcast(nb) else nb, Seq("h"))
      .filter(col("ida") =!= col("idb"))
      .groupBy(col("ida"), col("idb"), (col("fb") - col("fa")).as("offset"))
      .agg(countDistinct(col("fa")).as("matched"))
      .filter(col("matched") >= minFrames)
      .groupBy(col("ida")).agg(min(col("idb")).as("match_id"))
      .select(col("ida").as(idCol), col("match_id"))
  }

  /** Batch frame rows of videos that survive screening. */
  def probe(batch: DataFrame): DataFrame =
    if (isEmpty) batch
    else batch.join(probeMatches(batch), Seq(idCol), "left_anti")

  /** The CDC tick with the reject side attributed: screen, admit the
    * surviving videos (their frame rows persist), return
    * `(survivors, matches)` — ONE probe pass feeds both. `batch` must
    * carry `(idCol, frameCol, hashCol)`; extra columns ride along on
    * the survivor side. Same replay contract as
    * [[MinhashIndexStore.ingest]]: the STORE converges; the survivor
    * list is at-least-once. */
  def ingestWithMatches(batch: DataFrame,
                        adm: Long = 0L): (DataFrame, DataFrame) = {
    val matches = probeMatches(batch).localCheckpoint(false)
    val survivors = batch.join(matches, Seq(idCol), "left_anti")
      .localCheckpoint(false)
    if (!survivors.isEmpty)
      append(survivors.select(col(idCol), col(frameCol), col(hashCol)), adm)
    (survivors, matches)
  }

  /** [[ingestWithMatches]]' survivor side alone. */
  def ingest(batch: DataFrame, adm: Long = 0L): DataFrame =
    ingestWithMatches(batch, adm)._1
}
