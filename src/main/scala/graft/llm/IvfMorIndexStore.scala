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
  * Centroids are frozen at construction, exactly as in the CoW store.
  */
final class IvfMorIndexStore(spark: SparkSession, root: String,
                             embCol: String, idCol: String,
                             centroids: Array[Array[Float]],
                             books: Option[Pq.Codebooks] = None) {
  require(centroids.nonEmpty, "IvfMorIndexStore needs at least one centroid")

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
    * to the identical state by (id, cell) key. */
  def upsert(batch: DataFrame): Unit = {
    val fresh = buildRows(
      graft.merge.MergeEngine.latestPerKey(batch, Seq(idCol), Seq.empty))
      .localCheckpoint(false)
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
  }

  /** Remove ids from probe visibility: tombstones at every known
    * residence, O(ids) appended bytes. */
  def delete(ids: DataFrame): Unit = {
    val idsOnly = ids.select(col(idCol)).distinct().localCheckpoint(false)
    val known = knownResidences(idsOnly).localCheckpoint(false)
    store.delete(known.select(col("cell"), col(idCol)))
    idStore.delete(withBucket(known))
    store.compactHot(); idStore.compactHot()
  }

  /** The reconciled index (all cells). */
  def read: Option[DataFrame] = store.read

  /** (cell segments, id-superset segments) — the probe's read
    * amplification, bounded by compactHot. */
  def segmentCounts: (Int, Int) = (store.liveSegments, idStore.liveSegments)

  /** Exact-cosine top-k inside the `nprobe` cells nearest the query —
    * a partition-pruned reconciled read. */
  def topK(query: Array[Float], k: Int, nprobe: Int = 2): DataFrame = {
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
