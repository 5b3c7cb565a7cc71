package graft.llm

import graft.merge.MergeEngine
import graft.pipeline.ManifestStore
import graft.schema.TableConfig
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{abs, broadcast, col, lit, pmod, xxhash64}

/** Persistent IVF index with O(batch) maintenance: the index lives as a
  * CELL-PARTITIONED table ([[graft.pipeline.ManifestStore]] keyed on the
  * centroid cell), so the two operations that matter at corpus scale are
  * both sublinear in the index size:
  *
  *   - '''append''': assign only the incoming batch to cells
  *     ([[Similarity.buildIvfIndex]] with FROZEN centroids — one narrow
  *     map over the batch) and merge it in; only the touched cells'
  *     segments are written, committed atomically by one manifest
  *     rename. The full index is never rewritten, and `maxSegments`
  *     auto-compaction keeps read amplification bounded over an
  *     unbounded ingest cadence.
  *   - '''probe''': read ONLY the `nprobe` nearest cells' segments
  *     (manifest-level partition pruning — unscanned cells cost zero
  *     IO, the file-level analogue of `ivfTopK`'s cell filter) and
  *     exact-cosine rank inside them.
  *
  * Centroids are frozen at construction (train once with
  * [[Similarity.trainIvfCentroids]], re-train offline when drift
  * degrades recall — the standard IVF operating model). [[append]]
  * treats vectors as insert-only-or-stable: re-appending an id with the
  * SAME embedding is an idempotent per-cell upsert, but a CHANGED
  * embedding may move cells, leaving a stale row behind — use
  * [[upsertEmbeddings]] (or [[delete]] + append) for mutable corpora.
  *
  * '''id→cell secondary index''' (`idIndex = true`): heavy re-embed
  * pipelines flip this on to replace the delete/upsert PROBE SCAN — a
  * column-pruned read of every live segment's (id, cell) columns — with
  * an equi-join against a small (id, cell) ManifestStore partitioned on
  * an id-hash bucket, so resolving a batch's touched cells reads only
  * the batch's buckets of a two-column table: O(batch buckets), not
  * O(index segments). Consistency contract: the secondary index is an
  * ACCELERATION structure holding a SUPERSET of each id's live cells —
  * fresh entries are added BEFORE the main index's atomic commit and
  * stale ones cleaned after it, so a crash anywhere leaves probes
  * over-reading (harmless extra cells) and never under-reading (the
  * stale-row bug). Readers of the main index still see exactly one
  * manifest — the single-rename atomicity of [[upsertEmbeddings]] is
  * unchanged.
  */
final class IvfIndexStore(spark: SparkSession, root: String,
                          embCol: String, idCol: String,
                          centroids: Array[Array[Float]],
                          idIndex: Boolean = false,
                          books: Option[Pq.Codebooks] = None) {
  require(centroids.nonEmpty, "IvfIndexStore needs at least one centroid")

  private val store = new ManifestStore(spark, root, "cell")
  private val cfg = TableConfig("ivf_index", null, Seq(idCol))

  /** Bucket count of the secondary index: bounds the partition fan-out
    * of the two-column table; a batch's cell resolution reads at most
    * this many partitions however large the main index grows. */
  private val IdBuckets = 32
  private val idStore = new ManifestStore(spark, s"$root/__ids", "bucket")
  private val idCfg = TableConfig("ivf_ids", null, Seq(idCol, "cell"))

  private def withBucket(df: DataFrame): DataFrame =
    df.withColumn("bucket", pmod(abs(xxhash64(col(idCol))), lit(IdBuckets)).cast("string"))

  /** Record (id, cell) assignments in the secondary index (superset
    * add — the pre-commit half of the consistency contract). */
  private def indexAdd(assigned: DataFrame): Unit =
    if (idIndex)
      idStore.upsert(withBucket(assigned.select(col(idCol), col("cell"))), idCfg)

  /** Replace the batch ids' secondary-index rows with exactly `fresh`
    * (empty = delete) — the post-commit cleanup half. */
  private def indexReplace(idsOnly: DataFrame, fresh: DataFrame): Unit = if (idIndex) {
    val keyed = withBucket(idsOnly.select(col(idCol)))
    val buckets = keyed.select(col("bucket")).distinct()
      .collect().map(_.getString(0)).toSeq
    idStore.readPartitions(buckets).foreach { slice =>
      val remainder = slice.join(broadcast(idsOnly.select(col(idCol))), Seq(idCol), "left_anti")
      idStore.replacePartitions(
        remainder.unionByName(withBucket(fresh.select(col(idCol), col("cell")))), buckets)
    }
  }

  /** The (cell) frame the probe resolves — via the bucket-pruned
    * secondary index when enabled (an equi-join over two columns), via
    * the main segments' column-pruned scan otherwise. Exposed for the
    * probe-elimination assertion in IvfIndexStoreSpec. */
  private[llm] def cellProbeFrame(idsOnly: DataFrame): Option[DataFrame] =
    // the secondary index is only trusted once it exists: enabling
    // idIndex over a store populated WITHOUT it falls back to the main
    // probe scan (under-probing is the one failure the contract forbids)
    if (idIndex && idStore.latestManifestVersion.isDefined) {
      val buckets = withBucket(idsOnly).select(col("bucket")).distinct()
        .collect().map(_.getString(0)).toSeq
      idStore.readPartitions(buckets).map(
        _.join(broadcast(idsOnly), Seq(idCol), "left_semi")
          .select(col("cell").cast("string")).distinct())
    } else store.read.map(
      _.join(broadcast(idsOnly), Seq(idCol), "left_semi")
        .select(col("cell").cast("string")).distinct())

  private def resolveCells(idsOnly: DataFrame): Seq[String] =
    cellProbeFrame(idsOnly).map(_.collect().map(_.getString(0)).toSeq)
      .getOrElse(Seq.empty)

  /** Assign `batch` to cells and merge — touched cells only. Returns the
    * cell values written. */
  /** Cell assignment plus, when the store carries PQ codebooks, the
    * stored code word — encoded once at WRITE time so probes can scan
    * codes without touching the vectors. */
  private def buildRows(batch: DataFrame): DataFrame = {
    val b = Similarity.buildIvfIndex(batch, embCol, centroids)
    books.fold(b)(bk => b.withColumn("pq_codes", Pq.encode(col(embCol), bk)))
  }

  def append(batch: DataFrame, maxSegments: Int = 16): Seq[String] = {
    val built = buildRows(batch)
    // checkpoint only when the assignment feeds BOTH stores
    val assigned = if (idIndex) built.localCheckpoint(false) else built
    indexAdd(assigned)
    store.upsert(assigned, cfg, maxSegments)
  }

  /** The whole index (all cells), e.g. for recall audits. */
  def read: Option[DataFrame] = store.read

  def liveSegments: Int = store.liveSegments

  /** Tombstone path: remove `ids` (any frame carrying `idCol`) from the
    * index. The cells holding them come from the secondary index when
    * enabled (bucket-pruned equi-join), else from one id-column probe of
    * the live segments (column-pruned parquet scan — the honest price of
    * probing without the index); only those cells are rewritten
    * (anti-join inside the touched slice), committed atomically, and a
    * cell emptied entirely is dropped from the manifest rather than
    * resurrecting its old segment. Returns the cells rewritten. */
  def delete(ids: DataFrame): Seq[String] = store.read match {
    case None => Seq.empty
    case Some(_) =>
      val idsOnly = broadcast(ids.select(col(idCol)).distinct())
      val touched = resolveCells(idsOnly)
      if (touched.isEmpty) Seq.empty
      else {
        val remaining = store.readPartitions(touched).get
          .join(idsOnly, Seq(idCol), "left_anti")
        store.replacePartitions(remaining, touched)
        // post-commit cleanup: drop the deleted ids' index rows; a crash
        // first leaves supersets (over-probing), never under-probing
        indexReplace(idsOnly, idsOnly.filter(lit(false))
          .withColumn("cell", lit(null).cast("int")))
        touched
      }
  }

  /** Re-embed upsert for MUTABLE corpora, atomic for readers: the cells
    * a batch id currently occupies and the cells its fresh embedding
    * lands in are resolved FIRST, then the anti-joined remainder of the
    * old cells and the fresh assignment commit together in ONE manifest
    * rename ([[ManifestStore.replacePartitions]]). A reader — or a crash
    * at any point — therefore sees the fully-old or fully-new index,
    * never a window where the batch's ids are absent (the two-commit
    * delete-then-append shape this replaces had exactly that window).
    * Only the touched cells are rewritten; untouched cells' segments are
    * never read or moved. With `idIndex` on, the current-cell resolution
    * is the secondary index's bucket-pruned equi-join instead of a probe
    * scan, fresh assignments are indexed BEFORE the commit and stale
    * entries cleaned after it (see the class contract). Returns the
    * cells rewritten. */
  def upsertEmbeddings(batch: DataFrame, maxSegments: Int = 16): Seq[String] =
    store.read match {
      case None => append(batch, maxSegments)
      case Some(_) =>
        // duplicate ids within one batch collapse to one row, the same
        // latest-per-key contract append's upsert applies
        val fresh = MergeEngine.latestPerKey(
          buildRows(batch), Seq(idCol), Seq.empty)
          .localCheckpoint(false) // feeds cell probe AND the commit union
        val idsOnly = broadcast(fresh.select(col(idCol)).distinct())
        val oldCells = resolveCells(idsOnly)
        val newCells = fresh.select(col("cell").cast("string")).distinct()
          .collect().map(_.getString(0)).toSeq
        val touched = (oldCells ++ newCells).distinct
        if (touched.isEmpty) Seq.empty // empty batch: no commit, no-op
        else {
          indexAdd(fresh) // superset BEFORE the main commit
          val remaining = store.readPartitions(touched).get
            .join(idsOnly, Seq(idCol), "left_anti")
          store.replacePartitions(remaining.unionByName(fresh), touched)
          if (maxSegments > 0 && store.liveSegments > maxSegments) store.compact()
          indexReplace(idsOnly, fresh) // exact-current AFTER it
          touched
        }
    }

  /** Exact-cosine top-k inside the `nprobe` cells nearest the query —
    * a partition-pruned read of `nprobe`/`k_cells` of the index. */
  def topK(query: Array[Float], k: Int, nprobe: Int = 2): DataFrame = {
    val cells = centroids.indices
      .sortBy(c => -Similarity.cosArr(query, centroids(c))).take(nprobe)
    val probed = store.readPartitions(cells.map(_.toString))
      .getOrElse(throw new IllegalStateException(s"IVF index at $root is empty"))
    Similarity.bruteForceTopK(probed, embCol, idCol, query, k)
  }

  /** The persistent IVF-PQ probe: partition pruning cuts the scan to
    * `nprobe` cells, and inside them ONLY the stored 8-byte code words
    * are read (parquet column pruning — the vector column never leaves
    * disk unless `rerank` > 0 asks for the exact-cosine refine). This
    * is the compound bandwidth story: nprobe/k_cells × 1/32 of the
    * index bytes per query. Requires the store to have been built with
    * `books`. */
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
