package graft.llm

import graft.merge.MergeEngine
import graft.pipeline.ManifestStore
import graft.schema.TableConfig
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

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
  */
final class IvfIndexStore(spark: SparkSession, root: String,
                          embCol: String, idCol: String,
                          centroids: Array[Array[Float]]) {
  require(centroids.nonEmpty, "IvfIndexStore needs at least one centroid")

  private val store = new ManifestStore(spark, root, "cell")
  private val cfg = TableConfig("ivf_index", null, Seq(idCol))

  /** Assign `batch` to cells and merge — touched cells only. Returns the
    * cell values written. */
  def append(batch: DataFrame, maxSegments: Int = 16): Seq[String] =
    store.upsert(Similarity.buildIvfIndex(batch, embCol, centroids), cfg, maxSegments)

  /** The whole index (all cells), e.g. for recall audits. */
  def read: Option[DataFrame] = store.read

  def liveSegments: Int = store.liveSegments

  /** Tombstone path: remove `ids` (any frame carrying `idCol`) from the
    * index. One id-column probe of the live segments finds the cells
    * holding them (column-pruned parquet scan — the honest price of
    * having no id→cell secondary index); only those cells are rewritten
    * (anti-join inside the touched slice), committed atomically, and a
    * cell emptied entirely is dropped from the manifest rather than
    * resurrecting its old segment. Returns the cells rewritten. */
  def delete(ids: DataFrame): Seq[String] = store.read match {
    case None => Seq.empty
    case Some(index) =>
      val idsOnly = broadcast(ids.select(col(idCol)).distinct())
      val touched = index.join(idsOnly, Seq(idCol), "left_semi")
        .select(col("cell").cast("string")).distinct()
        .collect().map(_.getString(0)).toSeq
      if (touched.isEmpty) Seq.empty
      else {
        val remaining = store.readPartitions(touched).get
          .join(idsOnly, Seq(idCol), "left_anti")
        store.replacePartitions(remaining, touched)
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
    * never read or moved. Heavy re-embed pipelines should maintain an
    * id→cell index to skip the probe scan. Returns the cells rewritten. */
  def upsertEmbeddings(batch: DataFrame, maxSegments: Int = 16): Seq[String] =
    store.read match {
      case None => append(batch, maxSegments)
      case Some(index) =>
        // duplicate ids within one batch collapse to one row, the same
        // latest-per-key contract append's upsert applies
        val fresh = MergeEngine.latestPerKey(
          Similarity.buildIvfIndex(batch, embCol, centroids), Seq(idCol), Seq.empty)
          .localCheckpoint(false) // feeds cell probe AND the commit union
        val idsOnly = broadcast(fresh.select(col(idCol)).distinct())
        val oldCells = index.join(idsOnly, Seq(idCol), "left_semi")
          .select(col("cell").cast("string")).distinct()
          .collect().map(_.getString(0)).toSeq
        val newCells = fresh.select(col("cell").cast("string")).distinct()
          .collect().map(_.getString(0)).toSeq
        val touched = (oldCells ++ newCells).distinct
        if (touched.isEmpty) Seq.empty // empty batch: no commit, no-op
        else {
          val remaining = store.readPartitions(touched).get
            .join(idsOnly, Seq(idCol), "left_anti")
          store.replacePartitions(remaining.unionByName(fresh), touched)
          if (maxSegments > 0 && store.liveSegments > maxSegments) store.compact()
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
}
