package graft.llm

import graft.pipeline.ManifestStore
import graft.schema.TableConfig
import org.apache.spark.sql.{DataFrame, SparkSession}

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
  * degrades recall — the standard IVF operating model). Vectors are
  * treated as insert-only-or-stable: re-appending an id with the SAME
  * embedding is an idempotent per-cell upsert, but a CHANGED embedding
  * may move cells, and the old cell's row would survive — delete first
  * or rebuild for mutable corpora.
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
