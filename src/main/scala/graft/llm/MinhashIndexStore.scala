package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.ManifestStore
import graft.schema.TableConfig

/** Persistent MinHash-LSH dedup index (Broder '97 resemblance sketches
  * in banded LSH form) — the INCREMENTAL-STATE form of
  * [[Dedup.nearDedupIncremental]].
  *
  * `nearDedupIncremental` re-shingles and re-hashes the WHOLE corpus on
  * every batch — O(corpus) CPU per tick, which is the wrong shape for a
  * daily-crawl pipeline admitting batches against a 100 TB corpus. This
  * store computes each document's band signatures ONCE, at admission,
  * and keeps them in a manifest table: a probe costs one scan of the
  * NARROW signature table (three columns — a few percent of corpus
  * bytes, never the corpus text) joined against the broadcast batch
  * signatures, plus exact Jaccard verification restricted to candidate
  * ids, whose texts are fetched from the text table through a broadcast
  * semi probe. The embeddings twin of this pattern is
  * [[IvfIndexStore]]; at full scale the text table is the lakehouse
  * table itself (id-clustered via `pipeline/Layout`, so the candidate
  * fetch also file-skips).
  *
  * Semantics are EXACTLY `nearDedupIncremental`'s: a batch is screened
  * against the accumulated corpus (not against itself), with the same
  * seeded signatures and the same exact-Jaccard verification — the spec
  * asserts probe ≡ the recompute form on every fixture.
  *
  * Crash contract: both sub-tables commit atomically (manifest rename)
  * and upserts are idempotent by key — a crash between the text and
  * signature commits leaves the batch partially invisible to probes
  * until the tick REPLAYS, which heals the store (the same replay
  * contract as the engine's other stores).
  */
final class MinhashIndexStore(spark: SparkSession, root: String,
                              numHashes: Int = 64, bands: Int = 16,
                              shingleSize: Int = 3) {

  private val sigs = new ManifestStore(spark, s"$root/sigs", "band")
  private val txts = new ManifestStore(spark, s"$root/texts", "__tp")

  def isEmpty: Boolean = sigs.read.isEmpty

  /** The admitted corpus as (id, text) — what probes screen against. */
  def indexedDocs: Option[DataFrame] = txts.read.map(_.drop("__tp"))

  /** Admit documents: their signatures and texts become probe-visible
    * state. Idempotent by (id, band) / (id) — replaying a batch is a
    * no-op restatement. */
  def append(docs: DataFrame, idCol: String, textCol: String): Unit = {
    txts.upsert(
      docs.select(col(idCol), col(textCol))
        .withColumn("__tp", pmod(col(idCol), lit(16L))),
      TableConfig("mhidx_texts", null, Seq(idCol)))
    sigs.upsert(
      Dedup.minhashBands(Dedup.parallelize(docs), idCol, textCol,
        numHashes, bands, shingleSize),
      TableConfig("mhidx_sigs", null, Seq(idCol, "band")))
  }

  /** Batch docs that survive screening against the indexed corpus:
    * no indexed near-dup at `threshold` n-gram Jaccard. The batch is
    * NOT screened against itself (admission order decides, exactly as
    * in the recompute form). */
  def probe(newDocs: DataFrame, idCol: String, textCol: String,
            threshold: Double = 0.8): DataFrame = {
    if (isEmpty) return newDocs
    val nb = Dedup.minhashBands(Dedup.parallelize(newDocs), idCol, textCol,
      numHashes, bands, shingleSize).toDF("ida", "band", "bandHash")
    val cb = sigs.read.get.select(col(idCol).as("idb"), col("band"), col("bandHash"))
    // batch side broadcast: the stored-signature scan is the only
    // corpus-sized pass in the probe, and it is the narrow one.
    // ida =!= idb: a SAME-ID hit is this very document re-delivered
    // (CDC replay), which is a restatement, never a duplicate — this
    // is what makes ingest replay idempotent
    val cand = cb.join(broadcast(nb), Seq("band", "bandHash"))
      .filter(col("ida") =!= col("idb"))
      .select("ida", "idb").distinct()
      .localCheckpoint(false)
    val texts = newDocs.select(col(idCol), col(textCol))
      .unionByName(txts.read.get.select(col(idCol), col(textCol)))
    val dup = Dedup.jaccardVerify(cand, texts, idCol, textCol, shingleSize)
      .filter(col("jaccard") >= threshold)
      .select(col("ida").as(idCol)).distinct()
    newDocs.join(dup, Seq(idCol), "left_anti")
  }

  /** The CDC tick: screen the batch, admit only the survivors, return
    * them. Replay-safe at the STATE level: re-running a delivered batch
    * never changes the store (idempotent upserts; same-id hits are
    * restatements) and never loses an admitted doc. The returned
    * survivor list of a replay may be smaller — a first-tick survivor
    * whose in-batch near-dup twin was also admitted now reads as a dup
    * of store content, which is the truthful answer. */
  def ingest(newDocs: DataFrame, idCol: String, textCol: String,
             threshold: Double = 0.8): DataFrame = {
    val survivors = probe(newDocs, idCol, textCol, threshold)
      .localCheckpoint(false)
    append(survivors, idCol, textCol)
    survivors
  }
}
