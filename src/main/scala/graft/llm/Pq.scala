package graft.llm

import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze, Schmid, TPAMI 2011) for the
  * embedding store: split each dim-d vector into `m` subvectors of
  * d/m components, vector-quantize each subspace against its own
  * `ksub`-centroid codebook, and represent the vector by the m code
  * bytes — 64-dim float32 (256 B) becomes m=8 codes (8 B), a 32×
  * compression, with distances answered from the codes alone.
  *
  * Scale design (100 TB of embeddings):
  *  - the codebooks are m·ksub·(d/m) floats — KBs; they broadcast as
  *    plan literals, never shuffle;
  *  - [[encode]] and [[adcMicroScore]] are NARROW codegen'd column
  *    expressions — native Catalyst expressions holding the codebooks
  *    as a plan reference object ([[graft.functions.PqIvfOps]]), so
  *    generated code stays O(1) in m·ksub and never trips janino's
  *    64 KB method limit: the encode pass is exchange-free map work,
  *    and an ADC scan reads the 8-byte codes instead of the 256-byte
  *    vectors — at corpus scale the scan is bandwidth-bound, so that
  *    32× is the wall-clock;
  *  - ADC scores are INTEGER micro-distances (floor(d·1e6 + 0.5), the
  *    same micro-quantization the NLL family uses) so the per-subspace
  *    sum is order-independent and bit-identical across engines;
  *  - training is the lowest-id-seed + one-Lloyd-step rule the IVF
  *    oracle established (engine-neutral, DuckDB-replayable): seeds
  *    collect ksub rows to the driver, the Lloyd step is one
  *    explode + partial+final aggregate over the corpus, m·ksub·(d/m)
  *    skinny rows back. A production tokenizer would iterate Lloyd —
  *    each further step is the same one-pass aggregate.
  *
  * Determinism contract (hash-checked by the DuckDB oracle):
  * subspace distance is composed as dot(v,v) − 2·dot(v,c) + dot(c,c)
  * from the native double-accumulating dot (bit-identical to DuckDB's
  * list_dot_product over the same values); refined centroids round
  * through float (CAST AS REAL) so sub-ulp double aggregation noise
  * cannot flip near-tie assignments; argmin ties resolve to the lowest
  * code on both engines.
  */
object Pq {

  /** [m][ksub][d/m] codebooks. */
  final case class Codebooks(cb: Array[Array[Array[Float]]]) {
    def m: Int = cb.length
    def ksub: Int = cb.head.length
    def dsub: Int = cb.head.head.length
  }

  /** 1-based slice of subspace j (Spark's `slice` convention). */
  private def sub(emb: Column, j: Int, dsub: Int): Column =
    slice(emb, j * dsub + 1, dsub)

  /** The full code word as array<int> of length m — one narrow NATIVE
    * expression ([[graft.functions.PqIvfOps.pqEncode]], codebooks as a
    * plan reference object), no shuffle, no explode. The previous
    * literal-tree form (m·ksub distance subtrees inlined) tripped
    * janino's 64 KB method limit once composed with the IVF cell in
    * one projection, silently de-codegen-ing the index-build stage. */
  def encode(emb: Column, books: Codebooks): Column =
    graft.functions.PqIvfOps.pqEncode(emb, books.cb)

  /** Train per-subspace codebooks with the engine-neutral rule: seeds
    * are the subvectors of the `ksub` lowest-id corpus rows; one Lloyd
    * refinement assigns every subvector to its nearest seed and
    * averages each (subspace, code) cell (empty cell keeps its seed).
    * The corpus-side pass is ONE explode + aggregate; only
    * m·ksub·(d/m) component means collect back. */
  def trainCodebooks(embs: DataFrame, embCol: String, idCol: String,
                     m: Int, ksub: Int): Codebooks = {
    val seeds = embs.orderBy(col(idCol).asc).limit(ksub)
      .select(embCol).collect().map(_.getSeq[Float](0).toArray)
    require(seeds.length == ksub, s"corpus smaller than ksub=$ksub")
    val dim = seeds.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val seedBooks = Codebooks(Array.tabulate(m, ksub)((j, c) =>
      seeds(c).slice(j * dsub, (j + 1) * dsub)))

    // one Lloyd step: skinny (subspace, code, pos, component) aggregate.
    // The code word binds ONCE per row (one native encode) and each
    // subspace struct reads its element — not m independent argmin trees
    val subRows = embs
      .select(col(embCol), encode(col(embCol), seedBooks).as("__codes"))
      .select(explode(array((0 until m).map(j =>
        struct(lit(j).as("s"),
          element_at(col("__codes"), j + 1).as("c"),
          sub(col(embCol), j, dsub).as("v"))): _*)).as("sv"))
      .select(col("sv.s").as("s"), col("sv.c").as("c"), col("sv.v").as("v"))
    val comps = subRows
      .select(col("s"), col("c"), posexplode(col("v")).as(Seq("p", "x")))
      .groupBy("s", "c", "p").agg(avg(col("x").cast("double")).as("mu"))
      .collect()
    val refined = Array.tabulate(m, ksub)((j, c) => seedBooks.cb(j)(c).clone())
    comps.foreach { r =>
      refined(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3).toFloat
    }
    Codebooks(refined)
  }

  /** Integer micro-distance table for a query: micro(j)(c) =
    * floor(1e6 · ||q_j − c||² + 0.5), computed driver-side with the
    * SAME left-to-right double accumulation as the engines. */
  def queryMicroDists(query: Array[Float], books: Codebooks): Array[Array[Long]] = {
    require(query.length == books.m * books.dsub, "query/codebook dim mismatch")
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    Array.tabulate(books.m) { j =>
      val q = query.slice(j * books.dsub, (j + 1) * books.dsub).map(_.toDouble)
      books.cb(j).map { c =>
        val cd = c.map(_.toDouble)
        val dist = dot(q, q) - 2.0 * dot(q, cd) + dot(cd, cd)
        math.floor(dist * 1e6 + 0.5).toLong
      }
    }
  }

  /** Asymmetric-distance (ADC) score of a vector against the query:
    * the sum of the m table lookups on the vector's codes — a narrow
    * integer expression over the code word, no shuffle, exchange-free
    * until the final top-k. */
  def adcMicroScore(emb: Column, books: Codebooks, query: Array[Float]): Column =
    graft.functions.PqIvfOps.adcFromCodes(
      encode(emb, books), queryMicroDists(query, books))

  /** ADC score over a STORED code word (array<int> of length m) — the
    * scan shape of a persisted code table: no vector column is
    * touched, parquet column pruning reads the 8-byte codes only. */
  def adcMicroScoreFromCodes(codes: Column, books: Codebooks,
                             query: Array[Float]): Column =
    graft.functions.PqIvfOps.adcFromCodes(codes, queryMicroDists(query, books))

  /** IVF-PQ (the FAISS IndexIVFPQ composition, non-residual form):
    * coarse quantization picks the nprobe cells nearest the query, ADC
    * ranks inside them from the codes alone. At 100 TB this is THE
    * vector-search deployment shape: the code table is cell-partitioned
    * (IvfIndexStore's layout), a probe reads nprobe partitions of
    * 8-byte codes — cell pruning multiplies with the 32× code
    * compression. `index` must carry the `cell` column
    * ([[Similarity.buildIvfIndex]] / the IvfIndexStore layout). */
  def ivfAdcTopK(index: DataFrame, embCol: String, idCol: String,
                 query: Array[Float], k: Int, centroids: Array[Array[Float]],
                 books: Codebooks, nprobe: Int = 2, rerank: Int = 0): DataFrame = {
    val cells = centroids.indices
      .sortBy(c => -Similarity.cosArr(query, centroids(c))).take(nprobe)
    adcTopK(index.filter(col("cell").isin(cells: _*)), embCol, idCol,
      query, k, books, rerank)
  }

  /** ADC top-k: scan the codes (in production, the 8-byte code table —
    * 32× less bandwidth than the vectors), rank by integer ADC score
    * ascending with id ties, optionally re-rank the top `rerank`
    * candidates by EXACT float cosine (the standard PQ + refine
    * pipeline). */
  def adcTopK(embs: DataFrame, embCol: String, idCol: String,
              query: Array[Float], k: Int, books: Codebooks,
              rerank: Int = 0): DataFrame = {
    val scored = embs.select(col(idCol), col(embCol),
      adcMicroScore(col(embCol), books, query).as("adc_micro"))
      .orderBy(col("adc_micro").asc, col(idCol).asc)
    if (rerank <= 0) scored.limit(k).select(idCol, "adc_micro")
    else scored.limit(math.max(rerank, k))
      .select(col(idCol),
        VectorOps.vectorCosine(col(embCol),
          VectorOps.floatVectorLit(query)).as("cosine"))
      .filter(col("cosine").isNotNull)
      .orderBy(col("cosine").desc, col(idCol).asc).limit(k)
  }
}
