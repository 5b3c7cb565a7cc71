package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — a single scan with a per-row
  * dot product (`zip_with` + `aggregate`, all codegen; no UDF) followed by
  * a TakeOrdered top-k. That plan is already the right 100 TB shape for
  * one-off queries: O(N·d) map-side work, no shuffle of the vectors, only
  * k rows cross the wire per partition.
  *
  * Scale path: random-hyperplane LSH bucketing — sign-bit signature over H
  * seeded hyperplanes stored as a bucket column (computed once, reusable);
  * a query probes its own bucket plus every neighbor within a configurable
  * bit-flip radius (the recall/cost knob — see [[annTopK]]), cutting the
  * scan by ~2^H while keeping recall high for near-neighbors.
  */
object Similarity {
  import graft.functions.VectorOps

  /** Per-row dot against a literal query vector — the native
    * [[graft.functions.FloatVectorDot]] expression: one primitive loop in
    * whole-stage codegen (the composable `aggregate(zip_with(…))` form
    * costs three higher-order traversals per row). */
  private def dotLit(emb: Column, v: Array[Float]): Column =
    VectorOps.vectorDot(emb, VectorOps.floatVectorLit(v))

  def cosineToQuery(emb: Column, query: Array[Float]): Column =
    VectorOps.vectorCosine(emb, VectorOps.floatVectorLit(query))

  /** Brute-force cosine top-k against a literal query vector. */
  def bruteForceTopK(embs: DataFrame, embCol: String, idCol: String,
                     query: Array[Float], k: Int): DataFrame =
    embs.select(col(idCol), cosineToQuery(col(embCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)

  /** Deterministic seeded hyperplanes (H planes × d dims). Fixed seed →
    * the same bucketing on every run and every executor. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes, dim)((rnd.nextGaussian() * 0.5).toFloat)
  }

  /** Sign-bit LSH bucket id: bit h set iff dot(emb, plane_h) > 0. */
  def lshBucket(emb: Column, planes: Array[Array[Float]]): Column =
    planes.zipWithIndex.map { case (p, h) =>
      when(dotLit(emb, p) > 0, shiftleft(lit(1L), h)).otherwise(lit(0L))
    }.reduce[Column](_.bitwiseOR(_))

  /** Persistable index: the input plus its bucket column. At scale, write
    * this partitioned/bucketed by `bucket` so probes prune partitions. */
  def buildLshIndex(embs: DataFrame, embCol: String,
                    planes: Array[Array[Float]]): DataFrame =
    embs.withColumn("bucket", lshBucket(col(embCol), planes))

  private def bucketOf(q: Array[Float], planes: Array[Array[Float]]): Long =
    planes.zipWithIndex.foldLeft(0L) { case (acc, (p, h)) =>
      val dot = p.indices.map(i => p(i).toDouble * q(i)).sum
      if (dot > 0) acc | (1L << h) else acc
    }

  /** ANN top-k: probe the query's bucket plus every neighbor bucket within
    * `multiprobeRadius` bit flips, then exact cosine inside the candidate
    * set. Approximate by design — the radius is the recall/cost knob:
    * radius r scans ~Σ C(H,i)/2^H of the corpus (H=8: r=1 → 3.5%, r=2 →
    * 14%); `ann_recall` measures what each setting actually buys. The
    * candidate filter is a pushed-down IN on the bucket column. */
  def annTopK(index: DataFrame, embCol: String, idCol: String,
              query: Array[Float], k: Int, planes: Array[Array[Float]],
              multiprobeRadius: Int = 1): DataFrame = {
    val b = bucketOf(query, planes)
    // every subset of ≤ radius plane bits flipped — exact for any radius
    // (radius = planes.length degenerates to a full scan, i.e. brute force)
    val probes = (0 to math.min(multiprobeRadius, planes.length)).flatMap(r =>
      planes.indices.combinations(r).map(_.foldLeft(b)((acc, h) => acc ^ (1L << h))))
    bruteForceTopK(index.filter(col("bucket").isin(probes: _*)), embCol, idCol, query, k)
  }

  // ── IVF (inverted-file) variant: coarse quantization by centroid cell ──

  /** Deterministic coarse centroids: the k lowest-id corpus vectors as
    * seeds (a reproducible, engine-neutral sample — ids carry no content
    * signal, and any other engine can replicate the rule exactly), then
    * one Lloyd refinement step (mean of assigned vectors) for balance.
    * k centroids collect to the driver: k is small by design (√N cells is
    * typical), the CORPUS never moves.
    *
    * The per-cell mean is computed via `posexplode` + groupBy(cell, pos) —
    * k·dim skinny rows through one partial+final aggregate — NOT one agg
    * column per dimension (1024-d would mean 1024 aggregate expressions and
    * a codegen blowup; this shape is width-independent). */
  def ivfCentroids(embs: DataFrame, embCol: String, idCol: String, k: Int): Array[Array[Float]] = {
    val seeds = embs.orderBy(col(idCol).asc).limit(k)
      .select(embCol).collect().map(_.getSeq[Float](0).toArray)
    // one refinement pass: assign to nearest seed, average each cell
    lloydStep(embs, embCol, seeds)
  }

  /** One Lloyd step over the FULL corpus as DataFrame aggregates: assign
    * every vector to its nearest centroid, then average each cell.
    * Degenerate cell -1 rows (zero-norm/NULL) are excluded — they have no
    * usable cosine; an EMPTY cell keeps its previous centroid.
    *
    * The per-cell mean is computed via `posexplode` + groupBy(cell, pos) —
    * k·dim skinny rows through one partial+final aggregate — NOT one agg
    * column per dimension (1024-d would mean 1024 aggregate expressions and
    * a codegen blowup; this shape is width-independent). */
  private def lloydStep(embs: DataFrame, embCol: String,
                        cents: Array[Array[Float]]): Array[Array[Float]] = {
    val comps = embs.withColumn("__cell", cellOf(col(embCol), cents))
      .filter(col("__cell") >= 0)
      .select(col("__cell"), posexplode(col(embCol)).as(Seq("__pos", "__v")))
      .groupBy("__cell", "__pos").agg(avg(col("__v").cast("double")).as("__m"))
      .collect()
    val dim = cents.head.length
    val refined = comps.groupBy(_.getInt(0)).map { case (cell, rows) =>
      val c = new Array[Float](dim)
      rows.foreach(r => c(r.getInt(1)) = r.getDouble(2).toFloat)
      cell -> c
    }
    Array.tabulate(cents.length)(c => refined.getOrElse(c, cents(c)))
  }

  private[llm] def cosArr(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    if (na == 0 || nb == 0) -1.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** REAL IVF centroid training — the index-build path for k in the
    * hundreds (√N cells at corpus scale), where [[ivfCentroids]]'s
    * lowest-id seeding is only an oracle-replayable toy:
    *
    *   1. a deterministic hash-ordered SAMPLE (the `sampleSize` smallest
    *      `xxhash64(id)` rows — partition-layout independent, unlike
    *      `df.sample`) collects to the driver: k-means++ is inherently
    *      sequential, and 50·k vectors is MBs, not the corpus;
    *   2. k-means++ seeding on the sample (D² sampling with cosine
    *      distance — spherical k-means, the right metric for the cosine
    *      search the index serves);
    *   3. `lloydIters` Lloyd refinements over the FULL corpus as
    *      DataFrame aggregates — each step one assign+mean pass, the
    *      same partial+final agg shape at any corpus size.
    *
    * Deterministic for a fixed seed: sampling is hash-ordered, the RNG is
    * seeded, Lloyd is exact arithmetic. */
  def trainIvfCentroids(embs: DataFrame, embCol: String, idCol: String, k: Int,
                        lloydIters: Int = 3, sampleSize: Int = 0,
                        seed: Long = 42L): Array[Array[Float]] = {
    require(k >= 1 && lloydIters >= 0)
    val n = math.max(if (sampleSize > 0) sampleSize else 50 * k, k)
    val sample = embs
      .select(col(embCol).as("__e"), xxhash64(col(idCol)).as("__h"))
      .orderBy(col("__h"), col("__e").cast("string"))
      .limit(n)
      .select("__e").collect().map(_.getSeq[Float](0).toArray)
      .filter(v => v.exists(_ != 0f))
    require(sample.nonEmpty, "no non-degenerate vectors to train on")
    val rnd = new scala.util.Random(seed)
    val centers = scala.collection.mutable.ArrayBuffer[Array[Float]]()
    centers += sample(rnd.nextInt(sample.length))
    // k-means++: next seed drawn with probability ∝ cosine distance to
    // the nearest existing seed (Arthur & Vassilvitskii, SODA'07)
    while (centers.size < math.min(k, sample.length)) {
      val w = sample.map(v => math.max(0.0, 1.0 - centers.map(c => cosArr(v, c)).max))
      val total = w.sum
      if (total <= 0) centers += sample(rnd.nextInt(sample.length))
      else {
        var r = rnd.nextDouble() * total
        var i = 0
        while (i < w.length - 1 && r > w(i)) { r -= w(i); i += 1 }
        centers += sample(i)
      }
    }
    var cents = centers.toArray
    for (_ <- 0 until lloydIters) cents = lloydStep(embs, embCol, cents)
    cents
  }

  /** Nearest-centroid cell id (argmax cosine over the k centroids).
    *
    * A native expression with the centroids as a plan REFERENCE OBJECT
    * ([[graft.functions.PqIvfOps.ivfCell]]) — generated code is O(1)
    * in k. The two earlier forms both hit janino's 64 KB method limit
    * as k grew: the round-2 k-deep `when` chain at k≈64 (projection
    * collapse made it O(k²)), then the O(k) `array_position(a,
    * array_max(a))` array-of-cosines once composed with PQ encode in
    * one projection (real IVF wants k≈√N, thousands — inlining k·d
    * literals can never hold). Semantics unchanged: ties (exactly
    * equal cosines) resolve to the lowest cell, matching `ORDER BY cos
    * DESC, cell ASC` in any replicating engine; degenerate vectors
    * (zero-norm / NULL elements → NULL cosine everywhere) land in cell
    * -1 — indexed but never probed, instead of poisoning the pipeline
    * with NULL cells. */
  def cellOf(emb: Column, centroids: Array[Array[Float]]): Column =
    graft.functions.PqIvfOps.ivfCell(emb, centroids)

  /** Persistable IVF index: input + cell column. At scale, write
    * partitioned by `cell` so probes read only nprobe partitions. */
  def buildIvfIndex(embs: DataFrame, embCol: String,
                    centroids: Array[Array[Float]]): DataFrame =
    embs.withColumn("cell", cellOf(col(embCol), centroids))

  /** IVF ANN top-k: probe the nprobe centroid cells closest to the query,
    * exact cosine inside them. The cell filter is a pushable equality IN —
    * on a cell-partitioned index it prunes partitions.
    *
    * Recall scales with how clustered the corpus is: real-world embedding
    * spaces (which cluster strongly) reach high recall at small nprobe;
    * on isotropic/random vectors neighbors scatter across cells and
    * nprobe must approach k — prefer the LSH index there. */
  def ivfTopK(index: DataFrame, embCol: String, idCol: String,
              query: Array[Float], k: Int, centroids: Array[Array[Float]],
              nprobe: Int = 2): DataFrame = {
    val cells = centroids.indices.sortBy(c => -cosArr(query, centroids(c))).take(nprobe)
    bruteForceTopK(index.filter(col("cell").isin(cells: _*)), embCol, idCol, query, k)
  }

  /** Plane count sized so the EXPECTED bucket population stays near
    * `targetBucketSize` as the corpus grows: planes ≈ log₂(N / target).
    * With planes fixed, per-bucket volume is O(N) and the in-bucket
    * self-join in [[cosineNearDupPairs]] goes quadratic — the sizing rule
    * keeps the candidate volume O(N · targetBucketSize) at any corpus
    * size. */
  def autoPlanes(corpusSize: Long, targetBucketSize: Long = 1024L, minPlanes: Int = 8): Int = {
    require(targetBucketSize > 0)
    val needed = math.ceil(math.log(math.max(1.0, corpusSize.toDouble / targetBucketSize)) /
      math.log(2.0)).toInt
    math.min(62, math.max(minPlanes, needed))
  }

  /** Per-bucket population of an LSH index — the observability hook for
    * the quadratic-bucket risk: a bucket of size m yields m·(m−1)/2
    * candidate pairs, so the diagnostic carries both. */
  def bucketStats(index: DataFrame): DataFrame =
    index.groupBy("bucket").agg(count(lit(1)).as("n"))
      .withColumn("candidate_pairs", col("n") * (col("n") - 1) / 2)

  /** Embedding-cosine near-duplicate pairs: bucket-local self-join (LSH
    * buckets, never all-pairs), then exact cosine ≥ threshold.
    *
    * `maxBucket > 0` caps each bucket at its `maxBucket` lowest-id members
    * before the self-join — a deterministic guard against a degenerate
    * bucket (e.g. a sea of identical vectors) going quadratic. Capping
    * DROPS candidates; pair the cap with [[bucketStats]] on the same index
    * to measure what was truncated rather than discovering it in a stuck
    * stage. Prefer sizing planes with [[autoPlanes]] so the cap never
    * engages on healthy data. */
  def cosineNearDupPairs(embs: DataFrame, embCol: String, idCol: String,
                         planes: Array[Array[Float]], threshold: Double,
                         maxBucket: Int = 0): DataFrame = {
    val idx0 = buildLshIndex(embs, embCol, planes)
      .select(col(idCol), col(embCol), col("bucket"))
    val idx =
      if (maxBucket <= 0) idx0
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("bucket").orderBy(col(idCol).asc)
        idx0.withColumn("__bn", row_number().over(w))
          .filter(col("__bn") <= maxBucket).drop("__bn")
      }
    val a = idx.toDF("ida", "emba", "bucket")
    val b = idx.toDF("idb", "embb", "bucket")
    a.join(b, Seq("bucket")).filter(col("ida") < col("idb"))
      .withColumn("cosine", VectorOps.vectorCosine(col("emba"), col("embb")))
      .filter(col("cosine") >= threshold)
      .select("ida", "idb", "cosine").distinct()
  }

  /** [[cosineNearDupPairs]] with planes auto-sized from the corpus count —
    * the one extra count() job buys bucket populations that stay near
    * `targetBucketSize` at any N instead of growing O(N). */
  def cosineNearDupPairsAuto(embs: DataFrame, embCol: String, idCol: String,
                             dim: Int, threshold: Double,
                             targetBucketSize: Long = 1024L,
                             seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(autoPlanes(embs.count(), targetBucketSize), dim, seed)
    cosineNearDupPairs(embs, embCol, idCol, planes, threshold)
  }

  /** Symmetric int8 quantization with a per-vector max-abs scale — 4×
    * storage compression for the vector index (100 TB of float32
    * embeddings → 25 TB of int8 + one float per row). Pure codegen'd
    * array transform, zero shuffle. Output columns: `scale` (the
    * de-quantization factor, maxabs/127, rounded to 6) and `q`
    * (array<int> in [-127, 127]).
    *
    * Determinism across engines: elements promote float→double before
    * arithmetic (the same contract as the cosine ops) and rounding is
    * `floor(x + 0.5)` — identical IEEE semantics everywhere, unlike
    * `round()` whose half-away-from-zero tie rule differs subtly
    * between engines on negative halves. A zero vector quantizes to
    * zeros with scale 0.
    */
  def quantizeInt8(emb: Column): (Column, Column) = {
    val maxAbs = array_max(transform(emb, x => abs(x.cast("double"))))
    val scale = round(maxAbs / 127.0d, 6)
    val q = when(maxAbs === 0.0d, transform(emb, _ => lit(0)))
      .otherwise(transform(emb,
        x => floor(x.cast("double") * 127.0d / maxAbs + 0.5d).cast("int")))
    (scale, q)
  }

  /** Two-phase quantized search: a coarse cosine scan over the int8-
    * quantized vectors (4× less memory traffic than float — at corpus
    * scale the scan is bandwidth-bound, so that is the wall-clock) picks
    * `candidates` ids; exact float cosine re-ranks only those to top-k.
    *
    * The coarse phase is EXACT arithmetic across engines: integer
    * products summed in doubles stay below 2^53, so candidate selection
    * is bit-deterministic (ties break on id) — unlike float-sum scores,
    * which only agree after rounding. Per-vector scales cancel out of
    * the quantized cosine, so no scale column is carried. */
  def quantizedTopK(embs: DataFrame, embCol: String, idCol: String,
                    query: Array[Float], k: Int, candidates: Int = 100): DataFrame = {
    require(k >= 1 && candidates >= k, "need candidates >= k >= 1")
    val (_, q) = quantizeInt8(col(embCol))
    val qd = transform(q, _.cast("double"))
    // quantize the query driver-side with the identical arithmetic
    val m = query.foldLeft(0.0)((a, x) => math.max(a, math.abs(x.toDouble)))
    val qq = if (m == 0.0) query.map(_ => 0.0)
             else query.map(x => math.floor(x.toDouble * 127.0 / m + 0.5))
    val qlit = array(qq.toSeq.map(lit): _*)
    // zero-norm vectors (and everything, under a zero-norm query) have no
    // cosine ranking — excluded outright rather than trailing as NULLs,
    // matching the oracle's ne > 0 AND nq > 0 contract
    val coarse = embs
      .select(col(idCol), col(embCol), VectorOps.vectorCosine(qd, qlit).as("__qcos"))
      .filter(col("__qcos").isNotNull)
      .orderBy(col("__qcos").desc, col(idCol).asc)
      .limit(candidates)
    coarse.select(col(idCol), cosineToQuery(col(embCol), query).as("cosine"))
      .filter(col("cosine").isNotNull)
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Binary (1-bit sign) quantized search — the extreme point of the
    * quantization ladder (float → int8 [[quantizedTopK]] → PQ → this):
    * each embedding collapses to ONE 64-bit word, bit i = 1 iff
    * component i is positive (the sign signature of binary passage
    * retrieval, public literature: Yamada et al. ACL'21 "BPR"), the
    * coarse phase ranks by Hamming distance to the query's word
    * (bit_count(xor) — one codegen'd instruction per comparison, 32×
    * less memory traffic than the float scan; at corpus scale the scan
    * is bandwidth-bound so that IS the wall-clock), and exact float
    * cosine re-ranks only `candidates` survivors to top-k.
    *
    * Candidate selection is bit-deterministic across engines: the sign
    * test `x > 0` is exact on any float, Hamming is integer, and ties
    * break on id — the same engine-replayability contract as the int8
    * coarse phase. Zero-norm vectors have no cosine ranking and are
    * excluded up front (the oracle's dot-product guard). */
  def binaryTopK(embs: DataFrame, embCol: String, idCol: String,
                 query: Array[Float], k: Int, candidates: Int = 100): DataFrame = {
    require(k >= 1 && candidates >= k, "need candidates >= k >= 1")
    val dim = query.length
    require(dim >= 1 && dim <= 64, "sign signature packs into one 64-bit word")
    def bitsOf(c: Column): Column =
      (0 until dim).map(i =>
        when(element_at(c, i + 1).cast("double") > 0.0d, lit(1L << i))
          .otherwise(lit(0L)))
        .reduce(_.bitwiseOR(_))
    val qbits = query.zipWithIndex.foldLeft(0L) { case (a, (x, i)) =>
      if (x > 0f) a | (1L << i) else a
    }
    val coarse = embs.select(col(idCol), col(embCol))
      .filter(array_max(transform(col(embCol), x => abs(x.cast("double")))) > 0.0d)
      .withColumn("__hd", Dedup.hamming(bitsOf(col(embCol)), lit(qbits)))
      .orderBy(col("__hd").asc, col(idCol).asc)
      .limit(candidates)
    coarse.select(col(idCol), cosineToQuery(col(embCol), query).as("cosine"))
      .filter(col("cosine").isNotNull)
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication in EMBEDDING space — documents whose vectors sit
    * within `threshold` cosine of each other are one semantic
    * duplicate group, and exactly one representative per group
    * survives. Pipeline: LSH-bucketed cosine pairs
    * ([[cosineNearDupPairsAuto]] — candidates only ever form inside a
    * hyperplane-signature bucket, never all-pairs) → transitive closure
    * via [[Clusters.connectedComponents]] (large-star/small-star) →
    * min-id survivor (the component label IS the minimum member id, so
    * survivor selection is a comparison, not another aggregate).
    *
    * SemDeDup proper clusters with k-means first and searches pairs
    * within cells; the LSH bucketing here plays the same
    * candidate-bounding role with a deterministic, oracle-replayable
    * partition (and [[trainIvfCentroids]] + cell-scoped pairing is the
    * drop-in alternative where trained cells fit the corpus better).
    *
    * Returns one row per input vector: `(idCol, cluster_id, keep)`. */
  def semanticDedup(embs: DataFrame, embCol: String, idCol: String,
                    dim: Int, threshold: Double,
                    targetBucketSize: Long = 1024L): DataFrame = {
    val pairs = cosineNearDupPairsAuto(embs, embCol, idCol, dim, threshold,
        targetBucketSize)
      .select(col("ida"), col("idb"))
    val comp = Clusters.connectedComponents(pairs)
    embs.select(col(idCol))
      .join(comp.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol).cast("long")).as("cluster_id"))
      .withColumn("keep", col(idCol) === col("cluster_id"))
  }

  /** Hard-negative mining for contrastive training: for each anchor,
    * the `k` highest-cosine vectors carrying a DIFFERENT label — the
    * near-miss examples a retrieval/embedding model learns most from.
    *
    * No join appears in the plan: the anchor set (driver-sized by
    * contract, like every query vector in this file) ships as a literal
    * struct array and expands via `explode` — a Generate over one
    * corpus scan, never a BroadcastNestedLoopJoin — followed by one
    * per-anchor window. Cost is O(anchors · corpus) dot products inside
    * whole-stage codegen, the same envelope as `bruteForceTopK` per
    * anchor, and the natural cell-pruned variant drops in via the IVF
    * index when the anchor count grows. */
  def hardNegatives(embs: DataFrame, embCol: String, idCol: String, labelCol: String,
                    anchors: Seq[(Long, Array[Float], Int)], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(anchors.nonEmpty, "anchor set must not be empty")
    val anchorArr = array(anchors.map { case (id, vec, lab) =>
      struct(lit(id).as("anchor_id"),
        VectorOps.floatVectorLit(vec).as("avec"), lit(lab).as("alabel"))
    }: _*)
    val w = Window.partitionBy("anchor_id").orderBy(col("cosine").desc, col(idCol).asc)
    embs.select(col(idCol), col(labelCol), col(embCol), explode(anchorArr).as("a"))
      .filter(col(labelCol) =!= col("a.alabel"))
      .select(col("a.anchor_id").as("anchor_id"), col(idCol),
        VectorOps.vectorCosine(col(embCol), col("a.avec")).as("cosine"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("anchor_id"), col(idCol), round(col("cosine"), 4).as("cosine"))
  }

  /** Per-label centroid drift — the embedding-space distribution monitor
    * (does source/label X point the same way the corpus does?). Two hash
    * aggregates over the dimension explode (per-label and global per-dim
    * means), a broadcast join on the 1-per-dim global rows, and one final
    * label aggregate for norms and the centroid→global cosine. No vector
    * ever collects to the driver; everything is dimension-parallel. */
  def labelCentroidDrift(embs: DataFrame, embCol: String, labelCol: String): DataFrame = {
    val dims = embs.select(col(labelCol).as("label"),
      posexplode(col(embCol)).as(Seq("dim", "v")))
    val perLabel = dims.groupBy(col("label"), col("dim"))
      .agg(avg(col("v")).as("m"), count(lit(1)).as("n"))
    val global = dims.groupBy(col("dim")).agg(avg(col("v")).as("gm"))
    perLabel.join(broadcast(global), Seq("dim"))
      .groupBy(col("label"))
      .agg(max(col("n")).as("n_vecs"),
        sum(col("m") * col("gm")).as("dot"),
        sum(col("m") * col("m")).as("nl"),
        sum(col("gm") * col("gm")).as("ng"))
      .select(col("label"), col("n_vecs"),
        round(sqrt(col("nl")), 6).as("centroid_norm"),
        round(col("dot") / (sqrt(col("nl")) * sqrt(col("ng"))), 6).as("cos_to_global"))
  }
}
