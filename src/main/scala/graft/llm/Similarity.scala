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
  * a query probes only its own bucket (plus optional 1-bit-flip neighbor
  * buckets), cutting the scan by ~2^H while keeping recall high for
  * near-neighbors.
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

  /** ANN top-k: probe the query's bucket plus all 1-bit-flip neighbor
    * buckets (multiprobe), then exact cosine inside the candidate set.
    * Approximate by design — recall rises with `numPlanes` low and probes
    * high; the candidate filter is a pushed-down IN on the bucket column. */
  def annTopK(index: DataFrame, embCol: String, idCol: String,
              query: Array[Float], k: Int, planes: Array[Array[Float]],
              multiprobe: Boolean = true): DataFrame = {
    val b = bucketOf(query, planes)
    val probes = if (multiprobe) b +: planes.indices.map(h => b ^ (1L << h)) else Seq(b)
    bruteForceTopK(index.filter(col("bucket").isin(probes: _*)), embCol, idCol, query, k)
  }

  /** Embedding-cosine near-duplicate pairs: bucket-local self-join (LSH
    * buckets, never all-pairs), then exact cosine ≥ threshold. */
  def cosineNearDupPairs(embs: DataFrame, embCol: String, idCol: String,
                         planes: Array[Array[Float]], threshold: Double): DataFrame = {
    val idx = buildLshIndex(embs, embCol, planes)
      .select(col(idCol), col(embCol), col("bucket"))
    val a = idx.toDF("ida", "emba", "bucket")
    val b = idx.toDF("idb", "embb", "bucket")
    a.join(b, Seq("bucket")).filter(col("ida") < col("idb"))
      .withColumn("cosine", VectorOps.vectorCosine(col("emba"), col("embb")))
      .filter(col("cosine") >= threshold)
      .select("ida", "idb", "cosine").distinct()
  }
}
