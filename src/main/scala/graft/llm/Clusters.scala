package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Duplicate-cluster assignment: connected components over the near-dup
  * pair graph, then one survivor per component.
  *
  * Why this exists: [[Dedup.nearDedup]] drops any doc that is a verified
  * near-dup of a LOWER-ID doc — pairwise semantics. Real corpus dedup
  * wants TRANSITIVE semantics: if A~B and B~C, then {A,B,C} is one
  * cluster and exactly one survives, even when A~C itself scores below
  * the threshold (duplicate chains). That closure is a connected-
  * components problem over the pair graph.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the
  * standard shared-nothing CC. Each round is two shuffles keyed on node
  * id; the edge set contracts toward stars rooted at each component's
  * minimum id and converges in O(log²) rounds (in practice 2–4 for
  * dup graphs, whose components are small and dense). No driver-side
  * adjacency, no vertex program framework — plain DataFrame ops, so
  * AQE/partition sizing apply as everywhere else.
  *
  * Scale notes:
  *   - Label-propagation CC (join labels to neighbors each round) needs
  *     O(diameter) rounds — a pathological duplicate CHAIN (shingled
  *     boilerplate often forms these) makes that linear. Star contraction
  *     is logarithmic regardless of shape; that is why it is the one
  *     implemented here.
  *   - Each iteration is cut with a `localCheckpoint` — persist alone
  *     is not enough: it caches data but keeps the logical plan, and
  *     each round references the previous frame several times, so the
  *     plan TREE doubles per round (measured: suite death inside
  *     `generateTreeString` before round 10). Checkpointing truncates
  *     the plan to a leaf. The checkpoint is lazy and the convergence
  *     fingerprint is its materializing action — one job per round.
  *     A long-lived cluster job would configure
  *     `sparkContext.setCheckpointDir` and use reliable `checkpoint`
  *     for executor-loss tolerance; the algorithm is identical.
  *   - Convergence is detected by (count, xor-of-hashes) fingerprint
  *     equality of the edge set — one cheap aggregate per round instead
  *     of an `except` anti-shuffle. A false positive needs a 64-bit
  *     xor-collision between successive edge sets of equal size; the
  *     `maxIter` backstop bounds the damage to a conservative extra
  *     round, never an infinite loop.
  */
object Clusters {

  /** Connected components of an undirected graph given as (src, dst)
    * pairs (any integral type; self-loops and duplicate/reversed edges
    * are fine). Returns one row per distinct vertex appearing in the
    * edge set: (id, component) where component = min vertex id of the
    * component — deterministic, replay-stable.
    *
    * Graphs at or under `smallGraphEdges` input pairs take a driver-side
    * union-find instead of the iterative star contraction: the same
    * small-side economics as a broadcast join (a duplicate-pair graph is
    * normally tiny relative to its corpus — verified near-dup pairs at
    * ≥0.8 Jaccard), and each distributed round costs several shuffles,
    * so a 4-round contraction on a few thousand edges pays seconds of
    * pure scheduling latency for milliseconds of work. Above the bound —
    * boilerplate-heavy corpora where the pair graph itself is huge — the
    * logarithmic star contraction runs unchanged. Both paths produce the
    * identical (id, min-id component) labeling.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25,
                          smallGraphEdges: Long = 1L << 20,
                          onStage: (String, Double) => Unit = (_, _) => ()): DataFrame = {
    require(maxIter > 0, "maxIter must be positive")
    def timed[T](stage: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      onStage(stage, (System.nanoTime() - t0) / 1e9)
      r
    }
    // checkpoint the projected input ONCE: `edges` may be an expensive
    // pipeline (LSH + Jaccard verification), and both the vertex set and
    // the working edge set derive from it — without this cut the whole
    // upstream plan would execute a second time for the final join
    val base = edges
      .select(col(edges.columns(0)).cast("long").as("a"), col(edges.columns(1)).cast("long").as("b"))
      .localCheckpoint(false)

    // the count() below is the materializing action for the WHOLE
    // upstream edge pipeline — "edge_pipeline" is candidate generation +
    // verification, "components" is pure CC labeling
    val edgeCount = timed("edge_pipeline")(base.count())
    if (edgeCount <= smallGraphEdges)
      return timed("components")(smallGraphComponents(base))

    val verts = base.select(col("a").as("id"))
      .union(base.select(col("b").as("id")))
      .distinct()

    // canonical working set: (u, v) with u > v, no self-loops, distinct.
    // Checkpoints are LAZY: the fingerprint aggregate right after is the
    // materializing action, so each round costs one job, not two.
    var cur = base
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint(false)

    def fingerprint(df: DataFrame): (Long, Long) = {
      // bit_xor, not sum: xor never overflows (sum of 64-bit hashes would
      // raise under ANSI mode, the Spark 4 default)
      val r = df.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    var fp = fingerprint(cur)
    var iter = 0
    var converged = false
    val tLoop = System.nanoTime()
    while (!converged && iter < maxIter) {
      // large-star: every neighbor v > u links to m(u) = min(N(u) ∪ {u}).
      // The symmetric view makes N(u) complete; only strictly-greater
      // neighbors re-point, so edges never point "up" past the local min.
      val sym = cur.select(col("u"), col("v"))
        .union(cur.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
      val large = sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()

      // small-star: per node u over its smaller neighbors N⁻(u), link
      // every neighbor AND u itself to m = min(N⁻(u)) — star contraction.
      val minsS = large.groupBy("u").agg(min(col("v")).as("m"))
      val next = large.join(minsS, "u")
        .select(col("v").as("x"), col("m"))
        .union(minsS.select(col("u").as("x"), col("m")))
        .filter(col("x") =!= col("m"))
        .select(greatest(col("x"), col("m")).as("u"), least(col("x"), col("m")).as("v"))
        .distinct()
        .localCheckpoint(false) // truncates the plan; fingerprint materializes

      val nfp = fingerprint(next)
      converged = nfp == fp
      fp = nfp
      cur = next
      iter += 1
    }
    onStage("components", (System.nanoTime() - tLoop) / 1e9)

    // after convergence `cur` is a star forest: u → component root v.
    // Roots and isolated vertices (self-pair inputs) label themselves.
    verts.join(cur.select(col("u").as("id"), col("v").as("component")), Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** Driver union-find over a collected edge list (already bounded by
    * `smallGraphEdges` at the call site). Union by size keeps trees
    * shallow; the component label is the min vertex id per root,
    * assigned in a second pass so labeling matches the distributed path
    * exactly. */
  private def smallGraphComponents(base: DataFrame): DataFrame = {
    import scala.collection.mutable
    val spark = base.sparkSession
    import spark.implicits._
    val pairs = base.select(col("a"), col("b")).as[(Long, Long)].collect()
    val parent = mutable.LongMap.empty[Long]
    val size = mutable.LongMap.empty[Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) x = parent.getOrElse(x, x)
      // path compression: re-walk and point everything at the root
      var y = x0
      while (parent.getOrElse(y, y) != y) { val n = parent(y); parent(y) = x; y = n }
      x
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        val (sa, sb) = (size.getOrElse(ra, 1L), size.getOrElse(rb, 1L))
        if (sa >= sb) { parent(rb) = ra; size(ra) = sa + sb }
        else { parent(ra) = rb; size(rb) = sa + sb }
      }
    }
    val minOfRoot = mutable.LongMap.empty[Long]
    val ids = parent.keys.toArray
    ids.foreach { id =>
      val r = find(id)
      if (id < minOfRoot.getOrElse(r, Long.MaxValue)) minOfRoot(r) = id
    }
    ids.map(id => (id, minOfRoot(find(id)))).toSeq
      .toDF("id", "component")
  }

  /** Full transitive near-dedup: MinHash-LSH candidate pairs, exact
    * Jaccard verification at `threshold`, connected components over the
    * verified pair graph, then cluster assignment for EVERY doc
    * (singletons form their own cluster). Output: (idCol, cluster_id,
    * cluster_size) — the lineage artifact a curation pipeline stores so
    * survivor choice stays replayable and auditable.
    */
  def duplicateClusters(docs: DataFrame, idCol: String, textCol: String,
                        threshold: Double = 0.8, numHashes: Int = 64, bands: Int = 16,
                        shingleSize: Int = 3,
                        onStage: (String, Double) => Unit = (_, _) => ()): DataFrame = {
    val cand = Dedup.candidatePairs(
      Dedup.minhashBands(docs, idCol, textCol, numHashes, bands, shingleSize), idCol)
    val edges = Dedup.jaccardVerify(cand, docs, idCol, textCol, shingleSize,
        prefilterDocs = false)
      .filter(col("jaccard") >= threshold)
      .select(col("ida"), col("idb"))
    // `onStage` splits the wall clock: "edge_pipeline" = LSH candidates +
    // Jaccard verify (materialized by CC's checkpoint-count),
    // "components" = the CC labeling itself
    val comp = connectedComponents(edges, onStage = onStage)
    val assigned = docs.select(col(idCol))
      .join(comp.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol).cast("long")).as("cluster_id"))
    val sizes = assigned.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    assigned.join(sizes, "cluster_id").select(col(idCol), col("cluster_id"), col("cluster_size"))
  }

  /** Keep exactly one doc per duplicate cluster (the minimum id — same
    * deterministic survivor rule as [[Dedup.exact]]). Transitive-closure
    * version of [[Dedup.nearDedup]]. */
  def dedupByCluster(docs: DataFrame, idCol: String, textCol: String,
                     threshold: Double = 0.8, numHashes: Int = 64, bands: Int = 16,
                     shingleSize: Int = 3): DataFrame = {
    val clusters = duplicateClusters(docs, idCol, textCol, threshold, numHashes, bands, shingleSize)
    val survivors = clusters.groupBy("cluster_id").agg(min(col(idCol)).as(idCol))
      .select(idCol)
    docs.join(survivors, Seq(idCol), "left_semi")
  }

  /** [[dedupByCluster]] with a QUALITY survivor rule: each cluster keeps
    * the member ranked first by `order` (e.g. longest text, highest
    * quality score) instead of the minimum id — curation pipelines keep
    * a cluster's best member, not its earliest-crawled one. The id is
    * appended as the final tie-break, so the survivor set is
    * deterministic under any partition layout even when `order` ties.
    * Cost over min-id: one window rank inside the cluster shuffle the
    * labeling already pays — no extra corpus pass. */
  def dedupByClusterRanked(docs: DataFrame, idCol: String, textCol: String,
                           order: Seq[Column],
                           threshold: Double = 0.8, numHashes: Int = 64,
                           bands: Int = 16, shingleSize: Int = 3): DataFrame = {
    require(order.nonEmpty, "dedupByClusterRanked needs a quality order")
    val clusters = duplicateClusters(docs, idCol, textCol, threshold, numHashes, bands, shingleSize)
    val w = Window.partitionBy("cluster_id").orderBy(order :+ col(idCol).asc: _*)
    val survivors = docs.join(clusters.select(col(idCol), col("cluster_id")), Seq(idCol))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(idCol)
    docs.join(survivors, Seq(idCol), "left_semi")
  }
}
