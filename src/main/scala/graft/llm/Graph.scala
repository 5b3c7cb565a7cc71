package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph algorithms for web-corpus curation.
  *
  * A crawled corpus carries an implicit hyperlink graph (page → linked
  * host, apex → apex), and graph centrality is a standard document-
  * quality prior for training-data selection (the original
  * PageRank — Page et al. 1999 — was built for exactly this ranking
  * problem; modern pipelines use centrality to weight or filter crawl
  * sources). These operators take an explicit edge DataFrame so the
  * caller decides the node granularity (host, apex via
  * [[Links.apexDomainPsl]], source bucket, …).
  *
  * Everything is expressed as joins + aggregations over the edge list —
  * the classic "graph algorithms as iterated sparse mat-vec" shape that
  * scales on Spark (same family as the large-star/small-star connected
  * components in [[Clusters]]): each iteration shuffles O(edges)
  * contribution rows into an O(nodes) aggregate, with map-side partial
  * aggregation collapsing parallel in-edges before the exchange. No
  * driver-side state beyond two scalar aggregates (node count).
  *
  * INTEGER-QUANTIZED arithmetic: ranks live in micro-units of a total
  * mass of 10^12 and every per-edge contribution is an integral
  * division (`div`), so iteration results are BIT-IDENTICAL regardless
  * of summation order, partitioning, or engine — the same
  * order-independence contract as [[Terms.unigramNegLogProb]]'s
  * micro-nat costs. A float PageRank would drift by reduction order
  * and could never hash-match a second engine.
  */
object Graph {

  /** Total rank mass in micro-units. 10^12 keeps three digits of
    * headroom under Long even after the ×85 damping numerator
    * (8.5×10^13 ≪ 2^63) while giving ~10^9 resolution steps per node
    * on a 1000-node graph. */
  val Scale: Long = 1000000000000L

  /** Out-degree per source node of the deduplicated edge list. */
  def outDegrees(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst")).where(col("src") =!= col("dst"))
      .distinct()
      .groupBy("src").agg(count(lit(1)).as("deg"))

  /** Damped PageRank over `edges` (columns `src`, `dst`; self-loops
    * dropped, parallel edges deduplicated), fixed `iterations` power
    * steps, damping factor 0.85 expressed as the integer pair 85/100.
    *
    * Returns `(node, rank_micro)` — rank in micro-units of [[Scale]]
    * total mass. Per step:
    * {{{ rank'(v) = base + Σ_{u→v} ((rank(u) * 85) div 100) div deg(u) }}}
    * with `base = ((Scale div N) * 15) div 100`. Dangling nodes (no
    * out-edges) keep receiving in-mass but forward none — their damped
    * mass leaks, as in the original Brin/Page formulation (the
    * alternative, uniform dangling redistribution, costs one extra
    * scalar aggregate per step; the leak variant is the deterministic
    * baseline and the ranks stay comparable because every node leaks
    * the same truncation dust anyway).
    *
    * Scale shape: the edge list is the big side — it is deduplicated,
    * degree-joined ONCE up front and `localCheckpoint`ed, so each of
    * the `iterations` steps re-reads the materialized O(edges)
    * partitions instead of replaying the scan+distinct lineage (the
    * standard Spark iterative-algorithm idiom; without the cut the plan
    * doubles per step). The rank vector is O(nodes) and re-shuffles
    * each step — at web scale both sides hash-partition on the join
    * key and AQE picks shuffle-hash; at dimension scale the rank side
    * broadcasts for free.
    */
  def pageRank(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    // cut the lineage on the deduped edges FIRST — they feed both the
    // degree aggregate and the degree join (different shuffle keys, so
    // no ReusedExchange without the cut)
    val e = edges.select(col("src"), col("dst")).where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(false)
    val outE = e.join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .select(col("src"), col("dst"), col("deg"))
      .localCheckpoint(false)
    val nodes = outE.select(col("src").as("node"))
      .union(outE.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(false)
    // bounded driver scalar (node count), same contract as the k-means
    // centroid collect in Similarity
    val n = nodes.count()
    if (n == 0) return nodes.select(col("node"), lit(0L).as("rank_micro"))
    val r0 = Scale / n
    val base = (Scale / n) * 15L / 100L
    var rank = nodes.select(col("node"), lit(r0).as("rank"))
    for (_ <- 1 to iterations) {
      val mass = outE
        .join(rank.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr("((rank * 85) div 100) div deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("mass"))
      rank = nodes.join(mass, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("mass"), lit(0L))).as("rank"))
        .localCheckpoint(false)
    }
    rank.select(col("node"), col("rank").as("rank_micro"))
  }
}
