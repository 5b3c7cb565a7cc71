package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Clusters.connectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain collapses to one component rooted at the min id") {
    // a path 5-4-3-2-1 — the shape label-propagation needs diameter
    // rounds for and pairwise dedup mislabels
    val comp = cc(Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)))
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("multiple components, duplicate/reversed/self edges tolerated") {
    val comp = cc(Seq(
      (10L, 20L), (20L, 10L), (20L, 30L),   // component {10,20,30}
      (7L, 7L),                             // self-loop: singleton vertex
      (100L, 101L)))                        // component {100,101}
    assert(comp == Map(
      10L -> 10L, 20L -> 10L, 30L -> 10L,
      7L -> 7L,
      100L -> 100L, 101L -> 100L))
  }

  test("two dense clusters plus long chain converge within iteration bound") {
    val clique = for (i <- 0L to 9L; j <- (i + 1) to 9L) yield (i, j)
    val chain = (1000L until 1063L).map(i => (i, i + 1))
    val comp = cc(clique ++ chain)
    assert((0L to 9L).forall(comp(_) == 0L))
    assert((1000L to 1063L).forall(comp(_) == 1000L))
  }

  test("empty edge set yields empty assignment") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Clusters.connectedComponents(empty).count() == 0L)
  }

  test("duplicateClusters: transitive chains cluster; singletons keep own id") {
    // A~B and B~C near-dups (shared shingles) but A and C themselves
    // differ more — transitive closure must still pool all three
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "alpha beta gamma delta epsilon zeta kappa iota"),
      (9L, "completely different words about other topics entirely here")
    ).toDF("doc_id", "text")
    // 32 bands of 2 rows: S-curve knee ≈ (1/32)^(1/2) ≈ 0.18 — candidate
    // recall at J=0.5 is near-certain (16×4 banding would miss ~36%)
    val out = Clusters.duplicateClusters(docs, "doc_id", "text", threshold = 0.5, bands = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byId = out.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byId(1L) == ((1L, 3L)) && byId(2L) == ((1L, 3L)) && byId(3L) == ((1L, 3L)))
    assert(byId(9L) == ((9L, 1L)))
  }

  test("dedupByCluster keeps exactly the min id per cluster") {
    val docs = Seq(
      (5L, "one two three four five six seven eight"),
      (4L, "one two three four five six seven nine"),
      (8L, "unrelated text that stands alone in the corpus today")
    ).toDF("doc_id", "text")
    val kept = Clusters.dedupByCluster(docs, "doc_id", "text", threshold = 0.5, bands = 32)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(4L, 8L))
  }

  test("dedupByClusterRanked keeps the quality-ranked member, id breaks ties") {
    val docs = Seq(
      (5L, "one two three four five six seven eight", 90),
      (4L, "one two three four five six seven nine", 10),  // min id but LOW quality
      (8L, "unrelated text that stands alone in the corpus today", 50)
    ).toDF("doc_id", "text", "q")
    val kept = Clusters.dedupByClusterRanked(docs, "doc_id", "text",
        order = Seq(col("q").desc), threshold = 0.5, bands = 32)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(5L, 8L)) // 5 beats 4 on quality, unlike min-id
    // equal quality → min id survives (deterministic tie-break)
    val tied = Clusters.dedupByClusterRanked(
        docs.withColumn("q", lit(1)), "doc_id", "text",
        order = Seq(col("q").desc), threshold = 0.5, bands = 32)
      .select("doc_id").as[Long].collect().sorted
    assert(tied.toSeq == Seq(4L, 8L))
  }

  test("distributed star-contraction path matches the small-graph union-find") {
    // smallGraphEdges = 0 forces the iterative path on shapes that cover
    // chains, cliques, self-loops, and duplicates — both paths must
    // produce the identical min-id labeling
    val shapes = Seq(
      Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)),
      Seq((10L, 20L), (20L, 10L), (20L, 30L), (7L, 7L), (100L, 101L)),
      (for (i <- 0L to 9L; j <- (i + 1) to 9L) yield (i, j)) ++
        (1000L until 1063L).map(i => (i, i + 1)))
    for (edges <- shapes) {
      val dist = Clusters.connectedComponents(
          edges.toDF("src", "dst"), smallGraphEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dist == cc(edges), s"paths diverge on $edges")
    }
  }

  test("deterministic across physical layouts") {
    val edges = (1L to 200L).map(i => (i, i % 37))
    val a = cc(edges)
    val b = Clusters.connectedComponents(
        edges.toDF("src", "dst").repartition(13).sortWithinPartitions(rand(42)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}
