package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(String, String)], iters: Int): Map[String, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("two-node cycle: symmetric graph keeps symmetric ranks, mass conserved up to truncation") {
    val r = ranks(Seq("a" -> "b", "b" -> "a"), 3)
    assert(r("a") == r("b"))
    // total mass can only shrink (integer truncation dust), never grow
    assert(r.values.sum <= Graph.Scale)
    assert(r.values.sum > Graph.Scale * 9 / 10)
  }

  test("hand-computed one iteration on a 3-node chain with a dangling sink") {
    // a -> b -> c ; c dangling. N=3, r0 = S/3, base = (S/3)*15/100.
    val s = Graph.Scale
    val r0 = s / 3
    val base = r0 * 15L / 100L
    val contrib = (r0 * 85L / 100L) / 1L // deg 1 for a and b
    val r = ranks(Seq("a" -> "b", "b" -> "c"), 1)
    assert(r("a") == base) // no in-edges
    assert(r("b") == base + contrib)
    assert(r("c") == base + contrib)
  }

  test("iteration 2 propagates through the chain; dangling mass leaks") {
    val s = Graph.Scale
    val r0 = s / 3
    val base = r0 * 15L / 100L
    val c1 = (r0 * 85L / 100L) / 1L
    val r1a = base; val r1b = base + c1
    val r = ranks(Seq("a" -> "b", "b" -> "c"), 2)
    assert(r("a") == base)
    assert(r("b") == base + (r1a * 85L / 100L) / 1L)
    assert(r("c") == base + (r1b * 85L / 100L) / 1L)
    // c forwarded nothing anywhere: total < iteration-1 total
    assert(r.values.sum < base * 3 + c1 * 2)
  }

  test("out-degree splits mass integrally; self-loops and parallel edges dropped") {
    val s = Graph.Scale
    val r0 = s / 3
    val base = r0 * 15L / 100L
    val half = (r0 * 85L / 100L) / 2L
    // hub fans out to two sinks; duplicates + self-loop must not change degree
    val edges = Seq("h" -> "x", "h" -> "y", "h" -> "x", "h" -> "h")
    val r = ranks(edges, 1)
    assert(r("x") == base + half && r("y") == base + half)
    assert(r("h") == base)
  }

  test("result is partitioning-invariant (bit-identical integer sums)") {
    val edges = (0 until 40).map(i => (s"n${i % 7}", s"n${(i * 3 + 1) % 7}"))
    val df = edges.toDF("src", "dst")
    val a = ranks(edges, 3)
    val b = Graph.pageRank(df.repartition(13, col("dst")), 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("zero iterations returns the uniform start vector; empty edges yield empty result") {
    val r = ranks(Seq("a" -> "b"), 0)
    assert(r == Map("a" -> Graph.Scale / 2, "b" -> Graph.Scale / 2))
    assert(Graph.pageRank(Seq.empty[(String, String)].toDF("src", "dst"), 3).count() == 0)
  }
}
