package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val Ps = Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)

  test("exact mode: quantiles are the floor(p*(n-1)) order statistics, any partitioning") {
    val rnd = new scala.util.Random(11)
    val vals = Seq.fill(5000)(rnd.nextDouble() * 1000 - 500)
    val sortedV = vals.sorted
    val expect = Ps.map(p => sortedV(math.floor(p * (vals.length - 1)).toInt))
    for (parts <- Seq(1, 7)) {
      val got = vals.toDF("v").repartition(parts)
        .agg(SketchOps.quantileSketch(col("v"), Ps, cap = 8192).as("q"))
        .head().getSeq[Double](0)
      assert(got == expect, s"parts=$parts")
    }
  }

  test("nulls are skipped; grouped aggregation stays per-group exact") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)), ("a", Some(2.0)),
      ("b", Some(10.0)), ("b", Some(20.0))).toDF("g", "v")
    val got = df.groupBy("g")
      .agg(SketchOps.quantileSketch(col("v"), Seq(0.5), cap = 16).as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).head).toMap
    assert(got == Map("a" -> 2.0, "b" -> 10.0))
  }

  test("beyond capacity: rank error stays within the KLL envelope") {
    val n = 100000
    val cap = 256
    val rnd = new scala.util.Random(3)
    val perm = rnd.shuffle((0 until n).toVector)
    // merge path too: 16 sketches over disjoint slices, merged pairwise
    val sketches = perm.grouped(n / 16 + 1).map { slice =>
      val s = new QuantileSketch(cap)
      slice.foreach(v => s.insert(v.toDouble))
      s
    }.toSeq
    val merged = sketches.reduce(_ merge _)
    assert(merged.totalWeight == n.toLong)
    for (p <- Seq(0.1, 0.25, 0.5, 0.75, 0.9)) {
      val est = merged.quantiles(Seq(p)).head
      val target = math.floor(p * (n - 1))
      // values ARE their ranks; deterministic-KLL error ~ levels*n/(2*cap)
      assert(math.abs(est - target) <= 0.05 * n,
        s"p=$p est=$est target=$target")
    }
  }

  test("serialization round-trips the level structure") {
    val s = new QuantileSketch(32)
    (1 to 1000).foreach(i => s.insert(i.toDouble))
    val back = QuantileSketch.deserialize(s.serialize())
    assert(back.totalWeight == s.totalWeight)
    assert(back.quantiles(Ps).toSeq == s.quantiles(Ps).toSeq)
  }
}
