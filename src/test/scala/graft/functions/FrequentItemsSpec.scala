package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  test("exact mode: equals the GROUP BY top-k under any partitioning") {
    val rnd = new scala.util.Random(5)
    val tokens = Seq.tabulate(4000)(i => s"w${rnd.nextInt(120)}") :+ "w7"
    val expect = tokens.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      .toSeq.sortBy { case (k, c) => (-c, k) }.take(10)
    for (parts <- Seq(1, 8)) {
      val got = tokens.toDF("t").repartition(parts)
        .agg(FreqOps.freqTopK(col("t"), 10, cap = 1024).as("hh"))
        .select(explode(col("hh")).as("h"))
        .select(col("h.item"), col("h.est_count"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == expect, s"parts=$parts")
    }
  }

  test("beyond capacity: undercount bounded by n/cap, true heavies survive the merge") {
    val cap = 64
    // 20k background singletons-ish + two genuinely heavy keys
    val rnd = new scala.util.Random(9)
    val stream = Seq.fill(20000)(s"bg${rnd.nextInt(5000)}") ++
      Seq.fill(3000)("HEAVY_A") ++ Seq.fill(2000)("HEAVY_B")
    val n = stream.length
    // 16-way partial + merge, like a shuffle would
    val merged = rnd.shuffle(stream).grouped(n / 16 + 1).map { slice =>
      val s = new FreqSketch(cap)
      slice.foreach(s.insert)
      s
    }.reduce(_ merge _)
    val top = merged.topK(5).toMap
    assert(top.contains("HEAVY_A") && top.contains("HEAVY_B"),
      s"heavy keys above n/cap=${n / cap} must survive: $top")
    assert(top("HEAVY_A") <= 3000 && top("HEAVY_A") >= 3000 - n / cap)
    assert(top("HEAVY_B") <= 2000 && top("HEAVY_B") >= 2000 - n / cap)
  }

  test("serialization round-trips; nulls are skipped in the aggregate") {
    val s = new FreqSketch(8)
    Seq("a", "b", "a", "c", "a").foreach(s.insert)
    val back = FreqSketch.deserialize(s.serialize())
    assert(back.topK(3) == s.topK(3))
    val got = Seq(Some("x"), None, Some("x"), Some("y")).toDF("t")
      .agg(FreqOps.freqTopK(col("t"), 2, cap = 8).as("hh"))
      .select(explode(col("hh")).as("h")).select(col("h.item"), col("h.est_count"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("x", 2L), ("y", 1L)))
  }
}
