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

  test("lazy-offset decrement is observably identical to eager Misra-Gries") {
    // eager reference: the textbook O(cap)-sweep formulation the lazy
    // sketch replaced — every (live set, count) must match it exactly,
    // including key deaths and revives beyond capacity
    final class Eager(cap: Int) {
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      def insert(v: String): Unit = counts.get(v) match {
        case Some(c) => counts.update(v, c + 1)
        case None =>
          if (counts.size < cap) counts.update(v, 1L)
          else {
            counts.mapValuesInPlace((_, c) => c - 1)
            counts.filterInPlace((_, c) => c > 0)
          }
      }
    }
    val rnd = new scala.util.Random(11)
    for (cap <- Seq(1, 4, 16)) {
      val lazySk = new FreqSketch(cap)
      val eager = new Eager(cap)
      // skewed stream: few hot keys + a long distinct tail forces
      // constant decrements, deaths, and revives of previously-dead keys
      (1 to 5000).foreach { i =>
        val v = if (rnd.nextInt(3) == 0) s"hot${rnd.nextInt(cap)}"
                else s"tail${rnd.nextInt(40)}"
        lazySk.insert(v); eager.insert(v)
        if (i % 997 == 0)
          assert(lazySk.liveCounts.toMap == eager.counts.toMap, s"cap=$cap step=$i")
      }
      assert(lazySk.liveCounts.toMap == eager.counts.toMap, s"cap=$cap final")
    }
  }

  test("serialize handles keys whose UTF-8 encoding exceeds 64 KiB") {
    val s = new FreqSketch(4)
    val big = "世界" * 40000 // 240 KB of UTF-8 — writeUTF would throw
    s.insert(big); s.insert(big); s.insert("small")
    val back = FreqSketch.deserialize(s.serialize())
    assert(back.topK(2) == Seq((big, 2L), ("small", 1L)))
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
