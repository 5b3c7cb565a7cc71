package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("greedy first-fit within key, order respected, bins reset per key") {
    val docs = Seq(
      // key a: 60+50 fit in 100? 60 then 60+50=110>100 → doc2 opens bin 1;
      // 50+30=80<=100 stays; 80+40=120>100 → bin 2
      ("a", 1L, 60L), ("a", 2L, 50L), ("a", 3L, 30L), ("a", 4L, 40L),
      // key b restarts at bin 0
      ("b", 1L, 100L), ("b", 2L, 1L)
    ).toDF("k", "o", "t")
    val out = Packing.packGreedy(docs, "k", "o", "t", capacity = 100)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(out(("a", 1L)) == 0L)
    assert(out(("a", 2L)) == 1L)
    assert(out(("a", 3L)) == 1L)
    assert(out(("a", 4L)) == 2L)
    assert(out(("b", 1L)) == 0L)  // exactly-full bin
    assert(out(("b", 2L)) == 1L)  // 100+1 overflows → new bin
  }

  test("oversize doc gets its own bin; packing never drops rows") {
    val docs = Seq(("a", 1L, 10L), ("a", 2L, 999L), ("a", 3L, 10L)).toDF("k", "o", "t")
    val out = Packing.packGreedy(docs, "k", "o", "t", capacity = 100)
      .orderBy("ord").select("bin_id").as[Long].collect()
    assert(out.toSeq == Seq(0L, 1L, 2L)) // the giant overflows bin 1 alone
  }

  test("deterministic across physical layouts") {
    val docs = (1L to 200L).map(i => (s"k${i % 3}", i, (i * 7) % 90 + 1)).toDF("k", "o", "t")
    val a = canon(Packing.packGreedy(docs.repartition(7), "k", "o", "t", 128))
    val b = canon(Packing.packGreedy(docs.coalesce(1), "k", "o", "t", 128))
    assert(a == b)
    // invariant: no multi-doc bin exceeds capacity
    val overfull = Packing.packGreedy(docs, "k", "o", "t", 128)
      .groupBy("pack_key", "bin_id")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("c"))
      .filter(col("fill") > 128 && col("c") > 1)
    assert(overfull.isEmpty)
  }
}
