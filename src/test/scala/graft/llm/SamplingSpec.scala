package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (1 to 1000).map(i => (i.toLong, s"row$i", i % 5)).toDF("id", "v", "grp")

  test("deterministicSample: same rows every run, partition-independent, ~fraction") {
    val a = Sampling.deterministicSample(df, 0.2).select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.deterministicSample(df.repartition(7), 0.2)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b)
    assert(a.size > 120 && a.size < 280) // ~200 ± sampling noise
    // different seed → different sample
    val c = Sampling.deterministicSample(df, 0.2, seed = 7L).select("id").as[Long].collect().sorted.toSeq
    assert(a != c)
  }

  test("stratifiedFixedSample: exactly n per stratum (or all when smaller), stable") {
    val s1 = Sampling.stratifiedFixedSample(df, Seq("grp"), 10)
    val counts = s1.groupBy("grp").count().as[(Int, Long)].collect().toMap
    assert(counts.values.forall(_ == 10) && counts.size == 5)
    val s2 = Sampling.stratifiedFixedSample(df.repartition(3), Seq("grp"), 10)
    assert(canon(s1) == canon(s2))
    // n larger than a stratum keeps the whole stratum
    val tiny = Sampling.stratifiedFixedSample(df.filter(col("id") <= 3), Seq("grp"), 10)
    assert(tiny.count() == 3)
  }
}
