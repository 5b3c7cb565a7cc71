package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-located joins: two tables bucketed+sorted on the join key join
  * without any hash-partitioning exchange. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-bucketed join plans shuffle-free; results correct") {
    val fact = (1L to 1000L).map(k => (k, s"f$k")).toDF("k", "fv")
    val dim = (1L to 1000L by 2).map(k => (k, s"d$k")).toDF("k", "dv")
    Bucketing.writeBucketed(fact, "b_fact", "k", buckets = 4)
    Bucketing.writeBucketed(dim, "b_dim", "k", buckets = 4)
    // disable broadcast so the co-location (not a broadcast) removes the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.read(spark, "b_fact")
        .join(Bucketing.read(spark, "b_dim"), Seq("k"))
      assert(Bucketing.joinIsShuffleFree(joined), joined.queryExecution.executedPlan.toString)
      assert(joined.count() == 500)
      // contrast: the same join over unbucketed frames DOES shuffle
      val plain = fact.join(dim, Seq("k"))
      assert(!Bucketing.joinIsShuffleFree(plain))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
