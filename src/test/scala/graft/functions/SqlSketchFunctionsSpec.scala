package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The sketch aggregates through their PLAIN-SQL registration
  * (GraftExtensions): same results as the Column API, proper analysis
  * errors for bad literal arguments. */
class SqlSketchFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("hll_distinct from SQL equals the Column API") {
    (1 to 3000).map(i => ("g" + (i % 2), s"k${i % 1700}")).toDF("g", "k")
      .createOrReplaceTempView("hll_in")
    val sql = spark.sql(
      "SELECT g, hll_distinct(k, 8) AS est FROM hll_in GROUP BY g ORDER BY g")
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    val api = spark.table("hll_in").groupBy("g")
      .agg(HllOps.hllDistinct(col("k"), 8).as("est")).orderBy("g")
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(sql.toSeq == api.toSeq)
  }

  test("freq_topk from SQL equals the Column API") {
    (1 to 500).map(i => s"w${i % 7}").toDF("w").createOrReplaceTempView("freq_in")
    val sql = spark.sql("SELECT freq_topk(w, 3) AS hh FROM freq_in").collect()
    val api = spark.table("freq_in").agg(FreqOps.freqTopK(col("w"), 3)).collect()
    assert(sql.head.getSeq[Any](0) == api.head.getSeq[Any](0))
  }

  test("quantile_sketch from SQL: exact order statistic inside capacity") {
    (1 to 101).map(_.toDouble).toDF("x").createOrReplaceTempView("q_in")
    val p50 = spark.sql("SELECT quantile_sketch(x, 0.5) AS q FROM q_in")
      .head().getSeq[Double](0)
    assert(p50 == Seq(51.0)) // rank floor(0.5·100) = 50 → value 51
  }

  test("hll_sketch/hll_union/hll_estimate compose in SQL like the Column API") {
    (1 to 2000).map(i => ("g" + (i % 3), s"k${i % 900}")).toDF("g", "k")
      .createOrReplaceTempView("hsk_in")
    // store per-group registers, then union them and read the estimate —
    // the maintained-rollup shape, end to end in SQL
    val sql = spark.sql(
      """SELECT hll_estimate(hll_union(sk)) FROM
        |  (SELECT g, hll_sketch(k, 8) AS sk FROM hsk_in GROUP BY g)""".stripMargin)
      .head().getDouble(0)
    val direct = spark.sql("SELECT hll_distinct(k, 8) FROM hsk_in").head().getDouble(0)
    assert(sql == direct) // union-of-partials equals the one-shot sketch
  }

  test("non-literal or wrong-typed sketch parameters are analysis errors") {
    Seq(("a", 1)).toDF("s", "n").createOrReplaceTempView("bad_in")
    val e1 = intercept[Exception] {
      spark.sql("SELECT hll_distinct(s, n) FROM bad_in GROUP BY s").collect()
    }
    assert(e1.getMessage.contains("foldable"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT freq_topk(s, CAST(3 AS BIGINT)) FROM bad_in").collect()
    }
    assert(e2.getMessage.contains("INT"))
  }
}
