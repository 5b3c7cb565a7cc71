package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // heavy-hitter shape: one key carries most rows
  private lazy val big = (1L to 400L).map { i =>
    (i, if (i % 10 == 0) 99L else i % 7, s"v$i")
  }.toDF("row_id", "k", "payload")
  private lazy val dim = Seq((99L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"))
    .toDF("k", "label")

  test("saltedJoin inner equals the plain join") {
    val salted = Skew.saltedJoin(big, dim, Seq("k"), buckets = 8)
    val plain = big.join(dim, Seq("k"))
    assertSameRows(
      salted.select("k", "row_id", "payload", "label"),
      plain.select("k", "row_id", "payload", "label"))
  }

  test("saltedJoin left keeps unmatched big rows exactly once") {
    val salted = Skew.saltedJoin(big, dim, Seq("k"), buckets = 8, joinType = "left")
    val plain = big.join(dim, Seq("k"), "left")
    assertSameRows(
      salted.select("k", "row_id", "payload", "label"),
      plain.select("k", "row_id", "payload", "label"))
    // unmatched keys appear once per big row, not once per salt bucket
    assert(salted.count() == 400L)
  }

  test("saltedJoin rejects outer joins the replication scheme cannot express") {
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, dim, Seq("k"), joinType = "full_outer")
    }
  }

  test("salted aggregate equals direct groupBy") {
    val direct = big.groupBy("k").agg(count(lit(1)).as("n"), max(col("row_id")).as("mx"))
    val salted = Skew.aggregate(big, Seq("k"),
      Seq(Skew.saltedCount("n"), Skew.saltedMax(col("row_id"), "mx")))
    assertSameRows(salted.select("k", "n", "mx"), direct.select("k", "n", "mx"))
  }
}
