package graft.pipeline

import graft.SparkSpec
import graft.schema.{MergeGuard, TableConfig}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** CdfRollup — change-feed-driven incremental aggregate maintenance. */
class CdfRollupSpec extends SparkSpec {
  import spark.implicits._

  private def cdf(rows: (String, Double, String)*) =
    rows.toSeq.toDF("g", "v", "_change")

  test("inserts add, deletes subtract, update images move mass exactly") {
    val r1 = CdfRollup.applyCdf(None,
      cdf(("a", 10.0, "insert"), ("a", 5.0, "insert"), ("b", 2.0, "insert")),
      Seq("g"), "v")
    assert(canon(r1) == Seq(Seq("a", "15.00", "2"), Seq("b", "2.00", "1")))
    // update that moves a row from a to b; delete the other a row
    val r2 = CdfRollup.applyCdf(Some(r1), cdf(
      ("a", 10.0, "update_preimage"), ("b", 11.0, "update_postimage"),
      ("a", 5.0, "delete")), Seq("g"), "v")
    // group a reaches n=0 and disappears
    assert(canon(r2) == Seq(Seq("b", "13.00", "2")))
  }

  test("collapsed update rows fail loudly instead of corrupting the rollup") {
    val bad = cdf(("a", 1.0, "update"))
    val ex = intercept[Exception] {
      CdfRollup.applyCdf(None, bad, Seq("g"), "v").collect()
    }
    assert(ex.getMessage.contains("update") || ex.getMessage.contains("applyCdf"))
  }

  test("NULL group keys fold null-safely") {
    val r1 = CdfRollup.applyCdf(None,
      Seq((Option.empty[String], 3.0, "insert")).toDF("g", "v", "_change"),
      Seq("g"), "v")
    val r2 = CdfRollup.applyCdf(Some(r1),
      Seq((Option.empty[String], 4.0, "insert")).toDF("g", "v", "_change"),
      Seq("g"), "v")
    assert(canon(r2) == Seq(Seq("null", "7.00", "2")))
  }

  test("cdfRollupTick survives a crash between base commit and rollup commit") {
    val root = Files.createTempDirectory("cdf-tick").toString
    val store = new ManifestStore(spark, s"$root/base", "p")
    val rollup = new TableStore(spark, s"$root/rollup", filesPerVersion = 1)
    val cfg = TableConfig("t", null, Seq("k"),
      cursorField = Some("seq"), guard = MergeGuard.TargetOlder("seq"))
    def batch(rows: (Long, Long, String, Double)*) =
      rows.toSeq.toDF("k", "seq", "p", "v")
    def tick(b: org.apache.spark.sql.DataFrame): Unit =
      graft.streaming.StreamOps.cdfRollupTick(b, store, cfg, rollup, Seq("p"), "v")

    tick(batch((1L, 1L, "x", 10.0), (2L, 1L, "y", 5.0)))
    // CRASH INJECTION: this batch commits to the base table but the
    // rollup fold never runs (died before the rollup snapshot)
    store.upsert(batch((3L, 1L, "x", 7.0)), cfg)
    // next tick folds the widened version range: nothing lost
    tick(batch((1L, 2L, "x", 100.0))) // correction: replaces k=1's 10.0
    val got = rollup.read.get.drop(graft.streaming.StreamOps.FoldedVersionCol)
    assert(canon(got) == Seq(Seq("x", "107.00", "2"), Seq("y", "5.00", "1")))
    // and equals a from-scratch recompute over the final base state
    val recomputed = store.read.get.groupBy("p")
      .agg(sum(col("v").cast("decimal(18,2)")).as("sum_value"),
        count(lit(1)).as("n"))
    assertSameRows(got.orderBy("p"), recomputed.orderBy("p"))
  }

  test("replayed no-op batch folds an empty delta (idempotent under redelivery)") {
    val root = Files.createTempDirectory("cdf-replay").toString
    val store = new ManifestStore(spark, s"$root/base", "p")
    val rollup = new TableStore(spark, s"$root/rollup", filesPerVersion = 1)
    val cfg = TableConfig("t", null, Seq("k"),
      cursorField = Some("seq"), guard = MergeGuard.TargetOlder("seq"))
    val b = Seq((1L, 1L, "x", 10.0)).toDF("k", "seq", "p", "v")
    def tick(df: org.apache.spark.sql.DataFrame): Unit =
      graft.streaming.StreamOps.cdfRollupTick(df, store, cfg, rollup, Seq("p"), "v")
    tick(b); tick(b) // redelivery: guard rejects, CDF is empty
    val got = rollup.read.get.drop(graft.streaming.StreamOps.FoldedVersionCol)
    assert(canon(got) == Seq(Seq("x", "10.00", "1")))
  }
}
