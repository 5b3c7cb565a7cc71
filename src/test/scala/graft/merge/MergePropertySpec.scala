package graft.merge

import graft.SparkSpec
import graft.schema.{MergeGuard, TableConfig}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks for the merge algebra — randomized batches must
  * satisfy the invariants the backdate DAGs assume (SURVEY.md §2.8/§7.4):
  * replay convergence, key uniqueness, and target preservation. Drawn
  * with explicit ScalaCheck seeds so every run tests identical cases. */
class MergePropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowGen = for {
    k <- Gen.choose(0, 8)
    ts <- Gen.choose(0L, 20L)
    v <- Gen.alphaStr.map(_.take(4))
  } yield (s"k$k", ts, v)

  private val batchGen = Gen.listOfN(25, rowGen)

  private val guards = Seq[MergeGuard](MergeGuard.None,
    MergeGuard.TargetOlder("ts"), MergeGuard.SourceNotOlder("ts"))

  private def draw(seed: Long): List[(String, Long, String)] =
    batchGen.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("gen failed"))

  test("property: replay idempotence, key uniqueness, target preservation") {
    for (i <- 1 to 8) {
      val cfg = TableConfig("p.t", null, Seq("k"),
        cursorField = Some("ts"), guard = guards(i % 3))
      val target = MergeEngine.latestPerKey(draw(i).toDF("k", "ts", "v"), Seq("k"),
        Seq(org.apache.spark.sql.functions.col("ts").desc))
      val source = draw(i + 100L).toDF("k", "ts", "v")

      val once = MergeEngine.upsert(target, source, cfg)
      val twice = MergeEngine.upsert(once, source, cfg)
      // 1. replay convergence
      assert(canon(twice) == canon(once), s"case $i guard=${guards(i % 3)} not idempotent")
      // 2. merged keys stay unique
      val rows = once.collect()
      assert(rows.map(_.getString(0)).distinct.length == rows.length,
        s"case $i produced duplicate keys")
      // 3. every pre-existing target key survives (merge never deletes)
      val targetKeys = target.select("k").collect().map(_.getString(0)).toSet
      val onceKeys = rows.map(_.getString(0)).toSet
      assert(targetKeys.subsetOf(onceKeys), s"case $i dropped target keys")
    }
  }
}
