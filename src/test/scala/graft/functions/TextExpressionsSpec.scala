package graft.functions

import graft.SparkSpec
import graft.llm.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** [[WordShingles]] must be bit-identical to the composable higher-order
  * form it replaced — every shingle-based operator's oracle equivalence
  * rests on that. */
class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def both(texts: Seq[String], n: Int) = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val native = df.select(col("id"), TextOps.wordShingles(col("text"), n).as("sh"))
    val reference = df.select(col("id"), Dedup.shinglesComposable(col("text"), n).as("sh"))
    (native, reference)
  }

  test("matches the composable form on crafted edges") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b", "a", "", "   ", "a  b\t c\nd", // repeated/mixed whitespace
      "x y z x y z x y z",                  // duplicate shingles
      "MiXeD Case TOKENS here",             // lowercasing
      "tab\tend\t",                         // trailing non-space whitespace
      " leading and trailing  ",
      null,                                  // NULL text → [""]
      "ünïcode wörds ÄÖÜ straße çédille more words")
    for (n <- Seq(1, 2, 3, 5)) {
      val (nat, ref) = both(texts, n)
      assertSameRows(nat, ref)
    }
  }

  test("matches the composable form on random strings (property)") {
    val wordGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val sepGen = Gen.nonEmptyListOf(Gen.oneOf(' ', ' ', '\t', '\n')).map(_.mkString)
    val textGen = for {
      words <- Gen.listOfN(12, wordGen)
      seps <- Gen.listOfN(12, sepGen)
      lead <- Gen.oneOf("", " ", "\t")
    } yield lead + words.zip(seps).map { case (w, s) => w + s }.mkString
    for (seed <- 1L to 8L) {
      val texts = Gen.listOfN(30, textGen)
        .apply(Gen.Parameters.default, Seed(seed)).get
      val n = 1 + (seed % 4).toInt
      val (nat, ref) = both(texts, n)
      assertSameRows(nat, ref)
    }
  }

  test("stays inside whole-stage codegen over a file-backed scan") {
    val dir = java.nio.file.Files.createTempDirectory("shingle-wscg").toString
    Seq(("a b c d e", 1L)).toDF("text", "id").write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir)
      .select(TextOps.wordShingles(col("text"), 3).as("sh"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"expected WSCG span, got:\n$plan")
  }
}
