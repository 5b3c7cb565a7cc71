package graft.llm

import graft.SparkSpec

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private def run(train: Seq[(Long, String, String)], test: Seq[(Long, String, String)])
      : Map[Long, (String, Long)] =
    Classify.naiveBayes(
        train.toDF("id", "text", "label"), test.toDF("id", "text", "label"),
        "id", "text", "label")
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3)))).toMap

  test("hand-computed micro-nat costs on a two-class, two-token corpus") {
    // train: {a: "x"}, {b: "y"} → V=2, tot_a=tot_b=1
    // prior = -ln(1/2) → 693147 micro-nats for both classes
    // P(x|a) = (1+1)/(1+2) = 2/3 → cost 405465 ; unseen cost = ln(3) → 1098612
    val train = Seq((1L, "x", "a"), (2L, "y", "b"))
    val r = run(train, Seq((10L, "x", "a")))
    assert(r(10L) == (("a", 693147L + 405465L)))
    val r2 = run(train, Seq((11L, "y", "b")))
    assert(r2(11L) == (("b", 693147L + 405465L)))
  }

  test("unseen-everywhere token falls back to per-class smoothing mass; tie breaks on label") {
    val train = Seq((1L, "x", "a"), (2L, "y", "b"))
    // "z" unseen for both: cost = prior + ln(tot+V) — identical → tie → "a"
    val r = run(train, Seq((10L, "z", "b")))
    assert(r(10L) == (("a", 693147L + 1098612L)))
  }

  test("token-less doc is classified by prior alone (majority class)") {
    val train = Seq((1L, "x", "a"), (2L, "x", "a"), (3L, "x", "a"), (4L, "y", "b"))
    val r = run(train, Seq((10L, "", "b"), (11L, "   ", "a")))
    // prior_a = -ln(3/4) = 287682 ; prior_b = -ln(1/4) = 1386294
    assert(r(10L) == (("a", 287682L)))
    assert(r(11L) == (("a", 287682L)))
  }

  test("term frequency weighs evidence: repeated minority token flips the argmin") {
    // class a dominates the prior, but the test doc repeats b's signature token
    val train = Seq((1L, "x q", "a"), (2L, "x q", "a"), (3L, "x q", "a"), (4L, "y q", "b"))
    assert(run(train, Seq((10L, "x", "a")))(10L)._1 == "a")
    assert(run(train, Seq((11L, "y y y y", "b")))(11L)._1 == "b")
  }

  test("separable corpus classifies held-out docs perfectly and is partitioning-invariant") {
    val train = (0 until 20).map { i =>
      if (i % 2 == 0) (i.toLong, "alpha alpha beta", "even")
      else (i.toLong, "gamma gamma delta", "odd")
    }
    val test = Seq((100L, "alpha beta beta", "even"), (101L, "delta gamma", "odd"))
    val r = run(train, test)
    assert(r(100L)._1 == "even" && r(101L)._1 == "odd")
    val repart = Classify.naiveBayes(
      train.toDF("id", "text", "label").repartition(7),
      test.toDF("id", "text", "label").repartition(3), "id", "text", "label")
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3)))).toMap
    assert(r == repart)
  }

  test("tokenization is case-folded and whitespace-robust, mirroring the corpus tokenizer") {
    val train = Seq((1L, "Alpha ALPHA", "a"), (2L, "beta", "b"))
    val r = run(train, Seq((10L, "  aLpHa  ", "b")))
    assert(r(10L)._1 == "a")
  }
}
