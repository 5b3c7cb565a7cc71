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

  test("splitByHash: deterministic, proportional, incremental-safe, engine-neutral") {
    import spark.implicits._
    val docs = (0L until 2000L).map(i => (i, s"doc $i")).toDF("id", "body")
    val split = Sampling.splitByHash(docs, Seq("id"),
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // proportions within a loose tolerance of the md5-uniform expectation
    assert(math.abs(counts("train") - 1600L) < 120, counts.toString)
    assert(math.abs(counts("val") - 200L) < 70, counts.toString)
    assert(counts.values.sum == 2000L)
    // partition-layout independence
    val again = Sampling.splitByHash(docs.repartition(7), Seq("id"),
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    assert(canon(split) == canon(again))
    // incremental safety: adding rows never reassigns existing ones
    val subset = Sampling.splitByHash(docs.filter(col("id") < 500), Seq("id"),
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    assert(canon(subset) == canon(split.filter(col("id") < 500)))
    // engine-neutral arithmetic: replicate one assignment by hand
    val b = java.security.MessageDigest.getInstance("MD5")
      .digest("split||7".getBytes("UTF-8"))
      .take(2).map(x => f"$x%02x").mkString
    val bucket = java.lang.Long.parseLong(b, 16)
    val expected = if (bucket < 52428) "train" else if (bucket < 58982) "val" else "test"
    assert(split.filter(col("id") === 7).select("split").head().getString(0) == expected)
  }

  test("capPerGroup keeps exactly the top-n per group by the given order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", 50L), (2L, "s1", 90L), (3L, "s1", 70L), (4L, "s1", 90L),
      (5L, "s2", 10L)
    ).toDF("id", "src", "len")
    val kept = Sampling.capPerGroup(docs, Seq("src"),
        Seq(col("len").desc, col("id").asc), n = 2)
      .select("id").as[Long].collect().sorted.toSeq
    // s1: len 90 (ids 2,4 — tie broken by id) beat 70/50; s2 keeps its one
    assert(kept == Seq(2L, 4L, 5L))
    // layout independence via the total order
    val again = Sampling.capPerGroup(docs.repartition(7), Seq("src"),
        Seq(col("len").desc, col("id").asc), n = 2)
      .select("id").as[Long].collect().sorted.toSeq
    assert(again == kept)
  }

  test("weightedSample: clamp edges, monotonicity, replay stability") {
    import spark.implicits._
    val docs = (0L until 1000L).map(i => (i, (i % 11).toDouble / 10.0)).toDF("id", "w")
    // weight 0 keeps nothing, weight >= 1 keeps everything (clamped)
    assert(Sampling.weightedSample(docs, Seq("id"), lit(0.0)).count() == 0L)
    assert(Sampling.weightedSample(docs, Seq("id"), lit(1.0)).count() == 1000L)
    assert(Sampling.weightedSample(docs, Seq("id"), lit(7.5)).count() == 1000L)
    assert(Sampling.weightedSample(docs, Seq("id"), lit(-3.0)).count() == 0L)
    // a row kept at weight w stays kept at every w' > w (same u per row)
    val at3 = Sampling.weightedSample(docs, Seq("id"), lit(0.3)).select("id")
    val at7 = Sampling.weightedSample(docs, Seq("id"), lit(0.7)).select("id")
    assert(at3.except(at7).count() == 0L)
    assert(at3.count() < at7.count())
    // per-row weight column + layout independence
    val sel = Sampling.weightedSample(docs, Seq("id"), col("w"))
    val again = Sampling.weightedSample(docs.repartition(7), Seq("id"), col("w"))
    assert(canon(sel) == canon(again))
  }

  test("splitByCluster: near-duplicates co-assign; singletons match splitByHash") {
    // 3 planted near-dup families (members differ by one trailing word —
    // shingle Jaccard ≥ 0.8) + unrelated singletons with disjoint vocab
    val family = (fid: Int) => (0 to 2).map { m =>
      (fid * 10L + m, (1 to 20).map(i => s"f${fid}w$i").mkString(" ") + s" tail$m")
    }
    val singles = (100 to 140).map(i => (i.toLong, (1 to 12).map(j => s"s${i}x$j").mkString(" ")))
    val docs = ((1 to 3).flatMap(family) ++ singles).toDF("doc_id", "text")
    val out = Sampling.splitByCluster(docs, "doc_id", "text",
      Seq(("train", 0.5), ("val", 0.25), ("test", 0.25)))
    // every doc assigned exactly once
    assert(out.count() == docs.count())
    // each family's members share one cluster AND one split
    val fam = out.filter(col("doc_id") < 100)
      .groupBy(floor(col("doc_id") / 10).as("f"))
      .agg(countDistinct("cluster_id").as("nc"), countDistinct("split").as("ns"))
      .as[(Long, Long, Long)].collect()
    assert(fam.length == 3 && fam.forall { case (_, nc, ns) => nc == 1 && ns == 1 })
    // a singleton's assignment equals splitByHash of its own id (cluster
    // label = own id), so the leakage-safe split degrades to the plain
    // one on duplicate-free data
    val singleOut = out.filter(col("doc_id") >= 100)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val plain = Sampling.splitByHash(docs.filter(col("doc_id") >= 100), Seq("doc_id"),
        Seq(("train", 0.5), ("val", 0.25), ("test", 0.25)))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(singleOut == plain)
    // precomputed cluster map short-circuits the clustering pass
    val pre = Clusters.duplicateClusters(docs, "doc_id", "text", 0.8)
    val out2 = Sampling.splitByCluster(docs, "doc_id", "text",
      Seq(("train", 0.5), ("val", 0.25), ("test", 0.25)), precomputed = Some(pre))
    assert(canon(out) == canon(out2))
  }

  test("temperatureMix: alpha flattens the mix; capped at 1; replay-stable") {
    import spark.implicits._
    // skewed corpus: source a dominates 10:1
    val df = ((1 to 1000).map(i => (i.toLong, "a")) ++ (1 to 100).map(i => (i + 5000L, "b")))
      .toDF("id", "src")
    def kept(alpha: Double, target: Long): Map[String, Long] =
      Sampling.temperatureMix(df, "src", Seq("id"), alpha, target)
        .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // alpha=1: proportional — both sources keep ~the same fraction
    val p = kept(1.0, 550)
    assert(math.abs(p("a") / 1000.0 - p("b") / 100.0) < 0.15, p.toString)
    // alpha=0: equal share per source — b's rate caps at 1 (all kept),
    // a contributes ~the same absolute count
    val f = kept(0.0, 200)
    assert(f("b") == 100, s"up-weighted source must cap at ALL its rows: $f")
    assert(math.abs(f("a") - 100.0) < 40, f.toString)
    // flattening is monotone in alpha: a's share of the kept mix shrinks
    // as alpha drops
    val shareA1 = p("a").toDouble / (p("a") + p("b"))
    val shareA0 = f("a").toDouble / (f("a") + f("b"))
    assert(shareA0 < shareA1, s"alpha=0 share $shareA0 !< alpha=1 share $shareA1")
    // replay-stable and a subset of the input
    assert(kept(0.5, 300) == kept(0.5, 300))
  }

  test("temperatureMix: NULL sources are a real group, not silently dropped; empty input survives") {
    import spark.implicits._
    val df = ((1 to 200).map(i => (i.toLong, Option("a"))) ++
      (1 to 200).map(i => (i + 5000L, Option.empty[String]))).toDF("id", "src")
    val out = Sampling.temperatureMix(df, "src", Seq("id"), alpha = 1.0, targetRows = 200)
    val byNull = out.groupBy(col("src").isNull.as("isnull")).count()
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    // both groups keep ~half; a NULL-key equi-join would have kept 0
    assert(byNull.getOrElse(true, 0L) > 50, s"NULL source dropped: $byNull")
    assert(byNull.getOrElse(false, 0L) > 50, byNull.toString)
    // empty corpus: empty out, no NPE from the scalar aggregate
    assert(Sampling.temperatureMix(df.limit(0), "src", Seq("id"), 0.5, 10).isEmpty)
  }

  test("temperatureMix: a source literally named __null__ stays distinct from the NULL group") {
    import spark.implicits._
    // 300 rows of the literal string vs 100 NULL rows: under a coalesce
    // sentinel they'd merge into one 400-row group sharing one rate
    // (alpha=0, target=200 → rate 0.5, NULL group keeps ~50); with the
    // null-safe join each keeps its own rate and the NULL group's rate
    // caps at 1 — ALL 100 NULL rows survive
    val df = ((1 to 300).map(i => (i.toLong, Option("__null__"))) ++
      (1 to 100).map(i => (i + 5000L, Option.empty[String]))).toDF("id", "src")
    val out = Sampling.temperatureMix(df, "src", Seq("id"), alpha = 0.0, targetRows = 200)
    val byGroup = out.groupBy(col("src").isNull.as("isnull")).count()
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(byGroup.getOrElse(true, 0L) == 100,
      s"NULL group must get its own capped rate, not share one with '__null__': $byGroup")
    assert(byGroup.getOrElse(false, 0L) < 150, byGroup.toString)
  }

  test("md5Bucket encodes NULL keys explicitly — no silent identity collisions") {
    import spark.implicits._
    // concat_ws DROPS nulls: without the sentinel these two distinct
    // identities would hash to the same input ('seed||a')
    val df = Seq((Option("a"), Option.empty[String]), (Option.empty[String], Option("a")))
      .toDF("k1", "k2")
    val buckets = df.select(
      Sampling.md5Bucket(Seq(col("k1"), col("k2")), "seed").as("b")).as[Long].collect()
    assert(buckets(0) != buckets(1), "NULL-position identities collided")
  }

  test("tokenBudgetPerGroup: budget respected, prefix is monotone in the budget, stable") {
    val docs = (1L to 100L).map(i => (i, s"src${i % 3}",
      Array.fill((i % 13).toInt + 1)("w").mkString(" "))).toDF("doc_id", "source", "text")
    val toks = TextAnalysis.tokenCount(col("text"))
    def ids(budget: Long) = Sampling.tokenBudgetPerGroup(docs, Seq("source"), toks,
      Seq("doc_id"), budget).select("doc_id").as[Long].collect().toSet
    val small = ids(40)
    val big = ids(120)
    assert(small.nonEmpty && small.subsetOf(big), "larger budget must keep a superset")
    // per-group spend stays within budget
    val spent = Sampling.tokenBudgetPerGroup(docs, Seq("source"), toks, Seq("doc_id"), 40)
      .groupBy("source").agg(sum(toks).as("t")).select("t").as[Long].collect()
    assert(spent.forall(_ <= 40))
    // partition-independent
    val b = Sampling.tokenBudgetPerGroup(docs.repartition(7), Seq("source"), toks,
      Seq("doc_id"), 40).select("doc_id").as[Long].collect().toSet
    assert(b == small)
  }

  test("importanceResample: target-like docs dominate when the score gap beats the Gumbel band") {
    // Gumbel noise from the 16-bit md5 uniform lives in ~[-2.5, 11.8];
    // 30-token docs at ±~2 nats/token put ~±60 between the families
    val aaa = Array.fill(30)("alpha").mkString(" ")
    val zzz = Array.fill(30)("omega").mkString(" ")
    val raw = ((0L until 20L).map(i => (i, aaa)) ++ (20L until 40L).map(i => (i, zzz)))
      .toDF("doc_id", "text")
    val target = Seq((100L, aaa)).toDF("doc_id", "text")
    val out = Sampling.importanceResample(raw, target, "doc_id", "text", k = 20)
      .collect().map(r => (r.getLong(0), r.getInt(3)))
    assert(out.length == 20)
    assert(out.map(_._2).sorted.toSeq == (1 to 20), "ranks must be 1..k")
    assert(out.map(_._1).forall(_ < 20L), "every selected doc is from the target-like family")
  }

  test("importanceResample: deterministic and partition-independent") {
    val docs = (0L until 50L).map(i => (i, s"tok${i % 7} tok${i % 3} tok${i % 11} filler common words"))
      .toDF("doc_id", "text")
    val tgt = docs.filter(col("doc_id") % 2 === 0)
    val a = canon(Sampling.importanceResample(docs, tgt, "doc_id", "text", k = 10))
    val b = canon(Sampling.importanceResample(docs.repartition(7), tgt.repartition(3),
      "doc_id", "text", k = 10))
    assert(a == b)
  }

  test("epochOrder: a valid replayable order; epochs reshuffle; layout-independent") {
    val docs = (0L until 200L).toDF("doc_id")
    def run(epoch: Int, parts: Int) =
      Sampling.epochOrder(docs.repartition(parts), "doc_id", epoch, shards = 4)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    val e1 = run(1, 1)
    // every doc placed exactly once; shards in range; positions are
    // 1..n_shard contiguous per shard
    assert(e1.size == 200)
    assert(e1.values.forall { case (s, _) => s >= 0 && s < 4 })
    (0 until 4).foreach { s =>
      val ps = e1.values.filter(_._1 == s).map(_._2).toSeq.sorted
      assert(ps == (1L to ps.size))
    }
    // same epoch replays identically regardless of layout
    assert(run(1, 7) == e1)
    // a different epoch is a genuinely different order
    val e2 = run(2, 1)
    assert(e1 != e2)
    assert(e1.count { case (id, sp) => e2(id) == sp } < 40) // <20% fixed points
  }
}
