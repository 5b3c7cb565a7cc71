package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Trained quality classifier: deterministic training, sane learning on
  * a separable corpus, and composition with the curation funnel. */
class QualityLrSpec extends SparkSpec {
  import spark.implicits._

  // a separable toy corpus: "good" docs share function words, "bad"
  // docs are salt strings — hashed-unigram features separate them
  private def corpus = (0L until 40L).map { i =>
    if (i % 2 == 0)
      (i, s"the quick brown fox jumps over the lazy dog number $i", 1)
    else
      (i, s"zzq$i xkcd${i * 7} qqz${i % 5} vvv${i * 3}", 0)
  }.toDF("doc_id", "text", "label")

  test("training separates a separable corpus; scoring thresholds at 0.5 micro") {
    val model = QualityLr.train(corpus, "doc_id", "text", "label")
    val scored = QualityLr.score(corpus, "doc_id", "text", model)
      .join(corpus.select("doc_id", "label"), Seq("doc_id"))
    val agree = scored.filter((col("hq") && col("label") === 1) ||
      (!col("hq") && col("label") === 0)).count()
    assert(agree >= 36, s"classifier agrees on only $agree/40 of a separable corpus")
    // margins are integer micro-units; hq is exactly the > 500000 cut
    val bad = scored.filter(col("hq") =!= (col("margin_micro") > 500000L)).count()
    assert(bad == 0)
  }

  test("training is deterministic: two runs produce identical weights and scores") {
    val m1 = QualityLr.train(corpus, "doc_id", "text", "label")
    val m2 = QualityLr.train(corpus.repartition(7), "doc_id", "text", "label")
    assert(m1.weights.toSeq == m2.weights.toSeq && m1.bias == m2.bias,
      "weights must not depend on partitioning")
    val s1 = canon(QualityLr.score(corpus, "doc_id", "text", m1))
    val s2 = canon(QualityLr.score(corpus.repartition(3), "doc_id", "text", m2))
    assert(s1 == s2)
  }

  test("empty/NULL text scores like a single-empty-token doc, never crashes") {
    val docs = Seq((1L, "the quick fox", 1), (2L, null.asInstanceOf[String], 0),
      (3L, "", 0), (4L, "   ", 0)).toDF("doc_id", "text", "label")
    val model = QualityLr.train(docs, "doc_id", "text", "label")
    val out = QualityLr.score(docs, "doc_id", "text", model).collect()
    assert(out.length == 4 && out.forall(!_.isNullAt(1)))
    // "" and "   " trim to the same single empty token → identical margins
    val byId = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(2L) == byId(3L) && byId(3L) == byId(4L))
  }

  test("scoring's weight-table join is BROADCAST — never a corpus shuffle") {
    // the weight table is buckets-sized (KBs); at 100 TB the corpus
    // side must stream past it, not shuffle on the bucket id
    val model = QualityLr.train(corpus, "doc_id", "text", "label")
    val plan = QualityLr.score(corpus, "doc_id", "text", model)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("streaming gate drains the exact batch-scored set, any file split") {
    val tmp = java.nio.file.Files.createTempDirectory("qlrstream").toString
    val model = QualityLr.train(corpus, "doc_id", "text", "label")
    // feed in 4 deliberately unbalanced chunks
    Seq(0L -> 7L, 7L -> 9L, 9L -> 30L, 30L -> 40L).foreach { case (a, b) =>
      corpus.filter(col("doc_id") >= a && col("doc_id") < b)
        .select("doc_id", "text").repartition(1)
        .write.mode("append").parquet(s"$tmp/feed")
    }
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/feed").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/feed")
    graft.streaming.StreamOps.qualityGateDrain(stream, model,
      "doc_id", "text", s"$tmp/admitted", s"$tmp/ckpt")
    val drained = spark.read.parquet(s"$tmp/admitted")
      .select("doc_id", "margin_micro")
    val batch = QualityLr.score(corpus, "doc_id", "text", model)
      .filter(col("hq")).select("doc_id", "margin_micro")
    assertSameRows(drained.orderBy("doc_id"), batch.orderBy("doc_id"))
    assert(drained.count() > 0)
  }

  test("held-out evaluation: high precision/recall on a separable split, counts exact") {
    // hash-free deterministic split: train on ids < 30, audit on 30..39
    val train = corpus.filter(col("doc_id") < 30)
    val test_ = corpus.filter(col("doc_id") >= 30)
    val row = QualityLr.evaluate(train, test_, "doc_id", "text", "label").head()
    val (tp, fp, fn, tn) = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(tp + fp + fn + tn == 10, "every held-out doc lands in exactly one cell")
    // separable corpus: the good/bad classes split cleanly out of sample
    assert(tp == 5 && tn == 5 && fp == 0 && fn == 0,
      s"expected a clean held-out split, got tp=$tp fp=$fp fn=$fn tn=$tn")
    assert(row.getDouble(4) == 1.0 && row.getDouble(5) == 1.0)
  }

  test("evaluate yields NULL precision when nothing is admitted, never divides by zero") {
    // an impossibly high threshold admits nothing: tp = fp = 0
    val train = corpus.filter(col("doc_id") < 30)
    val test_ = corpus.filter(col("doc_id") >= 30)
    val row = QualityLr.evaluate(train, test_, "doc_id", "text", "label",
      threshold = 100.0).head()
    assert(row.getLong(0) == 0 && row.getLong(1) == 0)
    assert(row.isNullAt(4), "precision of an empty admitted set is NULL")
    assert(row.getDouble(5) == 0.0, "recall is 0 when positives exist but none admitted")
  }

  test("trainWithFloor returns the model above the floor and refuses below it") {
    val train = corpus.filter(col("doc_id") < 30)
    val held = corpus.filter(col("doc_id") >= 30)
    // separable corpus clears a high floor
    val m = QualityLr.trainWithFloor(train, held,
      "doc_id", "text", "label", minPrecision = 0.9, minRecall = 0.9)
    assert(m.weights.length == QualityLr.DefaultBuckets)
    // structurally unlearnable: IDENTICAL text across both classes, so
    // every doc scores the same margin — either all admitted
    // (precision 0.5) or none (recall 0), never both floors
    val noise = corpus.withColumn("text", lit("the same text every time"))
      .withColumn("label", pmod(col("doc_id"), lit(2)).cast("int"))
    val e = intercept[IllegalArgumentException] {
      QualityLr.trainWithFloor(noise, noise,
        "doc_id", "text", "label", minPrecision = 0.99, minRecall = 0.99)
    }
    assert(e.getMessage.contains("held-out floor"))
  }

  test("model store round-trips bit-exactly and versions monotonically") {
    val tmp = java.nio.file.Files.createTempDirectory("qlrstore").toString
    val store = new QualityLr.ModelStore(spark, tmp)
    assert(store.latest.isEmpty)
    val m1 = QualityLr.train(corpus, "doc_id", "text", "label")
    assert(store.publish(m1) == 1)
    val (v, got) = store.latest.get
    assert(v == 1)
    // bit-exact round trip: replayed scoring must use byte-equal weights
    assert(got.weights.toSeq == m1.weights.toSeq && got.bias == m1.bias)
    val m2 = QualityLr.train(corpus, "doc_id", "text", "label", buckets = 32)
    assert(store.publish(m2) == 2)
    assert(store.latest.get._1 == 2 && store.read(1).weights.length == 64)
  }

  test("versioned drain hot-swaps the model at the published boundary") {
    val tmp = java.nio.file.Files.createTempDirectory("qlrswap").toString
    // file A = first half, file B = second half
    corpus.filter(col("doc_id") < 20).select("doc_id", "text")
      .repartition(1).write.mode("append").parquet(s"$tmp/feed")
    corpus.filter(col("doc_id") >= 20).select("doc_id", "text")
      .repartition(1).write.mode("append").parquet(s"$tmp/feed")
    val m1 = QualityLr.train(corpus, "doc_id", "text", "label")
    // v2: trained on INVERTED labels — admits the complement class
    val inverted = corpus.withColumn("label", lit(1) - col("label"))
    val m2 = QualityLr.train(inverted, "doc_id", "text", "label")
    val store = new QualityLr.ModelStore(spark, s"$tmp/models")
    store.publish(m1)
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/feed").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/feed")
    graft.streaming.StreamOps.qualityGateDrainVersioned(stream, store,
      "doc_id", "text", s"$tmp/admitted", s"$tmp/ckpt",
      afterBatch = id => if (id == 0) store.publish(m2))
    val drained = spark.read.parquet(s"$tmp/admitted")
    // batch 0 scored under v1, batch 1 under the mid-stream v2 — each
    // equal to the frozen-model batch scoring of its own slice
    def want(m: QualityLr.Model, pred: org.apache.spark.sql.Column) =
      QualityLr.score(corpus.filter(pred), "doc_id", "text", m)
        .filter(col("hq")).select("doc_id", "margin_micro")
    assertSameRows(
      drained.filter(col("model_v") === 1).select("doc_id", "margin_micro"),
      want(m1, col("doc_id") < 20))
    assertSameRows(
      drained.filter(col("model_v") === 2).select("doc_id", "margin_micro"),
      want(m2, col("doc_id") >= 20))
    // the swap is visible: v2 admits the OTHER class
    assert(drained.filter(col("model_v") === 1).count() > 0)
    assert(drained.filter(col("model_v") === 2 && col("doc_id") % 2 === 1).count() > 0,
      "the inverted model must admit salt docs after the swap")
  }

  test("versioned drain refuses to score without a published model") {
    val tmp = java.nio.file.Files.createTempDirectory("qlrnomodel").toString
    corpus.limit(4).select("doc_id", "text").write.parquet(s"$tmp/feed")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/feed").schema).parquet(s"$tmp/feed")
    val store = new QualityLr.ModelStore(spark, s"$tmp/models")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      graft.streaming.StreamOps.qualityGateDrainVersioned(stream, store,
        "doc_id", "text", s"$tmp/admitted", s"$tmp/ckpt")
    }
    assert(e.getMessage.contains("no published model") ||
      Option(e.getCause).exists(_.getMessage.contains("no published model")))
  }

  test("continueTraining warm start ≡ the longer cold training it resumes") {
    // 3 cold rounds + 2 continued rounds on the SAME corpus must equal
    // 5 cold rounds bit-for-bit — the continuation is literally the
    // next gradient rounds, not an approximation of them
    val cold5 = QualityLr.train(corpus, "doc_id", "text", "label", rounds = 5)
    val cold3 = QualityLr.train(corpus, "doc_id", "text", "label", rounds = 3)
    val warm = QualityLr.continueTraining(cold3, corpus, "doc_id", "text", "label",
      rounds = 2)
    assert(warm.weights.toSeq == cold5.weights.toSeq && warm.bias == cold5.bias)
  }

  test("continueTraining learns the grown corpus's fresh buckets; loop composes with the model store") {
    // the production refresh loop: cold model on the seed corpus →
    // publish v1 → a new labeled slice arrives (new token space) →
    // continue → publish v2; the continued model must score the NEW
    // class better than the stale one does
    val grown = corpus.unionByName((100L until 120L).map(i =>
      (i, s"wq$i mmx${i * 3} kkz${i % 7} ppq${i * 5}", 0)).toDF("doc_id", "text", "label"))
    val v1 = QualityLr.train(corpus, "doc_id", "text", "label")
    val tmp = java.nio.file.Files.createTempDirectory("qlrloop").toString
    val store = new QualityLr.ModelStore(spark, tmp)
    store.publish(v1)
    val v2 = QualityLr.continueTraining(v1, grown, "doc_id", "text", "label",
      rounds = 2)
    store.publish(v2)
    val (ver, latest) = store.latest.get
    assert(ver == 2 && latest.weights.toSeq == v2.weights.toSeq)
    // the new salt class pulls its buckets DOWN from the warm zeros:
    // v2 scores the new docs strictly lower than v1 did on average
    def meanMargin(m: QualityLr.Model) =
      QualityLr.score(grown.filter(col("doc_id") >= 100), "doc_id", "text", m)
        .agg(avg(col("margin_micro"))).head().getDouble(0)
    assert(meanMargin(v2) < meanMargin(v1),
      "continued rounds must have learned from the new labeled slice")
  }

  test("exactly-once admitted sink: a forced full re-drain leaves identical output; append mode duplicates") {
    val tmp = java.nio.file.Files.createTempDirectory("qlreo").toString
    corpus.filter(col("doc_id") < 20).select("doc_id", "text")
      .repartition(1).write.mode("append").parquet(s"$tmp/feed")
    corpus.filter(col("doc_id") >= 20).select("doc_id", "text")
      .repartition(1).write.mode("append").parquet(s"$tmp/feed")
    val model = QualityLr.train(corpus, "doc_id", "text", "label")
    def drain(out: String, ckpt: String, exactlyOnce: Boolean): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(s"$tmp/feed").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$tmp/feed")
      graft.streaming.StreamOps.qualityGateDrain(stream, model,
        "doc_id", "text", out, ckpt, exactlyOnceSink = exactlyOnce)
    }
    // first drain, then a FORCED full replay (fresh checkpoint, same
    // sink) — every batch re-delivers with the same batch ids
    drain(s"$tmp/adm", s"$tmp/c1", exactlyOnce = true)
    val first = canon(spark.read.parquet(s"$tmp/adm")
      .select("doc_id", "margin_micro", "__b"))
    assert(first.nonEmpty)
    drain(s"$tmp/adm", s"$tmp/c2", exactlyOnce = true)
    val replayed = canon(spark.read.parquet(s"$tmp/adm")
      .select("doc_id", "margin_micro", "__b"))
    assert(replayed == first,
      "a replayed batch must overwrite its own directory, not append a second copy")
    // the append-mode contract really is at-least-once: same forced
    // replay doubles the rows (that's why the keyed sink exists)
    drain(s"$tmp/adm_app", s"$tmp/c3", exactlyOnce = false)
    val n1 = spark.read.parquet(s"$tmp/adm_app").count()
    drain(s"$tmp/adm_app", s"$tmp/c4", exactlyOnce = false)
    assert(spark.read.parquet(s"$tmp/adm_app").count() == 2 * n1)
  }

  test("composes with the curation funnel as a keep/drop gate") {
    // the deployment shape: train on the seed, gate the corpus, then
    // run the downstream funnel stages on survivors only
    val scored = QualityLr.trainAndScore(corpus, "doc_id", "text", "label")
    assert(scored.columns.contains("hq") && scored.columns.contains("text"))
    val kept = scored.filter(col("hq"))
    val c4 = Curation.c4Filter(
      kept.withColumn("text", concat(col("text"), lit(". and that have with."))),
      "doc_id", "text", minKeptLines = 1)
    // survivors flow through C4 with counts monotone: gate ≥ c4-kept
    val nKept = kept.count(); val nC4 = c4.filter(col("kept")).count()
    assert(nKept > 0 && nC4 <= nKept)
    // and the gate actually dropped the salt docs
    assert(scored.filter(!col("hq") && col("label") === 1).count() <= 2)
  }

  test("trainWithFloor refuses an EMPTY held-out set with the floor message, not an NPE") {
    val train = corpus.filter(col("doc_id") < 30)
    val empty = corpus.filter(lit(false))
    // empty audit set → all-zero confusion → precision/recall 0 →
    // maximally-conservative refusal (the r16 ADVICE path: the
    // group-less sum used to return one NULL row and NPE on getLong)
    val e = intercept[IllegalArgumentException] {
      QualityLr.trainWithFloor(train, empty,
        "doc_id", "text", "label", minPrecision = 0.5, minRecall = 0.5)
    }
    assert(e.getMessage.contains("held-out floor"))
  }

  test("model store refuses to overwrite an existing version (racing publishers)") {
    val tmp = java.nio.file.Files.createTempDirectory("qlrrace").toString
    val store = new QualityLr.ModelStore(spark, tmp)
    val m = QualityLr.train(corpus, "doc_id", "text", "label")
    assert(store.publish(m) == 1)
    val before = store.read(1)
    // the losing racer allocated the same version: must refuse, and
    // v=1's bytes must be untouched (versions are immutable)
    intercept[java.util.ConcurrentModificationException] {
      store.publishAs(QualityLr.Model(m.weights.map(_ + 1.0), m.bias), 1)
    }
    val after = store.read(1)
    assert(after.weights.toSeq == before.weights.toSeq && after.bias == before.bias)
    // and no stray tmp file blocks the next legitimate publish
    assert(store.publish(m) == 2)
  }

  test("model store read detects corruption and truncation; prune keeps the tail") {
    val tmp = java.nio.file.Files.createTempDirectory("qlrcrc").toString
    val store = new QualityLr.ModelStore(spark, tmp)
    val m = QualityLr.train(corpus, "doc_id", "text", "label")
    store.publish(m); store.publish(m); store.publish(m)
    // the nio edits below must hit the STORE's own checksum, not
    // hadoop LocalFileSystem's stale .crc sidecars — drop those
    def dropSidecar(v: Int): Unit =
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(tmp, s".v=$v.crc"))
    // corrupt v=1's payload (flip a digit past the header): checksum fails
    val p1 = java.nio.file.Paths.get(tmp, "v=1")
    val lines = java.nio.file.Files.readAllLines(p1)
    lines.set(1, lines.get(1) + "1")
    java.nio.file.Files.write(p1, lines)
    dropSidecar(1)
    val e1 = intercept[java.io.IOException](store.read(1))
    assert(e1.getMessage.contains("checksum"))
    // truncate v=2 after the header+bias: line-count check fails...
    val p2 = java.nio.file.Paths.get(tmp, "v=2")
    val l2 = java.nio.file.Files.readAllLines(p2)
    java.nio.file.Files.write(p2, java.util.List.of(l2.get(0), l2.get(1), l2.get(2)))
    dropSidecar(2)
    // ...via the checksum first (payload changed), either way it throws
    intercept[java.io.IOException](store.read(2))
    // a header-less file REFUSES by default — a torn qlr1 publish that
    // lost exactly its header line is indistinguishable from the
    // legacy format, so the checksum bypass is gated on explicit
    // adoption; after adoptLegacy() the pre-checksum store reads
    val p3 = java.nio.file.Paths.get(tmp, "v=3")
    val l3 = new java.util.ArrayList(java.nio.file.Files.readAllLines(p3))
    l3.remove(0)
    java.nio.file.Files.write(p3, l3)
    dropSidecar(3)
    val e3 = intercept[java.io.IOException](store.read(3))
    assert(e3.getMessage.contains("adoptLegacy"))
    store.adoptLegacy()
    assert(store.read(3).weights.toSeq == m.weights.toSeq)
    // prune keeps the newest tail and version numbers keep ascending
    store.prune(keepLast = 1)
    assert(store.versions == Seq(3))
    assert(store.publish(m) == 4)
    intercept[IllegalArgumentException](store.prune(0))
  }
}
