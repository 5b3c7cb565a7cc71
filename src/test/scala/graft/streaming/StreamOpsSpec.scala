package graft.streaming

import graft.SparkSpec
import graft.pipeline.{ManifestStore, TableStore}
import graft.schema.{MergeGuard, TableConfig}
import java.nio.file.Files
import java.sql.Timestamp

/** Structured Streaming micro-batch CDC: AvailableNow drain + idempotent
  * merge per batch + checkpointed resume. */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = TableConfig("ods.stream_items", null, Seq("k"),
    cursorField = Some("ts"), guard = MergeGuard.TargetOlder("ts"))

  test("AvailableNow drain merges batches; resume picks up only new files") {
    val t = Files.createTempDirectory("stream").toString
    val inbox = s"$t/inbox"; val ckpt = s"$t/ckpt"; val tableRoot = s"$t/table"
    val store = new TableStore(spark, tableRoot)

    val batch1 = Seq(("a", Timestamp.valueOf("2024-01-01 00:00:00"), 1),
                     ("b", Timestamp.valueOf("2024-01-02 00:00:00"), 2))
      .toDF("k", "ts", "v")
    batch1.write.mode("append").parquet(inbox)
    val stream1 = StreamOps.fileStream(spark, inbox, batch1.schema)
    StreamOps.mergeAvailable(stream1, store, cfg, ckpt)
    assert(canon(store.read.get.select("k", "v")) == Seq(Seq("a", "1"), Seq("b", "2")))

    // second drop: newer 'a', stale 'b', new 'c'
    Seq(("a", Timestamp.valueOf("2024-01-05 00:00:00"), 10),
        ("b", Timestamp.valueOf("2023-12-01 00:00:00"), 99),
        ("c", Timestamp.valueOf("2024-01-03 00:00:00"), 3))
      .toDF("k", "ts", "v").write.mode("append").parquet(inbox)
    StreamOps.mergeAvailable(StreamOps.fileStream(spark, inbox, batch1.schema), store, cfg, ckpt)
    assert(canon(store.read.get.select("k", "v")) == Seq(
      Seq("a", "10"), Seq("b", "2"), Seq("c", "3")).sortBy(_.mkString("|")))
  }

  test("maintainRollup: streamed partials converge to the batch recompute") {
    import org.apache.spark.sql.functions._
    val t = Files.createTempDirectory("stream-ivm").toString
    val inbox = s"$t/inbox"; val ckpt = s"$t/ckpt"
    val store = new TableStore(spark, s"$t/rollup")
    def roll(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,2)")).as("total"))

    val wave1 = Seq(("a", 1.5), ("a", 2.5), ("b", 4.0)).toDF("k", "v")
    wave1.write.mode("append").parquet(inbox)
    StreamOps.maintainRollup(StreamOps.fileStream(spark, inbox, wave1.schema),
      store, roll, Seq("k"), Seq("n", "total"), ckpt)
    // second wave touches one existing key and one new key
    Seq(("a", 10.0), ("c", 7.0)).toDF("k", "v").write.mode("append").parquet(inbox)
    StreamOps.maintainRollup(StreamOps.fileStream(spark, inbox, wave1.schema),
      store, roll, Seq("k"), Seq("n", "total"), ckpt)

    val all = wave1.unionByName(Seq(("a", 10.0), ("c", 7.0)).toDF("k", "v"))
    assertSameRows(
      store.read.get.select(col("k"), col("n"),
        col("total").cast("decimal(18,2)").as("total")),
      roll(all).select(col("k"), col("n"), col("total").cast("decimal(18,2)").as("total")))
  }

  test("foldRollupBatch is replay-idempotent: a re-delivered batch id folds once") {
    import org.apache.spark.sql.functions._
    val t = Files.createTempDirectory("stream-ivm-replay").toString
    val store = new TableStore(spark, s"$t/rollup")
    def roll(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(count(lit(1)).as("n"))
    val batch = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
    StreamOps.foldRollupBatch(store, batch, 0L, "e1", roll, Seq("k"), Seq("n"))
    // crash-replay: the checkpoint never committed, batch 0 re-delivers
    StreamOps.foldRollupBatch(store, batch, 0L, "e1", roll, Seq("k"), Seq("n"))
    val counts = store.read.get.select("k", "n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 2L, "b" -> 1L), s"double-counted: $counts")
    // the NEXT batch id still folds
    StreamOps.foldRollupBatch(store, Seq(("a", 9)).toDF("k", "v"), 1L, "e1", roll, Seq("k"), Seq("n"))
    val after = store.read.get.select("k", "n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == Map("a" -> 3L, "b" -> 1L))
  }

  test("a rebuilt checkpoint is refused even when batch ids line up (epoch stamp)") {
    import org.apache.spark.sql.functions._
    def roll(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(count(lit(1)).as("n"))
    val batch = Seq(("a", 1)).toDF("k", "v")

    // TableStore binding: store holds exactly batch 0 of epoch e1; a NEW
    // checkpoint (epoch e2) restarts ids at 0 — before the epoch stamp
    // this read as a crash-replay and was SILENTLY SKIPPED (the batch's
    // rows lost); now it fails the out-of-step check
    val t = Files.createTempDirectory("stream-epoch").toString
    val store = new TableStore(spark, s"$t/rollup")
    StreamOps.foldRollupBatch(store, batch, 0L, "e1", roll, Seq("k"), Seq("n"))
    val e = intercept[IllegalStateException](
      StreamOps.foldRollupBatch(store, batch, 0L, "e2", roll, Seq("k"), Seq("n")))
    assert(e.getMessage.contains("epoch"))
    // same-epoch replay of the same id still skips silently (idempotence)
    StreamOps.foldRollupBatch(store, batch, 0L, "e1", roll, Seq("k"), Seq("n"))
    assert(store.read.get.count() == 1)

    // partitioned binding: same ambiguity, same refusal — including when
    // the new epoch's first batch touches only the same day (stamp 0)
    def rollP(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("day", "k").agg(count(lit(1)).as("n"))
    val tp = Files.createTempDirectory("stream-epoch-p").toString
    val storeP = new ManifestStore(spark, s"$tp/rollup", "day")
    val bp = Seq(("d1", "a", 1)).toDF("day", "k", "v")
    StreamOps.foldRollupBatchPartitioned(storeP, bp, 0L, "e1", rollP, Seq("day", "k"), Seq("n"))
    val ep = intercept[IllegalStateException](
      StreamOps.foldRollupBatchPartitioned(storeP, bp, 0L, "e2", rollP, Seq("day", "k"), Seq("n")))
    assert(ep.getMessage.contains("epoch"))
    // ...and when it touches only NEW days (store-wide fallback check)
    val bpNew = Seq(("d9", "z", 1)).toDF("day", "k", "v")
    val ep2 = intercept[IllegalStateException](
      StreamOps.foldRollupBatchPartitioned(storeP, bpNew, 0L, "e2", rollP, Seq("day", "k"), Seq("n")))
    assert(ep2.getMessage.contains("epoch"))
  }

  test("mergeAvailable through a ManifestStore writes O(touched partitions) per micro-batch") {
    val t = Files.createTempDirectory("stream-manifest").toString
    val inbox = s"$t/inbox"; val ckpt = s"$t/ckpt"; val tableRoot = s"$t/table"
    val store = new ManifestStore(spark, tableRoot, "day")
    val pcfg = TableConfig("ods.part_items", null, Seq("k"), cursorField = Some("seq"))

    val schema = Seq(("a", 1L, "d1", 1)).toDF("k", "seq", "day", "v").schema
    // wave 1: two days, four rows
    Seq(("a", 1L, "d1", 1), ("b", 1L, "d1", 2), ("c", 1L, "d2", 3), ("d", 1L, "d2", 4))
      .toDF("k", "seq", "day", "v").write.mode("append").parquet(inbox)
    StreamOps.mergeAvailable(StreamOps.fileStream(spark, inbox, schema), store, pcfg, ckpt)
    // wave 2: touches ONLY d2 (newer c) and a new day d3 — d1 untouched
    Seq(("c", 2L, "d2", 30), ("e", 1L, "d3", 5))
      .toDF("k", "seq", "day", "v").write.mode("append").parquet(inbox)
    StreamOps.mergeAvailable(StreamOps.fileStream(spark, inbox, schema), store, pcfg, ckpt)

    // correctness: same answer a batch merge would give
    assert(canon(store.read.get.select("k", "v")) == Seq(
      Seq("a", "1"), Seq("b", "2"), Seq("c", "30"), Seq("d", "4"), Seq("e", "5")))

    // write scope: the second drain's commit re-points ONLY d2/d3; d1
    // still points at its wave-1 segment (never read, never rewritten)
    val versions = store.manifestVersions
    val mPrev = store.readManifest(versions(versions.length - 2))
    val mLast = store.readManifest(versions.last)
    assert(mLast("d1") == mPrev("d1"), "untouched partition was re-pointed")
    assert(mLast("d2") != mPrev("d2"), "touched partition must re-point")
    // and the new segment holds only the touched days' merged slice
    // (c+d of d2, e of d3 = 3 rows), not the 5-row table
    val segRows = spark.read.parquet(s"$tableRoot/${mLast("d2")}").count()
    assert(segRows == 3, s"segment holds $segRows rows — O(table), not O(touched)")
  }

  test("foldRollupBatchPartitioned: replay-idempotent, writes only touched days") {
    import org.apache.spark.sql.functions._
    val t = Files.createTempDirectory("stream-ivm-part").toString
    val store = new ManifestStore(spark, s"$t/rollup", "day")
    def roll(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("day", "k").agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,2)")).as("total"))

    val b0 = Seq(("d1", "a", 1.0), ("d1", "a", 2.0), ("d2", "b", 4.0)).toDF("day", "k", "v")
    StreamOps.foldRollupBatchPartitioned(store, b0, 0L, "e1", roll, Seq("day", "k"), Seq("n", "total"))
    // crash-replay of batch 0: must fold once
    StreamOps.foldRollupBatchPartitioned(store, b0, 0L, "e1", roll, Seq("day", "k"), Seq("n", "total"))
    // batch 1 touches ONLY d2
    val b1 = Seq(("d2", "b", 6.0), ("d2", "c", 1.0)).toDF("day", "k", "v")
    StreamOps.foldRollupBatchPartitioned(store, b1, 1L, "e1", roll, Seq("day", "k"), Seq("n", "total"))

    val state = store.read.get.select("day", "k", "n", "total")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDecimal(3).doubleValue)).toMap
    assert(state == Map(
      ("d1", "a") -> (2L, 3.0), ("d2", "b") -> (2L, 10.0), ("d2", "c") -> (1L, 1.0)), state)

    // write scope: batch 1's commit re-pointed only d2 — d1's segment is
    // unchanged from the batch-0 commit
    val versions = store.manifestVersions
    val mPrev = store.readManifest(versions(versions.length - 2))
    val mLast = store.readManifest(versions.last)
    assert(mLast("d1") == mPrev("d1"), "untouched day was rewritten")
    assert(mLast("d2") != mPrev("d2"))
    // stale-checkpoint detection still fires across partitions
    val e = intercept[IllegalStateException](
      StreamOps.foldRollupBatchPartitioned(store, b1, 0L, "e1", roll, Seq("day", "k"), Seq("n", "total")))
    assert(e.getMessage.contains("out of step"))
    // ...including when the replayed-from-zero batch touches ONLY NEW
    // days (no stamp in the touched slice): the store-wide epoch check
    // must still refuse to fold a new epoch onto the stale state
    val bNew = Seq(("d99", "z", 1.0)).toDF("day", "k", "v")
    val e2 = intercept[IllegalStateException](
      StreamOps.foldRollupBatchPartitioned(store, bNew, 0L, "e1", roll, Seq("day", "k"), Seq("n", "total")))
    assert(e2.getMessage.contains("out of step"))
    // while the legitimate NEXT id on a new day folds fine
    StreamOps.foldRollupBatchPartitioned(store, bNew, 2L, "e1", roll, Seq("day", "k"), Seq("n", "total"))
    assert(store.readPartitions(Seq("d99")).get.count() == 1)
  }

  test("mergeBatch retention: an unbounded merge cadence keeps disk bounded") {
    import java.io.File
    val t = Files.createTempDirectory("sink-retention").toString
    val tcfg = TableConfig("ods.t", null, Seq("k"), cursorField = Some("seq"))
    // TableStore sink: one full version per batch would be 8 dirs —
    // mergeBatch prunes to its retention horizon, answers unchanged
    val ts = new graft.pipeline.TableStore(spark, s"$t/tbl")
    (1 to 8).foreach { i =>
      ts.mergeBatch(Seq((s"k$i", i.toLong, i)).toDF("k", "seq", "v"), tcfg)
    }
    assert(ts.versions.length <= 4, s"versions on disk: ${ts.versions}")
    assert(ts.read.get.count() == 8)
    // ManifestStore sink: compaction retires segments, vacuum deletes
    // them — dead bytes do not accumulate across batches
    val ms = new ManifestStore(spark, s"$t/man", "day",
      mergeBatchMaxSegments = 2, mergeBatchKeepManifests = 2)
    (1 to 8).foreach { i =>
      ms.mergeBatch(Seq((s"k$i", i.toLong, s"d${i % 3}", i)).toDF("k", "seq", "day", "v"), tcfg)
    }
    assert(ms.manifestVersions.length <= 2, s"manifests: ${ms.manifestVersions}")
    val segDirs = new File(s"$t/man").listFiles.count(_.getName.startsWith("seg_"))
    assert(segDirs <= 6, s"$segDirs segment dirs survived vacuum")
    assert(ms.read.get.count() == 8)
  }

  test("watermarked windowed counts over a drained stream") {
    val t = Files.createTempDirectory("stream2").toString
    val inbox = s"$t/inbox"
    val data = Seq(("x", Timestamp.valueOf("2024-01-01 00:10:00")),
                   ("x", Timestamp.valueOf("2024-01-01 23:50:00")),
                   ("y", Timestamp.valueOf("2024-01-02 01:00:00")))
      .toDF("k", "ts")
    data.write.parquet(inbox)
    val counts = StreamOps.windowedCounts(
      StreamOps.fileStream(spark, inbox, data.schema), "ts", "1 day", "1 day", Seq("k"))
    val q = counts.writeStream.format("memory").queryName("wc")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(canon(spark.table("wc").select("k", "n")) == Seq(
      Seq("x", "2"), Seq("y", "1")).sortBy(_.mkString("|")))
  }

  test("streaming exact dedup: duplicate payloads dropped, state watermark-bounded") {
    val t = Files.createTempDirectory("stream3").toString
    val inbox = s"$t/inbox"
    val data = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), "same text"),
      (2L, Timestamp.valueOf("2024-01-01 10:05:00"), "same text"),   // dup content
      (3L, Timestamp.valueOf("2024-01-01 10:10:00"), "other text"),
      (4L, Timestamp.valueOf("2024-01-01 10:15:00"), null)           // NULL payload kept once
    ).toDF("id", "ts", "body")
    data.write.parquet(inbox)
    val deduped = StreamOps.dedupStream(
      StreamOps.fileStream(spark, inbox, data.schema), "ts", "1 hour", Seq("body"))
    val q = deduped.writeStream.format("memory").queryName("dd")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val kept = spark.table("dd").select("body").collect().map(_.getString(0)).toSeq
    assert(kept.count(_ == "same text") == 1)
    assert(kept.count(_ == "other text") == 1)
    assert(kept.count(_ == null) == 1)
  }

  test("stream-stream interval join: drained result equals the batch join, any split") {
    import org.apache.spark.sql.functions._
    val t = Files.createTempDirectory("stream-ij").toString
    val views = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00")),
      (1L, Timestamp.valueOf("2024-01-01 14:00:00")),
      (2L, Timestamp.valueOf("2024-01-01 10:30:00")),
      (3L, Timestamp.valueOf("2024-01-01 09:00:00"))).toDF("user_id", "view_ts")
    val buys = Seq(
      (1L, Timestamp.valueOf("2024-01-01 11:30:00"), 5.0),  // in window of view 1 only
      (1L, Timestamp.valueOf("2024-01-01 15:00:00"), 7.0),  // in window of view 2 (and 1 at 5h? no: >2h)
      (2L, Timestamp.valueOf("2024-01-01 10:00:00"), 9.0),  // BEFORE the view: no match
      (4L, Timestamp.valueOf("2024-01-01 10:45:00"), 3.0))  // no view for user: no match
      .toDF("user_id", "purchase_ts", "v")
    // split each side into single-row files → maximally interleaved micro-batches
    views.repartition(4).write.parquet(s"$t/views")
    buys.repartition(4).write.parquet(s"$t/buys")
    def feed(sub: String, schema: org.apache.spark.sql.types.StructType) =
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(s"$t/$sub")
    val joined = StreamOps.intervalJoin(
      feed("views", views.schema), feed("buys", buys.schema),
      "view_ts", "purchase_ts", Seq("user_id"), within = "2 hours", lateness = "10 days")
    val q = joined.writeStream.format("memory").queryName("ij")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val batch = views.alias("l").join(buys.alias("r"),
      col("l.user_id") === col("r.user_id") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr("INTERVAL 2 hours"))
      .drop(col("r.user_id"))
    assertSameRows(
      spark.table("ij").select("user_id", "view_ts", "purchase_ts", "v"),
      batch.select("user_id", "view_ts", "purchase_ts", "v"))
    // the unmatched rows really are unmatched
    assert(spark.table("ij").filter(col("user_id").isin(3L, 4L)).count() == 0)
  }

  test("intervalJoin rejects colliding non-key column names") {
    val a = Seq((1L, Timestamp.valueOf("2024-01-01 00:00:00"), "x")).toDF("k", "ts", "v")
    val e = intercept[IllegalArgumentException] {
      StreamOps.intervalJoin(a, a, "ts", "ts", Seq("k"), "1 hour", "1 day")
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("decontaminateDrain admits exactly the batch screen's complement, any split") {
    import org.apache.spark.sql.functions._
    val t = Files.createTempDirectory("decon").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val eval = docs.filter(col("doc_id") % 10 === 0)
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    // unbalanced chunks on purpose — admission must not depend on them
    Seq(col("doc_id") % 7 === 0, col("doc_id") % 7 === 1,
        col("doc_id") % 7 >= 2).foreach { p =>
      train.filter(p).select("doc_id", "text").repartition(1)
        .write.mode("append").parquet(s"$t/feed")
    }
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$t/feed").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$t/feed")
    StreamOps.decontaminateDrain(stream, eval, "doc_id", "text",
      s"$t/admitted", s"$t/ckpt")
    val drained = spark.read.parquet(s"$t/admitted").select("doc_id")
    val bad = graft.llm.Dedup.contamination(train, "doc_id", eval, "doc_id",
        "text", shingleSize = 3, threshold = 0.5)
      .select(col("train_id").as("doc_id")).distinct()
    val want = train.select("doc_id").join(bad, Seq("doc_id"), "left_anti")
    assertSameRows(drained.orderBy("doc_id"), want.orderBy("doc_id"))
    assert(drained.count() > 0 && drained.count() < train.count(),
      "fixture should both admit and reject")
  }

  test("signatureDedupDrain: sequential ticks screen against earlier survivors") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val t = Files.createTempDirectory("sigdrain").toString
    // hand-built 64-bit signatures, all unrelated pairs ≥ 8 bits apart:
    // corpus 1..3; tick A: 10 = exact copy of 2 (rejected against the
    // corpus), 11 novel (admitted); tick B: 20 = ONE-bit flip of 11
    // (rejected only because 11's admission persisted), 21 novel
    val store = new graft.llm.PhashIndexStore(spark, s"$t/store", "doc_id")
    store.append(Seq((1L, 0xFFL), (2L, 0xFF00L), (3L, 0xFF0000L))
      .toDF("doc_id", "ahash"))
    Seq(Seq((10L, 0xFF00L), (11L, 0xFF000000L)),
        Seq((20L, 0xFF000000L ^ 1L), (21L, 0xFF00000000L)))
      .foreach(b => b.toDF("doc_id", "ahash").coalesce(1)
        .write.mode("append").parquet(s"$t/feed"))
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$t/feed").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$t/feed")
    StreamOps.signatureDedupDrain(stream, store, s"$t/admitted", s"$t/ckpt")
    val admitted = spark.read.parquet(s"$t/admitted")
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(11L, 21L), s"admitted $admitted")
  }

  test("admission clock survives checkpoint RE-CREATION: a fresh checkpoint stamps above the old watermark") {
    import org.apache.spark.sql.functions._
    val t = Files.createTempDirectory("admclock").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val store = new graft.llm.MinhashIndexStore(spark, s"$t/store", "doc_id", "text")
    // lifetime 1: two ticks against checkpoint A — stamps 0 and 1
    docs.filter(col("doc_id") % 10 === 1).coalesce(1).write.parquet(s"$t/feed1")
    docs.filter(col("doc_id") % 10 === 6).coalesce(1)
      .write.mode("append").parquet(s"$t/feed1")
    val s1 = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$t/feed1")
    StreamOps.dedupIndexDrain(s1, store, 0.8, s"$t/adm1", s"$t/ckptA")
    assert(store.admFloor.contains(1L))
    // lifetime 2: the checkpoint is RE-CREATED (routine after a
    // reindex/migration) — batch ids restart at 0, but the persisted
    // floor keeps the retention clock monotone: the new tick stamps 2
    docs.filter(col("doc_id") % 10 === 4).coalesce(1).write.parquet(s"$t/feed2")
    val s2 = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$t/feed2")
    StreamOps.dedupIndexDrain(s2, store, 0.8, s"$t/adm2", s"$t/ckptB")
    assert(store.admFloor.contains(2L),
      "the re-created checkpoint's tick must stamp floor + 1, not batch id 0")
    val lifetime2 = spark.read.parquet(s"$t/adm2").count()
    val total = store.indexedDocs.get.count()
    // a watermark derived from the OLD clock still works: it evicts
    // exactly the old lifetimes' admissions and the new tick SURVIVES —
    // without the floor the new tick would have stamped 0 and been
    // instantly evictable here
    assert(store.expire(2L) == total - lifetime2)
    assert(store.indexedDocs.get.count() == lifetime2)
    assert(store.expire(2L) == 0L)
    // crash-RESTART of a lifetime (same checkpoint dir) reuses its
    // recorded base — replayed/resumed ticks re-stamp the same clock
    StreamOps.dedupIndexDrain(
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$t/feed2"),
      store, 0.8, s"$t/adm2", s"$t/ckptB")
    assert(store.admFloor.contains(2L), "a resumed lifetime must not advance the base")
  }

  test("dedupIndexDrain retention cadence: the drain slides its own window, no caller orchestration") {
    import spark.implicits._
    val t = Files.createTempDirectory("retcad").toString
    // hand-built corpus with known relations: copies share texts exactly,
    // novels are pairwise-unrelated (disjoint shingle sets)
    def text(tag: String) =
      s"$tag alpha $tag bravo $tag charlie $tag delta $tag echo $tag foxtrot"
    val A = text("aa"); val B = text("bb"); val C = text("cc"); val D = text("dd")
    Seq(Seq((1L, A), (2L, B)),          // tick 0 (adm 0)
        Seq((11L, A), (12L, C)),        // tick 1: 11 rejected vs 1; 12 admits
        Seq((21L, C), (22L, D)))        // tick 2: 21 rejected vs 12; 22 admits
      .foreach(b => b.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(s"$t/feed"))
    val store = new graft.llm.MinhashIndexStore(spark, s"$t/store", "doc_id", "text")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$t/feed").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$t/feed")
    StreamOps.dedupIndexDrain(stream, store, 0.8, s"$t/admitted", s"$t/ckpt",
      exactlyOnceSink = true, retention = Some((2L, 1)))
    // per-tick admissions unaffected by the cadence (sequential contract)
    assert(spark.read.parquet(s"$t/admitted/__b=1")
      .select("doc_id").as[Long].collect().toSet == Set(12L))
    // the cadence fired expire(adm − 1) at tick 2: tick 0's admissions
    // (adm 0) slid out, the last two ticks are the live window
    val probe = Seq((31L, A), (32L, D)).toDF("doc_id", "text")
    val survivors = store.probe(probe, 0.8).select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(31L),
      s"window must admit tick-0 copies and reject live-window copies; got $survivors")
    // ...and the cadence's gcTombstones kept the state physically bounded
    assert(store.segmentCounts == ((1, 1)))
  }

  test("tickConf is reentrant: nested and concurrent ticks restore AQE exactly once") {
    val key = "spark.sql.adaptive.enabled"
    spark.conf.set(key, "true") // pin the fixture regardless of suite order
    // nested: the inner tick must NOT capture 'false' as prev
    StreamOps.tickConf(spark) {
      assert(spark.conf.get(key) == "false")
      StreamOps.tickConf(spark) { assert(spark.conf.get(key) == "false") }
      // inner exit must not restore early — still inside the outer tick
      assert(spark.conf.get(key) == "false")
    }
    assert(spark.conf.get(key) == "true")
    // concurrent: two threads racing ticks; flag ends restored
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (1 to 8).map(_ => Future {
      StreamOps.tickConf(spark) {
        assert(spark.conf.get(key) == "false"); Thread.sleep(5)
      }
    })
    Await.result(Future.sequence(fs), scala.concurrent.duration.Duration(60, "s"))
    assert(spark.conf.get(key) == "true")
  }
}
