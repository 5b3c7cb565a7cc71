package graft.pipeline

import graft.SparkSpec
import graft.schema.{MergeGuard, TableConfig}
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Merge-on-read manifest store: O(batch) write-only appends, scan-time
  * cursor-latest reconcile, tombstones, compaction, crash atomicity. */
class MorStoreSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = TableConfig("mor.items", null, Seq("k"), cursorField = Some("ts"))

  private def ts(s: String) = Timestamp.valueOf(s)

  private def mk(dir: String, compactSegments: Int = 8) =
    new MorStore(spark, dir, "p", cfg, compactSegments)

  test("reconcile: updates win by cursor, tombstones delete, inserts land") {
    val t = Files.createTempDirectory("mor").toString
    val store = mk(t)
    store.appendDelta(Seq(
      ("a", ts("2024-01-01 00:00:00"), "p1", 1),
      ("b", ts("2024-01-01 00:00:00"), "p1", 2),
      ("c", ts("2024-01-01 00:00:00"), "p2", 3)).toDF("k", "ts", "p", "v"))
    // update a (newer cursor), stale update b (older cursor), insert d
    store.appendDelta(Seq(
      ("a", ts("2024-01-02 00:00:00"), "p1", 10),
      ("b", ts("2023-12-01 00:00:00"), "p1", 99),
      ("d", ts("2024-01-01 00:00:00"), "p2", 4)).toDF("k", "ts", "p", "v"))
    // delete c with a dominating cursor
    store.delete(Seq(("p2", "c", ts("2024-02-01 00:00:00"))).toDF("p", "k", "ts"))
    assert(canon(store.read.get.select("k", "v")) ==
      Seq(Seq("a", "10"), Seq("b", "2"), Seq("d", "4")))
  }

  test("a tombstone with an older cursor loses to the live row") {
    val t = Files.createTempDirectory("mor").toString
    val store = mk(t)
    store.appendDelta(Seq(("a", ts("2024-01-05 00:00:00"), "p1", 1)).toDF("k", "ts", "p", "v"))
    store.delete(Seq(("p1", "a", ts("2024-01-01 00:00:00"))).toDF("p", "k", "ts"))
    assert(canon(store.read.get.select("k", "v")) == Seq(Seq("a", "1")))
    // and a delete-then-reinsert with a newer cursor resurrects the key
    store.delete(Seq(("p1", "a", ts("2024-02-01 00:00:00"))).toDF("p", "k", "ts"))
    assert(store.read.get.count() == 0)
    store.appendDelta(Seq(("a", ts("2024-03-01 00:00:00"), "p1", 7)).toDF("k", "ts", "p", "v"))
    assert(canon(store.read.get.select("k", "v")) == Seq(Seq("a", "7")))
  }

  test("applyDelta: refresh + tombstones in ONE segment, ONE commit; tombstone wins ties") {
    val t = Files.createTempDirectory("mor").toString
    val store = mk(t)
    store.appendDelta(Seq(
      ("a", ts("2024-01-01 00:00:00"), "p1", 1),
      ("b", ts("2024-01-01 00:00:00"), "p1", 2),
      ("c", ts("2024-01-01 00:00:00"), "p2", 3)).toDF("k", "ts", "p", "v"))
    val v1 = store.latestManifestVersion.get
    // one tick: refresh a, insert d, delete c — a single commit
    store.applyDelta(
      Seq(("a", ts("2024-01-02 00:00:00"), "p1", 10),
          ("d", ts("2024-01-02 00:00:00"), "p2", 4)).toDF("k", "ts", "p", "v"),
      Seq(("p2", "c", ts("2024-01-02 00:00:00"))).toDF("p", "k", "ts"))
    assert(store.latestManifestVersion.get == v1 + 1, "exactly one manifest commit")
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new Path(t)).count(_.getPath.getName.startsWith("seg_")) == 2,
      "refresh and tombstones share one segment")
    assert(canon(store.read.get.select("k", "v")) ==
      Seq(Seq("a", "10"), Seq("b", "2"), Seq("d", "4")))
    // same key on both sides at the SAME cursor: the tombstone wins
    store.applyDelta(
      Seq(("b", ts("2024-02-01 00:00:00"), "p1", 99)).toDF("k", "ts", "p", "v"),
      Seq(("p1", "b", ts("2024-02-01 00:00:00"))).toDF("p", "k", "ts"))
    assert(canon(store.read.get.select("k", "v")) ==
      Seq(Seq("a", "10"), Seq("d", "4")))
    // an empty delete side is the plain append shape — still one commit
    val v3 = store.latestManifestVersion.get
    store.applyDelta(
      Seq(("e", ts("2024-03-01 00:00:00"), "p1", 5)).toDF("k", "ts", "p", "v"),
      Seq.empty[(String, String, Timestamp)].toDF("p", "k", "ts"))
    assert(store.latestManifestVersion.get == v3 + 1)
    assert(canon(store.read.get.select("k", "v")) ==
      Seq(Seq("a", "10"), Seq("d", "4"), Seq("e", "5")))
  }

  test("appendDelta and delete never read data segments (write-only proof)") {
    val t = Files.createTempDirectory("mor").toString
    val store = mk(t)
    store.appendDelta(Seq(("a", ts("2024-01-01 00:00:00"), "p1", 1)).toDF("k", "ts", "p", "v"))
    // break every existing data segment: a write path that read any of
    // them would now fail
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val segs = fs.listStatus(new Path(t)).filter(_.getPath.getName.startsWith("seg_"))
    segs.foreach(s => fs.rename(s.getPath, new Path(t, "hidden_" + s.getPath.getName)))
    store.appendDelta(Seq(("b", ts("2024-01-02 00:00:00"), "p1", 2)).toDF("k", "ts", "p", "v"))
    store.delete(Seq(("p1", "a", ts("2024-03-01 00:00:00"))).toDF("p", "k", "ts"))
    // restore; the reads reconcile across all three commits
    segs.foreach(s => fs.rename(new Path(t, "hidden_" + s.getPath.getName), s.getPath))
    assert(canon(store.read.get.select("k", "v")) == Seq(Seq("b", "2")))
  }

  test("compact materializes the view; later tombstones still kill compacted rows") {
    val t = Files.createTempDirectory("mor").toString
    val store = mk(t)
    store.appendDelta(Seq(
      ("a", ts("2024-01-01 00:00:00"), "p1", 1),
      ("b", ts("2024-01-01 00:00:00"), "p2", 2)).toDF("k", "ts", "p", "v"))
    store.appendDelta(Seq(("a", ts("2024-01-02 00:00:00"), "p1", 5)).toDF("k", "ts", "p", "v"))
    val before = canon(store.read.get.select("k", "v"))
    store.compact()
    assert(store.liveSegments == 1)
    assert(canon(store.read.get.select("k", "v")) == before)
    store.delete(Seq(("p1", "a", ts("2024-02-01 00:00:00"))).toDF("p", "k", "ts"))
    assert(canon(store.read.get.select("k", "v")) == Seq(Seq("b", "2")))
  }

  test("a tombstone SURVIVES compaction: late lower-cursor inserts stay dead") {
    // the equality-delete compaction hazard the model-based property
    // test caught: delete at cursor 23, compact (which must RETAIN the
    // tombstone), then an out-of-order insert at cursor 7 — the
    // tombstone's cursor still dominates, so the key stays deleted
    val t = Files.createTempDirectory("mor").toString
    val store = mk(t)
    store.appendDelta(Seq(("a", ts("2024-01-01 00:10:00"), "p1", 1)).toDF("k", "ts", "p", "v"))
    store.delete(Seq(("p1", "a", ts("2024-01-01 00:23:00"))).toDF("p", "k", "ts"))
    store.compact()
    assert(store.read.get.count() == 0)
    store.appendDelta(Seq(("a", ts("2024-01-01 00:07:00"), "p1", 99)).toDF("k", "ts", "p", "v"))
    assert(store.read.get.count() == 0, "lower-cursor insert resurrected a compacted-away tombstone")
    // and a genuinely newer insert still resurrects the key, which also
    // retires the tombstone at the next compaction
    store.appendDelta(Seq(("a", ts("2024-01-01 00:30:00"), "p1", 7)).toDF("k", "ts", "p", "v"))
    assert(canon(store.read.get.select("k", "v")) == Seq(Seq("a", "7")))
    store.compact()
    assert(canon(store.read.get.select("k", "v")) == Seq(Seq("a", "7")))
  }

  test("readPartitions reconciles only the wanted values") {
    val t = Files.createTempDirectory("mor").toString
    val store = mk(t)
    store.appendDelta(Seq(
      ("a", ts("2024-01-01 00:00:00"), "p1", 1),
      ("b", ts("2024-01-01 00:00:00"), "p2", 2)).toDF("k", "ts", "p", "v"))
    assert(canon(store.readPartitions(Seq("p2")).get.select("k", "v")) == Seq(Seq("b", "2")))
    assert(store.readPartitions(Seq("nope")).get.count() == 0)
  }

  test("torn commit is invisible; vacuum sweeps orphans and old manifests") {
    val t = Files.createTempDirectory("mor").toString
    val store = mk(t)
    store.appendDelta(Seq(("a", ts("2024-01-01 00:00:00"), "p1", 1)).toDF("k", "ts", "p", "v"))
    val fs = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a writer that died after staging a segment + tmp manifest
    // — at the index an in-flight writer actually uses (latest + 1)
    Seq(("x", ts("2024-01-09 00:00:00"), "p1", 9)).toDF("k", "ts", "p", "v")
      .write.parquet(s"$t/seg_000002_orphan")
    val out = fs.create(new Path(s"$t/_manifests/.tmp_m=2_dead"), true)
    out.write("p1\tseg_000002_orphan".getBytes("UTF-8")); out.close()
    assert(canon(store.read.get.select("k", "v")) == Seq(Seq("a", "1")))
    // IN-FLIGHT GUARD: while the manifest has not advanced past the
    // orphan's index, the "orphan" is indistinguishable from a live
    // concurrent appender's staged-but-unpublished segment (which a
    // successful publish would reference) — vacuum must SKIP both files
    store.vacuum(keepManifests = 1)
    assert(fs.exists(new Path(s"$t/seg_000002_orphan")),
      "vacuum deleted a segment a live writer could still publish")
    assert(fs.exists(new Path(s"$t/_manifests/.tmp_m=2_dead")))
    // the next commit advances the version PAST the orphan's index —
    // any publish of it would now refuse, so it is provably abandoned
    store.appendDelta(Seq(("b", ts("2024-01-02 00:00:00"), "p1", 2)).toDF("k", "ts", "p", "v"))
    store.vacuum(keepManifests = 1)
    assert(!fs.exists(new Path(s"$t/seg_000002_orphan")))
    assert(!fs.exists(new Path(s"$t/_manifests/.tmp_m=2_dead")),
      "crash-leaked staged manifests must not accumulate forever")
    assert(store.manifestVersions == Seq(2))
    assert(canon(store.read.get.select("k", "v")) == Seq(Seq("a", "1"), Seq("b", "2")))
  }

  test("a read-derived snapshot pinned to its read version refuses a racing delta") {
    val t = Files.createTempDirectory("mor").toString
    val store = mk(t)
    store.appendDelta(Seq(("a", ts("2024-01-01 00:00:00"), "p1", 1)).toDF("k", "ts", "p", "v"))
    val (live, v) = store.readVersioned.get
    val mat = live.localCheckpoint(false) // materialize winners-of-v, the gc shape
    // a concurrent door's delta lands in the read→publish window
    store.appendDelta(Seq(("b", ts("2024-01-02 00:00:00"), "p1", 2)).toDF("k", "ts", "p", "v"))
    intercept[java.util.ConcurrentModificationException] {
      store.snapshotFrom(mat, Some(v))
    }
    // the refusal preserved the delta: both rows are live
    assert(canon(store.read.get.select("k", "v")) == Seq(Seq("a", "1"), Seq("b", "2")))
  }

  test("mergeBatch bounds PER-PARTITION fan-in; cold partitions are never rewritten") {
    val t = Files.createTempDirectory("mor").toString
    val store = mk(t, compactSegments = 2)
    // p2 gets one early batch, then goes cold while p1 takes every tick
    store.mergeBatch(Seq(("cold", ts("2024-01-01 00:00:00"), "p2", 0))
      .toDF("k", "ts", "p", "v"), cfg)
    val coldSeg = store.readManifest(store.latestManifestVersion.get)("p2")
    (1 to 6).foreach { i =>
      store.mergeBatch(Seq((s"k$i", ts(f"2024-01-0$i%d 00:00:00"), "p1", i))
        .toDF("k", "ts", "p", "v"), cfg)
    }
    val man = store.readManifest(store.latestManifestVersion.get)
    assert(man("p1").length <= 3) // compacted base + at most compactSegments deltas
    assert(man("p2") == coldSeg)  // hot-partition compaction never touched it
    assert(store.read.get.count() == 7)
  }

  test("schema evolution: a column added later reads as NULL from old segments") {
    val t = Files.createTempDirectory("mor").toString
    val store = mk(t)
    store.appendDelta(Seq(("a", ts("2024-01-01 00:00:00"), "p1", 1)).toDF("k", "ts", "p", "v"))
    store.appendDelta(Seq(("b", ts("2024-01-02 00:00:00"), "p1", 2, "extra"))
      .toDF("k", "ts", "p", "v", "note"))
    val got = store.read.get.select("k", "note").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> null, "b" -> "extra"))
  }

  test("guards over non-cursor columns are refused at construction") {
    val bad = cfg.copy(guard = MergeGuard.TargetOlder("v"))
    val e = intercept[IllegalArgumentException] {
      new MorStore(spark, Files.createTempDirectory("mor").toString, "p", bad)
    }
    assert(e.getMessage.contains("copy-on-write"))
    // the cursor-aligned guard is exactly what reconcile implements — accepted
    new MorStore(spark, Files.createTempDirectory("mor").toString, "p",
      cfg.copy(guard = MergeGuard.TargetOlder("ts")))
  }

  test("snapshot refuses when the manifest advanced past its entry version") {
    val t = Files.createTempDirectory("mor").toString
    val store = mk(t)
    store.appendDelta(Seq(("a", ts("2024-01-01 00:00:00"), "p1", 1))
      .toDF("k", "ts", "p", "v"))
    val stale = store.latestManifestVersion
    // a concurrent writer's delta lands between the snapshot's entry
    // and its commit (simulated through the guard's test seam)
    store.appendDelta(Seq(("b", ts("2024-01-01 00:00:00"), "p1", 2))
      .toDF("k", "ts", "p", "v"))
    val e = intercept[java.util.ConcurrentModificationException] {
      store.snapshotFrom(
        Seq(("a", ts("2024-01-02 00:00:00"), "p1", 10)).toDF("k", "ts", "p", "v"),
        stale)
    }
    assert(e.getMessage.contains("single-writer"))
    // nothing committed: b's delta is still the live state
    assert(canon(store.read.get.select("k", "v")) ==
      Seq(Seq("a", "1"), Seq("b", "2")))
    // and a clean snapshot still works
    store.snapshot(Seq(("z", ts("2024-01-03 00:00:00"), "p1", 7))
      .toDF("k", "ts", "p", "v"))
    assert(canon(store.read.get.select("k", "v")) == Seq(Seq("z", "7")))
  }
}
