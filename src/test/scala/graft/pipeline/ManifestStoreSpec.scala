package graft.pipeline

import graft.SparkSpec
import graft.schema.{MergeGuard, TableConfig}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** ManifestStore — atomic multi-partition commits. The crash injections
  * simulate a writer dying at every point of the commit protocol and
  * assert readers see ALL-old or ALL-new, never a mix (the window
  * PartitionedStore's per-directory swap documents and this store
  * closes).
  */
class ManifestStoreSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = TableConfig("t", null, Seq("k"),
    cursorField = Some("seq"), guard = MergeGuard.TargetOlder("seq"))

  private def fresh(): (ManifestStore, String) = {
    val root = Files.createTempDirectory("manifest-store").toString + "/t"
    (new ManifestStore(spark, root, "p"), root)
  }

  test("snapshot + multi-partition upsert: merged answer, untouched partitions unread") {
    val (store, root) = fresh()
    store.snapshot(Seq(
      (1L, 1L, "a", "p1"), (2L, 1L, "b", "p2"), (3L, 1L, "c", "p3")
    ).toDF("k", "seq", "v", "p"))
    // batch touches p1 and p2 (one update wins, one loses to the guard)
    val touched = store.upsert(Seq(
      (1L, 2L, "a2", "p1"), (2L, 0L, "b0", "p2"), (4L, 1L, "d", "p1")
    ).toDF("k", "seq", "v", "p"), cfg)
    assert(touched.toSet == Set("p1", "p2"))
    assert(canon(store.read.get.select("k", "seq", "v")) == Seq(
      Seq("1", "2", "a2"), Seq("2", "1", "b"), Seq("3", "1", "c"), Seq("4", "1", "d")
    ).sortBy(_.mkString("|")))
    // two manifests committed; the old one still resolves (time travel)
    assert(store.manifestVersions == Seq(1, 2))
    assert(store.readManifest(1).values.toSet.size == 1) // all values → snapshot seg
    // partition-pruned read touches only p3's segment (the snapshot seg)
    assert(canon(store.readPartitions(Seq("p3")).get.select("k", "v")) == Seq(Seq("3", "c")))
  }

  test("compact collapses live segments to one; bounded upsert self-compacts") {
    val (store, _) = fresh()
    store.snapshot(Seq(
      (1L, 1L, "a", "p1"), (2L, 1L, "b", "p2"), (9L, 1L, "z", "p9")
    ).toDF("k", "seq", "v", "p"))
    store.upsert(Seq((1L, 2L, "a2", "p1")).toDF("k", "seq", "v", "p"), cfg)
    store.upsert(Seq((2L, 2L, "b2", "p2")).toDF("k", "seq", "v", "p"), cfg)
    assert(store.liveSegments == 3) // snapshot (p9 still points at it) + one per merge
    val before = canon(store.read.get.select("k", "seq", "v"))
    store.compact()
    assert(store.liveSegments == 1)
    assert(canon(store.read.get.select("k", "seq", "v")) == before)
    // old segments become unreferenced — vacuum removes them, reads survive
    store.vacuum(keepManifests = 1)
    assert(canon(store.read.get.select("k", "seq", "v")) == before)

    // bounded upsert: stays fragmented up to the budget, then compacts
    store.upsert(Seq((3L, 1L, "c", "p3")).toDF("k", "seq", "v", "p"), cfg, maxSegments = 2)
    assert(store.liveSegments == 2)
    store.upsert(Seq((4L, 1L, "d", "p1")).toDF("k", "seq", "v", "p"), cfg, maxSegments = 2)
    assert(store.liveSegments == 1)
    assert(canon(store.read.get.select("k", "v")) == Seq(
      Seq("1", "a2"), Seq("2", "b2"), Seq("3", "c"), Seq("4", "d"), Seq("9", "z")))
  }

  test("crash BEFORE manifest commit: an orphan segment is invisible; vacuum sweeps it") {
    val (store, root) = fresh()
    store.snapshot(Seq((1L, 1L, "a", "p1")).toDF("k", "seq", "v", "p"))
    // simulate: writer died after fully materializing a merge segment but
    // before the manifest rename — a complete, valid, UNREFERENCED segment
    Seq((1L, 9L, "ghost", "p1")).toDF("k", "seq", "v", "p")
      .write.parquet(s"$root/seg_orphan01")
    assert(canon(store.read.get.select("k", "v")) == Seq(Seq("1", "a")))
    // and a torn staged manifest
    val tornMan = new java.io.File(s"$root/_manifests/.tmp_m=2")
    java.nio.file.Files.write(tornMan.toPath, "p1\tseg_orphan01".getBytes)
    assert(store.manifestVersions == Seq(1))
    assert(canon(store.read.get.select("k", "v")) == Seq(Seq("1", "a")))
    // next commit sweeps the torn manifest and lands cleanly as m=2
    store.upsert(Seq((2L, 1L, "b", "p2")).toDF("k", "seq", "v", "p"), cfg)
    assert(store.manifestVersions == Seq(1, 2))
    assert(!tornMan.exists())
    store.vacuum(keepManifests = 1)
    assert(!new java.io.File(s"$root/seg_orphan01").exists())
    assert(canon(store.read.get.select("k", "v")) == Seq(Seq("1", "a"), Seq("2", "b")))
  }

  test("atomicity: a multi-partition merge is one pointer swap — old-or-new, never mixed") {
    val (store, _) = fresh()
    store.snapshot(Seq(
      (1L, 1L, "a", "p1"), (2L, 1L, "b", "p2")
    ).toDF("k", "seq", "v", "p"))
    store.upsert(Seq(
      (1L, 2L, "a2", "p1"), (2L, 2L, "b2", "p2")
    ).toDF("k", "seq", "v", "p"), cfg)
    // there IS no intermediate state on disk: manifest 1 resolves the
    // fully-old table, manifest 2 the fully-new one. A reader pinned to
    // either version sees a consistent table — the "kill between
    // partition swaps" scenario cannot occur because partitions re-point
    // together in one rename.
    val m1 = store.readManifest(1)
    val m2 = store.readManifest(2)
    assert(m1("p1") == m1("p2"), "old state: both partitions on the snapshot segment")
    assert(m2("p1") == m2("p2") && m2("p1") != m1("p1"),
      "new state: both partitions re-pointed to the merge segment together")
  }

  test("NULL partition values round-trip through the manifest") {
    val (store, _) = fresh()
    store.snapshot(Seq[(Long, Long, String, Option[String])](
      (1L, 1L, "a", Some("p1")), (2L, 1L, "b", None)
    ).toDF("k", "seq", "v", "p"))
    store.upsert(Seq[(Long, Long, String, Option[String])]((2L, 2L, "b2", None))
      .toDF("k", "seq", "v", "p"), cfg)
    assert(canon(store.read.get.select("k", "v")) == Seq(Seq("1", "a"), Seq("2", "b2")))
    assert(canon(store.readPartitions(Seq("__HIVE_DEFAULT_PARTITION__")).get.select("k", "v"))
      == Seq(Seq("2", "b2")))
  }

  test("a committed EMPTY manifest reads as None, not a reduce crash") {
    val (store, _) = fresh()
    // snapshot of an empty frame commits an empty manifest (no partition
    // values) — read/readPartitions must answer "no data", and a later
    // real snapshot must supersede it cleanly
    store.snapshot(Seq.empty[(Long, Long, String, String)].toDF("k", "seq", "v", "p"))
    assert(store.read.isEmpty)
    assert(store.readPartitions(Seq("p1")).isEmpty)
    store.snapshot(Seq((1L, 1L, "a", "p1")).toDF("k", "seq", "v", "p"))
    assert(canon(store.read.get.select("k", "v")) == Seq(Seq("1", "a")))
  }

  test("changedKeys: exactly the differing keys — re-pointed-but-identical rows excluded") {
    val (store, _) = fresh()
    store.upsert(Seq(
      (1L, 1L, "a", "p1"), (2L, 1L, "b", "p2"), (3L, 1L, "c", "p3")
    ).toDF("k", "seq", "v", "p"), cfg)
    val v1 = store.latestManifestVersion.get
    // rewrite p1 (update k=1), insert k=4 into p2, DROP p3 entirely
    store.upsert(Seq((1L, 2L, "a2", "p1"), (4L, 2L, "d", "p2"))
      .toDF("k", "seq", "v", "p"), cfg)
    store.replacePartitions(
      store.readPartitions(Seq("p3")).get.filter(lit(false)), Seq("p3"))
    val v3 = store.latestManifestVersion.get
    val keys = store.changedKeys(v1, v3, Seq("k")).collect().map(_.getLong(0)).toSet
    // k=1 (rewritten), k=4 (inserted), k=3 (disappeared with p3) —
    // NOT k=2: its partition's segment was re-pointed but the row is
    // byte-identical, and a false positive here is what a consumer's
    // fact-side probe would amplify into a full refresh
    assert(keys == Set(1L, 3L, 4L), keys.toString)
    // v->v is empty
    assert(store.changedKeys(v3, v3, Seq("k")).isEmpty)
  }

  test("replacePartitions drops cleared values whose rows are gone") {
    val (store, _) = fresh()
    store.snapshot(Seq(
      (1L, 1L, "a", "p1"), (2L, 1L, "b", "p2"), (3L, 1L, "c", "p2")
    ).toDF("k", "seq", "v", "p"))
    // rewrite p2 minus row k=2 (a delete); p1 untouched
    store.replacePartitions(Seq((3L, 1L, "c", "p2")).toDF("k", "seq", "v", "p"), Seq("p2"))
    assert(canon(store.read.get.select("k", "v")) == Seq(Seq("1", "a"), Seq("3", "c")))
    // empty a partition entirely: the value disappears instead of
    // resurrecting its old segment
    store.replacePartitions(
      Seq.empty[(Long, Long, String, String)].toDF("k", "seq", "v", "p"), Seq("p2"))
    assert(canon(store.read.get.select("k", "v")) == Seq(Seq("1", "a")))
    assert(store.readPartitions(Seq("p2")).get.isEmpty)
  }

  test("new-partition upsert inserts without a target slice") {
    val (store, _) = fresh()
    store.snapshot(Seq((1L, 1L, "a", "p1")).toDF("k", "seq", "v", "p"))
    store.upsert(Seq((9L, 1L, "z", "p9")).toDF("k", "seq", "v", "p"), cfg)
    assert(canon(store.read.get.select("k", "v")) == Seq(Seq("1", "a"), Seq("9", "z")))
  }

  test("rollback commits old pointers as a new version; vacuum keeps re-referenced segments") {
    val (store, _) = fresh()
    store.snapshot(Seq((1L, 1L, "good", "p1")).toDF("k", "seq", "v", "p")) // v1
    store.upsert(Seq((1L, 2L, "BAD", "p1")).toDF("k", "seq", "v", "p"), cfg) // v2
    assert(canon(store.read.get.select("v")) == Seq(Seq("BAD")))
    val v3 = store.rollbackTo(1)
    assert(v3 == 3 && store.manifestVersions == Seq(1, 2, 3))
    assert(canon(store.read.get.select("v")) == Seq(Seq("good")))
    // vacuum to the rolled-back head only: v1's segment is re-referenced
    // by v3 and must survive; the bad segment is swept
    store.vacuum(keepManifests = 1)
    assert(canon(store.read.get.select("v")) == Seq(Seq("good")))
    intercept[IllegalArgumentException](store.rollbackTo(99))
  }

  test("readAt: every retained version reads byte-identically; vacuumed versions refuse") {
    val (store, _) = fresh()
    store.snapshot(Seq((1L, 1L, "v1", "p1")).toDF("k", "seq", "v", "p")) // v1
    store.upsert(Seq((1L, 2L, "v2", "p1")).toDF("k", "seq", "v", "p"), cfg) // v2
    store.upsert(Seq((2L, 1L, "new", "p2")).toDF("k", "seq", "v", "p"), cfg) // v3
    assert(canon(store.readAt(1).get.select("k", "v")) == Seq(Seq("1", "v1")))
    assert(canon(store.readAt(2).get.select("k", "v")) == Seq(Seq("1", "v2")))
    assert(canon(store.readAt(3).get.select("k", "v")) ==
      Seq(Seq("1", "v2"), Seq("2", "new")))
    // head read and readAt(latest) agree
    assert(canon(store.read.get) == canon(store.readAt(3).get))
    store.vacuum(keepManifests = 1)
    intercept[IllegalArgumentException](store.readAt(1))
    assert(canon(store.readAt(3).get.select("k", "v")) ==
      Seq(Seq("1", "v2"), Seq("2", "new")))
  }

  test("schema evolution: a column added later reads as NULL from old segments") {
    val (store, _) = fresh()
    store.snapshot(Seq((1L, 1L, "a", "p1")).toDF("k", "seq", "v", "p"))
    // new batch carries an extra column; old segment lacks it
    store.upsert(
      Seq((2L, 1L, "b", "p2", "extra")).toDF("k", "seq", "v", "p", "tag"), cfg)
    val got = store.read.get
    assert(got.columns.contains("tag"))
    assert(canon(got.select("k", "tag")) == Seq(Seq("1", "null"), Seq("2", "extra")))
  }

  test("write-audit-publish: a failed audit leaves the table untouched and unreadable-by-anyone") {
    import graft.validate.{CheckResult, Checks}
    val (store, root) = fresh()
    store.snapshot(Seq((1L, 1L, "a", "p1")).toDF("k", "seq", "v", "p")) // v1
    // audit rejects NULL v — the poisoned batch must never publish
    def audit(df: org.apache.spark.sql.DataFrame): Seq[CheckResult] =
      Seq(Checks.notNull(df, Seq("v")), Checks.unique(df, Seq("k")))
    val bad = Seq((2L, 1L, Option.empty[String], "p1")).toDF("k", "seq", "v", "p")
    val res = store.upsertAudited(bad, cfg, audit)
    assert(res.isLeft && res.left.toOption.get.exists(!_.passed))
    assert(store.manifestVersions == Seq(1), "no manifest committed")
    assert(canon(store.read.get.select("k", "v")) == Seq(Seq("1", "a")))
    // staged segment was deleted — only v1's segment remains on disk
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val segs = fs.listStatus(new org.apache.hadoop.fs.Path(root)).toSeq
      .count(_.getPath.getName.startsWith("seg_"))
    assert(segs == 1, s"staged segment must be cleaned, found $segs")
    // a clean batch publishes normally through the same gate
    val good = Seq((2L, 1L, Option("b"), "p1")).toDF("k", "seq", "v", "p")
    assert(store.upsertAudited(good, cfg, audit).isRight)
    assert(canon(store.read.get.select("k", "v")) ==
      Seq(Seq("1", "a"), Seq("2", "b")))
  }

  test("version diff: insert/update/delete between commits, O(changed partitions)") {
    val (store, _) = fresh()
    store.snapshot(Seq(
      (1L, 1L, "a", "p1"), (2L, 1L, "b", "p2"), (3L, 1L, "c", "p3")
    ).toDF("k", "seq", "v", "p"))                      // version 1
    store.upsert(Seq(
      (1L, 2L, "a2", "p1"), (4L, 1L, "d", "p1")
    ).toDF("k", "seq", "v", "p"), cfg)                 // version 2: p1 only
    // only p1's pointer moved — p2/p3 provably untouched, never read
    assert(store.changedValues(1, 2) == Seq("p1"))
    val d12 = store.changes(1, 2, Seq("k"))
    assert(canon(d12.select("k", "v", "_change")) == Seq(
      Seq("1", "a2", "update"), Seq("4", "d", "insert")))
    // drop p2 entirely → version 3: one delete, pre-image carried
    store.replacePartitions(Seq.empty[(Long, Long, String, String)]
      .toDF("k", "seq", "v", "p"), clear = Seq("p2"))
    val d23 = store.changes(2, 3, Seq("k"))
    assert(canon(d23.select("k", "v", "_change")) == Seq(Seq("2", "b", "delete")))
    // same version → empty diff; re-upserting identical rows → empty diff
    assert(store.changes(2, 2, Seq("k")).count() == 0)
    store.upsert(Seq((1L, 2L, "a2", "p1")).toDF("k", "seq", "v", "p"), cfg) // v4, no-op rows
    assert(store.changes(3, 4, Seq("k")).count() == 0)
  }

  test("clustered segments carry O(batch) zone maps; readPruned skips files, never rows") {
    val root = Files.createTempDirectory("manifest-zm").toString + "/t"
    val store = new ManifestStore(spark, root, "p",
      clusterCols = Seq("x"), statsCols = Seq("x"), clusterFiles = 4)
    // two partitions × x in [0, 1000): range clustering puts tight x
    // ranges in each of the 4 pinned files per segment
    val base = spark.range(1000).selectExpr(
      "id AS k", "1L AS seq", "CAST(id AS STRING) AS v",
      "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS p", "id AS x")
    store.snapshot(base)
    // second segment from an upsert batch (gets its OWN stats)
    store.upsert(spark.range(1000, 1100).selectExpr(
      "id AS k", "2L AS seq", "'new' AS v", "'a' AS p", "id AS x"), cfg)
    val (df, stats) = store.readPruned(
      Seq(graft.pipeline.Layout.RangePred("x", Some(100L), Some(200L)))).get
    assert(stats.selectedFiles < stats.totalFiles,
      s"clustered segments must skip files for an x range: $stats")
    // answers equal the unpruned read under the same residual
    assertSameRows(
      df.select("k", "v", "x").orderBy("k"),
      store.read.get.filter(col("x").between(100L, 200L))
        .select("k", "v", "x").orderBy("k"))
    // both segments have their own stats dir (O(batch) maintenance)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val segs = fs.listStatus(new org.apache.hadoop.fs.Path(root)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("seg_"))
    assert(segs.nonEmpty && segs.forall(s => fs.exists(
      new org.apache.hadoop.fs.Path(s.getPath, graft.pipeline.Layout.ZoneMapDir))))
  }

  test("readPruned falls back to whole-segment reads where stats are absent") {
    val root = Files.createTempDirectory("manifest-nozm").toString + "/t"
    // segment 1 written WITHOUT stats (feature off), then the store is
    // reopened with stats on and a second segment merged in
    val plain = new ManifestStore(spark, root, "p")
    plain.snapshot(Seq((1L, 1L, "a", "p1", 10L)).toDF("k", "seq", "v", "p", "x"))
    val statted = new ManifestStore(spark, root, "p",
      clusterCols = Seq("x"), statsCols = Seq("x"))
    statted.upsert(Seq((2L, 1L, "b", "p2", 20L)).toDF("k", "seq", "v", "p", "x"), cfg)
    val (df, stats) = statted.readPruned(
      Seq(graft.pipeline.Layout.RangePred("x", Some(0L), Some(100L)))).get
    assert(stats.totalFiles >= 2 && stats.selectedFiles >= 1)
    assert(canon(df.select("k", "v")) == Seq(Seq("1", "a"), Seq("2", "b")))
  }
}
