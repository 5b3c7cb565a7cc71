package graft.merge

import graft.SparkSpec
import graft.schema.{MergeGuard, TableConfig}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spec for the M1–M4 merge algebra (SURVEY.md §2.6), including the
  * idempotent-replay property the reference's backdate DAGs rely on.
  */
class MergeEngineSpec extends SparkSpec {
  import spark.implicits._

  private def cfg(guard: MergeGuard = MergeGuard.None,
                  keys: Seq[String] = Seq("k"),
                  nullSafe: Boolean = false) =
    TableConfig("t.t", null, keys, cursorField = Some("ts"),
      guard = guard, nullSafeKeys = nullSafe)

  private def df(rows: (String, Long, String)*): DataFrame =
    rows.toSeq.toDF("k", "ts", "v")

  test("M2 unguarded upsert: insert + update + passthrough") {
    val target = df(("a", 1L, "old-a"), ("b", 1L, "old-b"))
    val source = df(("b", 2L, "new-b"), ("c", 1L, "new-c"))
    val out = MergeEngine.upsert(target, source, cfg())
    assertSameRows(out, df(("a", 1L, "old-a"), ("b", 2L, "new-b"), ("c", 1L, "new-c")))
  }

  test("M1 TargetOlder guard: stale source row does not clobber newer target") {
    val target = df(("a", 5L, "target-newer"), ("b", 1L, "target-older"))
    val source = df(("a", 3L, "stale"), ("b", 2L, "fresh"))
    val out = MergeEngine.upsert(target, source, cfg(MergeGuard.TargetOlder("ts")))
    assertSameRows(out, df(("a", 5L, "target-newer"), ("b", 2L, "fresh")))
  }

  test("M1 TargetOlder guard: equal cursor does NOT update (strict <)") {
    val target = df(("a", 5L, "target"))
    val source = df(("a", 5L, "source"))
    val out = MergeEngine.upsert(target, source, cfg(MergeGuard.TargetOlder("ts")))
    assertSameRows(out, df(("a", 5L, "target")))
  }

  test("M1 SourceNotOlder guard: ties win (>=)") {
    val target = df(("a", 5L, "target"))
    val source = df(("a", 5L, "source"))
    val out = MergeEngine.upsert(target, source, cfg(MergeGuard.SourceNotOlder("ts")))
    assertSameRows(out, df(("a", 5L, "source")))
  }

  test("M1 guard with NULL cursor: no update (SQL comparison semantics)") {
    val target = Seq(("a", Option(5L), "target")).toDF("k", "ts", "v")
    val source = Seq(("a", Option.empty[Long], "source")).toDF("k", "ts", "v")
    val out = MergeEngine.upsert(target, source, cfg(MergeGuard.TargetOlder("ts")))
    assertSameRows(out, target)
  }

  test("null-safe composite keys: NULL key components match each other") {
    val target = Seq((Some("x"), Option.empty[String], 1L, "old"))
      .toDF("k1", "k2", "ts", "v")
    val source = Seq((Some("x"), Option.empty[String], 2L, "new"),
                     (Option.empty[String], Some("y"), 1L, "ins"))
      .toDF("k1", "k2", "ts", "v")
    val c = cfg(keys = Seq("k1", "k2"), nullSafe = true)
    val out = MergeEngine.upsert(target, source, c)
    assertSameRows(out, Seq(
      (Some("x"), Option.empty[String], 2L, "new"),
      (Option.empty[String], Some("y"), 1L, "ins")).toDF("k1", "k2", "ts", "v"))
    // without null-safe keys the NULL-keyed target row can never match:
    // the source row INSERTs alongside it
    val out2 = MergeEngine.upsert(target, source, cfg(keys = Seq("k1", "k2")))
    assert(out2.count() == 3)
  }

  test("duplicate source keys resolve latest-wins by cursor before merge") {
    val target = df(("a", 0L, "old"))
    val source = df(("a", 1L, "mid"), ("a", 3L, "latest"), ("a", 2L, "later"))
    val out = MergeEngine.upsert(target, source, cfg())
    assertSameRows(out, df(("a", 3L, "latest")))
  }

  test("latestPerKey is deterministic under cursor ties (content tiebreak)") {
    val src = df(("a", 1L, "zzz"), ("a", 1L, "aaa"), ("b", 1L, "only"))
    val picks = (1 to 3).map { _ =>
      canon(MergeEngine.latestPerKey(src, Seq("k"), Seq(col("ts").desc)))
    }
    assert(picks.distinct.size == 1)
    // no-order variant (W2 dropDuplicates shape) is also deterministic
    val picks2 = (1 to 3).map { _ =>
      canon(MergeEngine.latestPerKey(src, Seq("k"), Nil))
    }
    assert(picks2.distinct.size == 1)
  }

  test("replay idempotence: upsert(upsert(t,s),s) == upsert(t,s) per guard") {
    val target = df(("a", 5L, "ta"), ("b", 1L, "tb"))
    val source = df(("b", 2L, "sb"), ("c", 1L, "sc"), ("c", 4L, "sc2"))
    for (g <- Seq(MergeGuard.None, MergeGuard.TargetOlder("ts"),
                  MergeGuard.SourceNotOlder("ts"))) {
      val once = MergeEngine.upsert(target, source, cfg(g))
      val twice = MergeEngine.upsert(once, source, cfg(g))
      assertSameRows(twice, once)
      // and a third round, through the same lineage again
      assertSameRows(MergeEngine.upsert(twice, source, cfg(g)), once)
    }
  }

  test("M4 partitionOverwrite: replaces only the [lo,hi) window, keeps NULLs") {
    val target = Seq((Some(1), "t1"), (Some(2), "t2"), (Some(3), "t3"),
                     (Option.empty[Int], "tn")).toDF("p", "v")
    val source = Seq((Some(2), "s2"), (Some(9), "out-of-window")).toDF("p", "v")
    val out = MergeEngine.partitionOverwrite(target, source, "p", lit(2), lit(3))
    assertSameRows(out, Seq((Some(1), "t1"), (Some(2), "s2"), (Some(3), "t3"),
                            (Option.empty[Int], "tn")).toDF("p", "v"))
  }

  test("M4 dynamic overwrite: replaces present partitions incl. NULL partition") {
    val target = Seq((Some(1), "t1"), (Some(2), "t2"),
                     (Option.empty[Int], "tn")).toDF("p", "v")
    val source = Seq((Some(2), "s2"), (Option.empty[Int], "sn")).toDF("p", "v")
    val out = MergeEngine.dynamicPartitionOverwrite(target, source, "p")
    assertSameRows(out, Seq((Some(1), "t1"), (Some(2), "s2"),
                            (Option.empty[Int], "sn")).toDF("p", "v"))
  }

  test("upsertEvolving: new source columns appear, old target columns survive") {
    val target = Seq(("a", 1L, "legacy")).toDF("k", "ts", "old_col")
    val source = Seq(("a", 2L, "fresh"), ("b", 1L, "new"))
      .toDF("k", "ts", "new_col")
    val out = MergeEngine.upsertEvolving(target, source, cfg())
    assert(out.columns.toSeq == Seq("k", "ts", "old_col", "new_col"))
    assert(canon(out) == Seq(
      // updated row: target-only col SURVIVES the update (UPDATE sets only
      // source columns — standard MERGE evolution), new col set from source
      Seq("a", "2", "legacy", "fresh"),
      Seq("b", "1", "null", "new")      // inserted row: no target-side value
    ).sortBy(_.mkString("|")))
    // target-only rows keep their legacy values
    val out2 = MergeEngine.upsertEvolving(target,
      Seq(("b", 1L, "new")).toDF("k", "ts", "new_col"), cfg())
    assert(canon(out2) == Seq(
      Seq("a", "1", "legacy", "null"), Seq("b", "1", "null", "new")
    ).sortBy(_.mkString("|")))
    // type conflict: source value try_casts into the target's type
    val t3 = Seq(("a", 1L, 10L)).toDF("k", "ts", "v")
    val s3 = Seq(("a", 2L, "77"), ("b", 1L, "junk")).toDF("k", "ts", "v")
    val out3 = MergeEngine.upsertEvolving(t3, s3, cfg())
    assert(out3.schema("v").dataType == org.apache.spark.sql.types.LongType)
    assert(canon(out3.select("k", "v")) == Seq(Seq("a", "77"), Seq("b", "null")).sortBy(_.mkString("|")))
  }

  test("scd2Merge: incremental history equals one-shot; replays no-op; stale rows rejected") {
    // per-key event feed: k=a changes 3 times, k=b once
    val all = Seq(
      ("a", 1L, "v1"), ("a", 5L, "v2"), ("a", 9L, "v3"), ("b", 3L, "x1")
    ).toDF("k", "ts", "v")
    val oneShot = MergeEngine.scd2Merge(None, all, Seq("k"), "ts")
    // spans: a:[1,5)[5,9)[9,∞) b:[3,∞)
    assert(canon(oneShot.select("k", "v", "valid_from", "valid_to", "is_current")) == Seq(
      Seq("a", "v1", "1", "5", "false"),
      Seq("a", "v2", "5", "9", "false"),
      Seq("a", "v3", "9", "null", "true"),
      Seq("b", "x1", "3", "null", "true")).sortBy(_.mkString("|")))

    // two-run build (split mid-history) equals the one-shot recompute
    val h1 = MergeEngine.scd2Merge(None, all.filter(col("ts") < 6), Seq("k"), "ts")
    val h2 = MergeEngine.scd2Merge(Some(h1), all, Seq("k"), "ts")
    assertSameRows(h2, oneShot)

    // replaying the full feed against the final history is a no-op
    assertSameRows(MergeEngine.scd2Merge(Some(h2), all, Seq("k"), "ts"), h2)

    // a stale out-of-order row (before the open version) is rejected,
    // never interleaved into closed spans
    val stale = Seq(("a", 7L, "late")).toDF("k", "ts", "v")
    assertSameRows(MergeEngine.scd2Merge(Some(h2), stale, Seq("k"), "ts"), h2)

    // same-cursor duplicate rows pick a deterministic winner via tieBreak
    val dup = Seq(("c", 1L, "lo", 1L), ("c", 1L, "hi", 9L)).toDF("k", "ts", "v", "seq")
    val win = MergeEngine.scd2Merge(None, dup, Seq("k"), "ts", Seq(col("seq").desc))
    assert(canon(win.select("k", "v")) == Seq(Seq("c", "hi")))
  }

  test("scd2CheckMerge: change detection opens versions; no-change and replays no-op") {
    val t1 = lit(100L); val t2 = lit(200L); val t3 = lit(300L)
    // run 1: two keys
    val h1 = MergeEngine.scd2CheckMerge(None,
      Seq(("a", "v1"), ("b", "x1")).toDF("k", "v"), Seq("k"), Seq("v"), t1)
    assert(canon(h1.select("k", "v", "valid_from", "valid_to", "is_current")) == Seq(
      Seq("a", "v1", "100", "null", "true"),
      Seq("b", "x1", "100", "null", "true")).sortBy(_.mkString("|")))
    // run 2: a changed, b unchanged, c new
    val h2 = MergeEngine.scd2CheckMerge(Some(h1),
      Seq(("a", "v2"), ("b", "x1"), ("c", "y1")).toDF("k", "v"), Seq("k"), Seq("v"), t2)
    assert(canon(h2.select("k", "v", "valid_from", "valid_to", "is_current")) == Seq(
      Seq("a", "v1", "100", "200", "false"),
      Seq("a", "v2", "200", "null", "true"),
      Seq("b", "x1", "100", "null", "true"),
      Seq("c", "y1", "200", "null", "true")).sortBy(_.mkString("|")))
    // replaying run 2's batch at a later asOf is a strict no-op
    assertSameRows(MergeEngine.scd2CheckMerge(Some(h2),
      Seq(("a", "v2"), ("b", "x1"), ("c", "y1")).toDF("k", "v"), Seq("k"), Seq("v"), t3), h2)
    // a key absent from the batch keeps its open row (no implicit delete)
    val h3 = MergeEngine.scd2CheckMerge(Some(h2),
      Seq(("a", "v3")).toDF("k", "v"), Seq("k"), Seq("v"), t3)
    assert(canon(h3.filter(col("k") === "b").select("v", "is_current")) ==
      Seq(Seq("x1", "true")))
    // NULL-safe change detection: NULL -> value opens a version once
    val n1 = MergeEngine.scd2CheckMerge(None,
      Seq(("d", null.asInstanceOf[String])).toDF("k", "v"), Seq("k"), Seq("v"), t1)
    val n2 = MergeEngine.scd2CheckMerge(Some(n1),
      Seq(("d", "now-set")).toDF("k", "v"), Seq("k"), Seq("v"), t2)
    assert(n2.filter(col("is_current")).select("v").as[String].collect().toSeq == Seq("now-set"))
    assert(n2.count() == 2)
  }

  test("M4 partitionOverwrite replay is idempotent") {
    val target = Seq((1, "t1"), (2, "t2")).toDF("p", "v")
    val source = Seq((2, "s2")).toDF("p", "v")
    val once = MergeEngine.partitionOverwrite(target, source, "p", lit(2), lit(3))
    val twice = MergeEngine.partitionOverwrite(once, source, "p", lit(2), lit(3))
    assertSameRows(twice, once)
  }
}
