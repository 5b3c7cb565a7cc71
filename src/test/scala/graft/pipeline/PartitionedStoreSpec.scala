package graft.pipeline

import graft.SparkSpec
import graft.schema.{MergeGuard, TableConfig}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Partition-scoped merges: correctness + the untouched-partition
  * guarantee (unaffected files never rewritten). */
class PartitionedStoreSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = TableConfig("ods.fact", null, Seq("k"),
    cursorField = Some("ts"), guard = MergeGuard.TargetOlder("ts"))

  test("upsert touches only affected partitions; untouched files unchanged") {
    val root = Files.createTempDirectory("pstore").toString + "/t"
    val store = new PartitionedStore(spark, root, "day")
    store.snapshot(Seq(
      ("a", 1L, "2024-01-01", "a1"), ("b", 1L, "2024-01-01", "b1"),
      ("c", 1L, "2024-01-02", "c1"),
      ("d", 1L, "2024-01-03", "d1")).toDF("k", "ts", "day", "v"))

    // snapshot of a partition dir's file listing + mtimes
    def listing(day: String): Seq[(String, Long)] = {
      val s = Files.list(Paths.get(root, s"day=$day"))
      try {
        val it = s.iterator()
        val b = Seq.newBuilder[(String, Long)]
        while (it.hasNext) { val p = it.next(); b += ((p.getFileName.toString, Files.getLastModifiedTime(p).toMillis)) }
        b.result().sortBy(_._1)
      } finally s.close()
    }
    val before = listing("2024-01-03")

    // batch touches day 01 (newer 'a', stale 'b') and day 02 (new 'e')
    val affected = store.upsert(Seq(
      ("a", 2L, "2024-01-01", "a2"), ("b", 0L, "2024-01-01", "b0"),
      ("e", 1L, "2024-01-02", "e1")).toDF("k", "ts", "day", "v"), cfg)
    assert(affected.toSet == Set("2024-01-01", "2024-01-02"))

    val state = store.read.get.select("k", "v")
    assert(canon(state) == Seq(
      Seq("a", "a2"), Seq("b", "b1"), Seq("c", "c1"), Seq("d", "d1"), Seq("e", "e1")
    ).sortBy(_.mkString("|")))

    // the untouched partition's files were not rewritten
    assert(listing("2024-01-03") == before)
  }

  test("first write dedups duplicate source keys like every later merge") {
    val root = Files.createTempDirectory("pstore-first").toString + "/t"
    val store = new PartitionedStore(spark, root, "day")
    // duplicate key 'a' in the very first batch: latest-per-key must win,
    // or the duplicate would fan out every subsequent full-outer merge
    store.upsert(Seq(
      ("a", 1L, "2024-01-01", "stale"), ("a", 2L, "2024-01-01", "fresh"),
      ("b", 1L, "2024-01-01", "b1")).toDF("k", "ts", "day", "v"), cfg)
    assert(canon(store.read.get.select("k", "v")) ==
      Seq(Seq("a", "fresh"), Seq("b", "b1")).sortBy(_.mkString("|")))
    // and the deduped state merges cleanly (no fan-out)
    store.upsert(Seq(("a", 3L, "2024-01-01", "a3")).toDF("k", "ts", "day", "v"), cfg)
    assert(canon(store.read.get.select("k", "v")) ==
      Seq(Seq("a", "a3"), Seq("b", "b1")).sortBy(_.mkString("|")))
  }

  test("partition values needing percent-escaping survive the swap") {
    // Spark writes `hr=2024-01-01 10%3A00%3A00` on disk; the swap must use
    // the written names, not reconstruct them from raw values
    val root = Files.createTempDirectory("pstore-esc").toString + "/t"
    val store = new PartitionedStore(spark, root, "hr")
    store.snapshot(Seq(("a", 1L, "2024-01-01 10:00:00", "v1"),
                       ("b", 1L, "2024-01-01 11:00:00", "keep")).toDF("k", "ts", "hr", "v"))
    store.upsert(Seq(("a", 2L, "2024-01-01 10:00:00", "v2")).toDF("k", "ts", "hr", "v"), cfg)
    assert(canon(store.read.get.select("k", "v")) ==
      Seq(Seq("a", "v2"), Seq("b", "keep")).sortBy(_.mkString("|")))
  }

  test("upsert replay converges; overwritePartitions replaces only present days") {
    val root = Files.createTempDirectory("pstore2").toString + "/t"
    val store = new PartitionedStore(spark, root, "day")
    val init = Seq(("a", 1L, "2024-01-01", "a1"), ("c", 1L, "2024-01-02", "c1"))
      .toDF("k", "ts", "day", "v")
    store.snapshot(init)
    val batch = Seq(("a", 2L, "2024-01-01", "a2")).toDF("k", "ts", "day", "v")
    store.upsert(batch, cfg)
    store.upsert(batch, cfg) // replay
    assert(canon(store.read.get.select("k", "v")) == Seq(
      Seq("a", "a2"), Seq("c", "c1")).sortBy(_.mkString("|")))

    store.overwritePartitions(Seq(("z", 9L, "2024-01-02", "z9")).toDF("k", "ts", "day", "v"))
    assert(canon(store.read.get.select("k", "v")) == Seq(
      Seq("a", "a2"), Seq("z", "z9")).sortBy(_.mkString("|")))
  }

  test("8-batch merge cadence leaves no staging/swap litter; footprint bounded") {
    // the same footprint discipline the TableStore and ManifestStore
    // sinks got spec'd for: directories are overwritten in place (no
    // version growth), and the transient .staging_/.swap_ dirs of each
    // tick are gone by the time the merge returns — including a
    // planted orphan from a "crashed" writer, swept by the next merge
    val root = Files.createTempDirectory("pstore-hygiene").toString + "/t"
    val store = new PartitionedStore(spark, root, "day")
    for (i <- 1 to 8) {
      store.mergeBatch(Seq(
        ("a", i.toLong, "2024-01-01", s"a$i"),
        ("k" + i, 1L, "2024-01-02", s"v$i")).toDF("k", "ts", "day", "v"), cfg)
    }
    def dirs(prefix: String): Seq[String] = {
      val s = Files.list(Paths.get(root))
      try {
        val it = s.iterator(); val b = Seq.newBuilder[String]
        while (it.hasNext) { val n = it.next().getFileName.toString; if (n.startsWith(prefix)) b += n }
        b.result()
      } finally s.close()
    }
    assert(dirs(".staging_").isEmpty, "staging litter survived a clean merge")
    assert(dirs(".swap_").isEmpty, "swap backup survived a clean merge")
    // answers converged: latest 'a', all 8 k-rows
    assert(store.read.get.count() == 9)
    assert(canon(store.read.get.filter($"k" === "a").select("v")) == Seq(Seq("a8")))
    // footprint: exactly the two partition dirs — in-place overwrite
    // cannot grow versions the way an unvacuumed versioned store does
    val live = dirs("day=")
    assert(live.toSet == Set("day=2024-01-01", "day=2024-01-02"), live)
    // a parquet dir count that grows per tick would be the small-files
    // failure — the clustered write keeps it at one file per writer
    val filesDay1 = {
      val s = Files.list(Paths.get(root, "day=2024-01-01"))
      try { val it = s.iterator(); var n = 0
        while (it.hasNext) { if (it.next().getFileName.toString.endsWith(".parquet")) n += 1 }; n
      } finally s.close()
    }
    assert(filesDay1 <= 2, s"day=2024-01-01 holds $filesDay1 parquet files after 8 ticks")

    // orphaned staging from a kill-9'd writer: invisible to readers,
    // swept by the next merge's recovery pass
    Files.createDirectories(Paths.get(root, ".staging_deadbeef", "day=2024-01-01"))
    assert(store.read.get.count() == 9)
    store.mergeBatch(Seq(("a", 99L, "2024-01-01", "a99")).toDF("k", "ts", "day", "v"), cfg)
    assert(dirs(".staging_").isEmpty, "orphaned staging dir was not swept")
    assert(canon(store.read.get.filter($"k" === "a").select("v")) == Seq(Seq("a99")))
  }
}
