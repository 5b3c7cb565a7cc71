package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Layout — Z-order clustering + zone-map file skipping.
  *
  * The load-bearing claims, each asserted here:
  *  1. zorderKey bit semantics (hand-checked interleavings, clamping,
  *     null propagation) and agreement with the generated SQL twin's
  *     formula evaluated by Spark itself;
  *  2. pruning NEVER changes answers (residual filter re-applied);
  *  3. a linear layout prunes the leading column but NOT the second;
  *  4. a z-order layout prunes BOTH columns, and strictly more files
  *     than the linear layout for a second-column predicate — the
  *     multi-column-skipping claim, measured, not asserted from theory;
  *  5. all-null files are skipped, missing stats keep the file.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorderKey interleaves bits, clamps range, propagates nulls") {
    val df = Seq(
      (0L, 0L),   // -> 0
      (1L, 0L),   // bit0 of col0 -> position 0 -> 1
      (0L, 1L),   // bit0 of col1 -> position 1 -> 2
      (3L, 0L),   // bits 0,2 -> 5
      (0L, 3L),   // bits 1,3 -> 10
      (3L, 3L),   // -> 15
      (-5L, 0L),  // clamps to 0 -> 0
      (99L, 99L)  // clamps to 7 (bits=3) -> 63
    ).toDF("x", "y")
    val got = df.select(Layout.zorderKey(Seq(col("x"), col("y")), 3).as("z"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 1L, 2L, 5L, 10L, 15L, 0L, 63L))

    val withNull = Seq((Some(1L), None: Option[Long])).toDF("x", "y")
      .select(Layout.zorderKey(Seq(col("x"), col("y")), 3).as("z"))
    assert(withNull.collect().head.isNullAt(0))
  }

  test("zorderKeySql is the same formula (Spark evaluates both identically)") {
    val df = spark.range(200).select(
      (col("id") * 7 % 32).as("a"), (col("id") * 13 % 32).as("b"))
    val viaSql = df.selectExpr(
      "a", "b", s"(${Layout.zorderKeySql(Seq("a", "b"), 5)}) as z")
    val viaCol = df.select(col("a"), col("b"),
      Layout.zorderKey(Seq(col("a"), col("b")), 5).as("z"))
    assertSameRows(viaSql, viaCol)
  }

  private def grid(): org.apache.spark.sql.DataFrame =
    spark.range(4096).select(
      (col("id") % 64).as("a"),
      (col("id") / 64).cast("long").as("b"),
      col("id").as("v"))

  test("linear layout prunes the lead column; z-order prunes both and beats it") {
    val linDir = Files.createTempDirectory("layout-lin").toString + "/t"
    val zDir = Files.createTempDirectory("layout-z").toString + "/t"
    val df = grid()
    Layout.writeClustered(df, linDir, Seq("a"), files = 16, statsCols = Seq("a", "b"))
    Layout.writeZOrdered(df, zDir, Seq("a", "b"), bits = 6, files = 16,
      statsCols = Seq("a", "b"))

    val predA = Seq(Layout.RangePred("a", Some(8L), Some(15L)))
    val predB = Seq(Layout.RangePred("b", Some(8L), Some(15L)))
    val predAB = predA ++ predB

    // lead-column predicate: the linear layout skips most files
    val (linA, sLinA) = Layout.prunedRead(spark, linDir, predA)
    assert(sLinA.selectedFiles < sLinA.totalFiles,
      s"linear layout should prune on its sort column: $sLinA")
    // second-column predicate: the linear layout cannot prune at all
    val (_, sLinB) = Layout.prunedRead(spark, linDir, predB)
    assert(sLinB.selectedFiles == sLinB.totalFiles,
      s"every file spans all of b in a linear-by-a layout: $sLinB")
    // z-order prunes on EITHER column...
    val (_, sZA) = Layout.prunedRead(spark, zDir, predA)
    val (zB, sZB) = Layout.prunedRead(spark, zDir, predB)
    assert(sZA.selectedFiles < sZA.totalFiles, s"z-order must prune on a: $sZA")
    assert(sZB.selectedFiles < sZB.totalFiles, s"z-order must prune on b: $sZB")
    // ...and strictly beats linear for the second column
    assert(sZB.selectedFiles < sLinB.selectedFiles,
      s"z-order should beat linear on the non-lead column: $sZB vs $sLinB")
    // conjunctive predicate: the hyper-rectangle case
    val (zAB, sZAB) = Layout.prunedRead(spark, zDir, predAB)
    assert(sZAB.selectedFiles <= sZB.selectedFiles)

    // pruning never changes answers, under every layout and predicate
    def expect(p: Seq[Layout.RangePred]) =
      p.map(_.residual).reduce(_ && _)
    assertSameRows(linA.orderBy("v"), df.filter(expect(predA)).orderBy("v"))
    assertSameRows(zB.orderBy("v"), df.filter(expect(predB)).orderBy("v"))
    assertSameRows(zAB.orderBy("v"), df.filter(expect(predAB)).orderBy("v"))
  }

  test("all-null files are skipped; empty survivor set returns an empty typed frame") {
    val dir = Files.createTempDirectory("layout-null").toString + "/t"
    // two files, written explicitly: one with values, one all-null in a
    Seq((Some(1L), "x"), (Some(2L), "x")).toDF("a", "s")
      .coalesce(1).write.parquet(dir)
    Seq((None: Option[Long], "y"), (None: Option[Long], "y")).toDF("a", "s")
      .coalesce(1).write.mode("append").parquet(dir)
    Layout.buildZoneMaps(spark, dir, Seq("a"))
    val (got, stats) = Layout.prunedRead(spark, dir,
      Seq(Layout.RangePred("a", Some(0L), Some(10L))))
    assert(stats.totalFiles == 2 && stats.selectedFiles == 1,
      s"the all-null file must be skipped: $stats")
    assert(got.count() == 2)
    // a range no file can satisfy: zero files read, schema intact
    val (none, statsNone) = Layout.prunedRead(spark, dir,
      Seq(Layout.RangePred("a", Some(100L), Some(200L))))
    assert(statsNone.selectedFiles == 0)
    assert(none.columns.toSeq == Seq("a", "s") && none.count() == 0)
  }

  test("missing stats column keeps the file (conservative), residual still filters") {
    val dir = Files.createTempDirectory("layout-miss").toString + "/t"
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("a", "b")
    df.repartitionByRange(3, col("a")).write.parquet(dir)
    Layout.buildZoneMaps(spark, dir, Seq("a")) // no stats for b
    val (got, stats) = Layout.prunedRead(spark, dir,
      Seq(Layout.RangePred("b", Some(15L), Some(25L))))
    assert(stats.selectedFiles == stats.totalFiles, "no b stats -> keep all")
    assert(canon(got) == Seq(Seq("2", "20")))
  }

  test("bloom filters skip files for point lookups the sort order cannot cluster") {
    val dir = Files.createTempDirectory("layout-bloom").toString + "/t"
    // cluster on a, bloom on the UNclustered v (v = id, scattered by a)
    val df = spark.range(4096).select(
      (col("id") % 64).as("a"), ((col("id") * 2654435761L) % 100000L).as("v"))
    Layout.writeClustered(df, dir, Seq("a"), files = 16,
      statsCols = Seq("a"), bloomCols = Seq("v"))
    val target = df.filter(col("id") === 777).select("v").head().getLong(0)
    // zone maps alone cannot prune v (no stats); bloom must
    val (got, stats) = Layout.prunedRead(spark, dir,
      Seq(Layout.EqPred("v", target)))
    assert(stats.selectedFiles < stats.totalFiles,
      s"bloom should skip files for a point lookup: $stats")
    assert(got.count() >= 1)
    assertSameRows(got.orderBy("a"), df.filter(col("v") === target)
      .select("a", "v").orderBy("a"))
    // an absent value prunes everything (no false-positive in 16 tries
    // would be luck — accept <= total, but the residual must be empty)
    val (none, _) = Layout.prunedRead(spark, dir,
      Seq(Layout.EqPred("v", -12345L)))
    assert(none.count() == 0)
  }

  test("survivor selection runs distributed: only surviving names reach the driver") {
    // 10^4 synthetic stats rows — the small-files-at-100TB shape — of
    // which exactly one admits the predicate. The driver must see ONE
    // file name, not 10^4 bitmap-bearing rows; we prove it by pointing
    // every non-survivor at a file that DOES NOT EXIST — had prunedRead
    // collected-then-filtered it would still work, but had it tried to
    // read any non-survivor the parquet read would throw.
    val dir = Files.createTempDirectory("layout-dist").toString + "/t"
    Seq((1L, "keep"), (2L, "keep")).toDF("a", "s").coalesce(1).write.parquet(dir)
    Layout.buildZoneMaps(spark, dir, Seq("a"))
    val zmDir = s"$dir/${Layout.ZoneMapDir}"
    val real = spark.read.parquet(zmDir)
    // synthetic rows: disjoint ranges [100+i, 100+i], ghost file names
    val fakes = spark.range(9999).select(
      concat(lit("file:///layout-dist-ghost-"), col("id")).as("file"),
      lit(1L).as("rows"),
      (col("id") + 100L).as("min_a"), (col("id") + 100L).as("max_a"),
      lit(0L).as("nulls_a"))
    real.unionByName(fakes).coalesce(2).write.mode("overwrite").parquet(s"$dir/_zm_tmp")
    spark.read.parquet(s"$dir/_zm_tmp").write.mode("overwrite").parquet(zmDir)
    val (got, stats) = Layout.prunedRead(spark, dir,
      Seq(Layout.RangePred("a", Some(0L), Some(10L))))
    assert(stats.totalFiles == 10000 && stats.selectedFiles == 1, s"$stats")
    assert(got.count() == 2)
  }

  test("timestamp bounds prune and compare correctly") {
    val dir = Files.createTempDirectory("layout-ts").toString + "/t"
    val df = spark.range(100).select(
      col("id").as("v"),
      expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id*3600)")
        .as("t"))
    Layout.writeClustered(df, dir, Seq("t"), files = 8, statsCols = Seq("t"))
    val lo = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    val hi = java.sql.Timestamp.valueOf("2024-01-02 23:00:00")
    val (got, stats) = Layout.prunedRead(spark, dir,
      Seq(Layout.RangePred("t", Some(lo), Some(hi))))
    assert(stats.selectedFiles < stats.totalFiles, s"timestamps must prune: $stats")
    assert(got.count() == 24)
  }
}
