package graft.sources

import graft.SparkSpec
import graft.schema.{SchemaRegistry, TableConfig}
import java.nio.file.{Files, Paths}

/** S7 — banner/trailer skip + typed coercion + required-key filter over a
  * delimited file (the reference's Excel row-stream semantics). */
class TabularFileSpec extends SparkSpec {

  private lazy val path: String = {
    val f = Files.createTempDirectory("tab").resolve("data.csv")
    Files.writeString(f, Seq(
      "REPORT: deliveries",          // banner row 1
      "lading_code,qty,weight",      // banner row 2 (header text, skipped too)
      "L1,5,12.5",
      ",9,1.0",                      // missing required key → dropped
      "L3,not-a-number,3.25",        // malformed qty → NULL (kept)
      "L4,7,oops",                   // malformed weight → NULL (kept)
      "TOTAL,21,16.75"               // trailer → skipped
    ).mkString("\n"))
    f.toString
  }

  private val cfg = TableConfig("pns.delivery",
    SchemaRegistry.structOf("lading_code" -> "string", "qty" -> "Int64", "weight" -> "float64"),
    keys = Seq("lading_code"))

  test("banner+trailer skip, coercion, required-key filter") {
    val out = TabularFile.read(spark, path, cfg,
      headerRows = 2, trailerRows = 1, requiredKeys = Seq("lading_code"))
    assert(canon(out) == Seq(
      Seq("L1", "5", "12.5"), Seq("L3", "null", "3.25"), Seq("L4", "7", "null")
    ).sortBy(_.mkString("|")))
  }

  test("multi-file directory: banner and trailer trimmed PER FILE") {
    val dir = Files.createTempDirectory("tab-multi")
    Files.writeString(dir.resolve("f1.csv"), "BANNER1\nL1,5,1.0\nTOTAL,5,0")
    Files.writeString(dir.resolve("f2.csv"), "BANNER2\nL2,7,2.0\nTOTAL,7,0")
    val out = TabularFile.read(spark, dir.toString, cfg, headerRows = 1, trailerRows = 1)
    assert(canon(out) == Seq(
      Seq("L1", "5", "1.0"), Seq("L2", "7", "2.0")).sortBy(_.mkString("|")))
  }

  test("etl_date appended when requested") {
    val out = TabularFile.read(spark, path, cfg, headerRows = 2, trailerRows = 1,
      withEtlDate = true)
    assert(out.columns.contains("etl_date"))
    assert(out.filter(org.apache.spark.sql.functions.col("etl_date").isNull).count() == 0)
  }

  test("compressed files take the per-file indexed fallback and still trim correctly") {
    // gzip offsets aren't line-monotone guarantees; mixed dirs must split
    // between the offset path (plain) and the fallback (compressed)
    val dir = Files.createTempDirectory("tab-gz")
    Files.writeString(dir.resolve("plain.csv"), "BANNER\nP1,1,1.0\nTOTAL,0,0")
    val gz = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(dir.resolve("drop.csv.gz")))
    gz.write("BANNER\nG1,2,2.0\nTOTAL,0,0".getBytes("UTF-8")); gz.close()
    val out = TabularFile.read(spark, dir.toString, cfg, headerRows = 1, trailerRows = 1)
    assert(canon(out) == Seq(
      Seq("G1", "2", "2.0"), Seq("P1", "1", "1.0")).sortBy(_.mkString("|")))
  }

  test("job count does not grow with file count") {
    // the round-2 implementation launched 2 sequential jobs PER FILE
    // (count + zipWithIndex) before reading a byte — a thousand-drop
    // landing directory paid 2000 driver round-trips. The offset-threshold
    // design is a constant number of jobs for any file count.
    def mkDir(nFiles: Int): String = {
      val dir = Files.createTempDirectory(s"tab-jobs-$nFiles")
      (1 to nFiles).foreach { i =>
        Files.writeString(dir.resolve(f"f$i%03d.csv"),
          s"BANNER\nA$i,1,1.0\nB$i,2,2.0\nTOTAL,3,0")
      }
      dir.toString
    }
    class JobCounter extends org.apache.spark.scheduler.SparkListener {
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    def jobsFor(nFiles: Int): Int = {
      val c = new JobCounter
      spark.sparkContext.addSparkListener(c)
      try {
        assert(TabularFile.read(spark, mkDir(nFiles), cfg,
          headerRows = 1, trailerRows = 1).count() == 2L * nFiles)
        // listener bus is async — wait until the counter stabilizes
        var prev = -1; var cur = c.jobs.get(); var spins = 0
        while (cur != prev && spins < 50) {
          prev = cur; Thread.sleep(100); cur = c.jobs.get(); spins += 1
        }
        cur
      } finally spark.sparkContext.removeSparkListener(c)
    }
    val one = jobsFor(1)
    val many = jobsFor(12)
    assert(many == one, s"jobs grew with file count: $one -> $many")
  }

  test("readJsonl: clean rows parse, poison quarantines verbatim, schema is authoritative") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("jsonl").toString
    Seq(
      """{"k": 1, "name": "a", "v": 2.5}""",
      """{"k": 2, "name": "b", "v": 3.5, "extra_field": "ignored"}""", // additive producer
      """{"k": 3}""",                                                  // missing fields → NULL
      """{"name": "orphan"}""",                                        // NULL required key
      """{ broken json""",
      """not json at all""").toDS().write.text(s"$t/drop")
    val cfg = graft.schema.TableConfig("jsonl.t", StructType(Seq(
      StructField("k", LongType), StructField("name", StringType),
      StructField("v", DoubleType))), Seq("k"))
    val read = TabularFile.readJsonl(spark, s"$t/drop", cfg,
      requiredKeys = Seq("k"))
    assert(canon(read.good) == Seq(
      Seq("1", "a", "2.5"), Seq("2", "b", "3.5"), Seq("3", "null", "null")))
    val q = read.quarantine.collect().map(_.getString(0)).sorted
    assert(q.toSeq == Seq("not json at all", """{ broken json"""))
    read.release()
    // the frames stay usable after release: lineage-backed recompute
    // from the landing bytes, not a dead checkpoint block
    assert(read.good.count() == 3)
  }
}
