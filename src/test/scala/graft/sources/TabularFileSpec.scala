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
}
