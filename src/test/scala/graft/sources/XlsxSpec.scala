package graft.sources

import graft.SparkSpec
import graft.schema.{SchemaRegistry, TableConfig}
import java.nio.file.Files

/** S7 over the REAL .xlsx container: zip + sheet XML + shared strings,
  * parsed executor-side with JDK-only machinery. */
class XlsxSpec extends SparkSpec {

  private val cfg = TableConfig("pns.delivery",
    SchemaRegistry.structOf("lading_code" -> "string", "qty" -> "Int64", "weight" -> "float64"),
    keys = Seq("lading_code"))

  /** Assemble a minimal-but-honest workbook: content types + workbook +
    * sharedStrings + sheet1, like a real writer emits. `rawSharedXml`
    * overrides the plain <si><t> wrapping for rich/phonetic entries. */
  private def makeXlsx(sheetRowsXml: String, shared: Seq[String],
                       rawSharedXml: Option[String] = None): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    def entry(name: String, content: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(content.getBytes("UTF-8")); z.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    entry("xl/workbook.xml",
      """<?xml version="1.0"?><workbook><sheets><sheet name="Sheet1" sheetId="1"/></sheets></workbook>""")
    entry("xl/sharedStrings.xml",
      rawSharedXml.getOrElse(
        s"""<?xml version="1.0"?><sst count="${shared.size}" uniqueCount="${shared.size}">""" +
          shared.map(s => s"<si><t>$s</t></si>").mkString + "</sst>"))
    entry("xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0"?><worksheet><sheetData>$sheetRowsXml</sheetData></worksheet>""")
    z.close()
    bos.toByteArray
  }

  private val sheetXml =
    """<row r="1"><c r="A1" t="inlineStr"><is><t>REPORT: deliveries</t></is></c></row>""" +
    """<row r="2"><c r="A2" t="s"><v>0</v></c><c r="B2"><v>5</v></c><c r="C2"><v>12.5</v></c></row>""" +
    """<row r="3"><c r="A3" t="s"><v>1</v></c><c r="C3"><v>3.25</v></c></row>""" +
    """<row r="4"><c r="B4"><v>9</v></c></row>""" +
    """<row r="5"><c r="A5" t="inlineStr"><is><t>junk</t></is></c><c r="B5" t="inlineStr"><is><t>not-a-number</t></is></c><c r="C5"><v>1.5</v></c></row>""" +
    """<row r="6"><c r="A6" t="inlineStr"><is><t>TOTAL</t></is></c><c r="B6"><v>14</v></c></row>"""

  test("xlsx: banner/trailer trim, shared+inline strings, gaps, coercion, key filter") {
    val dir = Files.createTempDirectory("xlsx")
    Files.write(dir.resolve("drop1.xlsx"), makeXlsx(sheetXml, Seq("L1", "L3")))
    val out = Xlsx.read(spark, dir.toString, cfg,
      headerRows = 1, trailerRows = 1, requiredKeys = Seq("lading_code"))
    assert(canon(out) == Seq(
      Seq("L1", "5", "12.5"),          // shared strings + numbers
      Seq("L3", "null", "3.25"),       // missing B cell → NULL qty
      Seq("junk", "null", "1.5")       // malformed qty coerces to NULL
      // row 4 dropped (no required key); rows 1/6 trimmed
    ).sortBy(_.mkString("|")))
  }

  test("xlsx: multiple workbooks in a landing dir, trimmed per file") {
    val dir = Files.createTempDirectory("xlsx-multi")
    def wb(code: String, qty: Int): Array[Byte] = makeXlsx(
      s"""<row r="1"><c r="A1" t="inlineStr"><is><t>B</t></is></c></row>""" +
      s"""<row r="2"><c r="A2" t="inlineStr"><is><t>$code</t></is></c><c r="B2"><v>$qty</v></c><c r="C2"><v>1.0</v></c></row>""" +
      s"""<row r="3"><c r="A3" t="inlineStr"><is><t>TOTAL</t></is></c></row>""",
      Seq.empty)
    Files.write(dir.resolve("f1.xlsx"), wb("A1", 1))
    Files.write(dir.resolve("f2.xlsx"), wb("A2", 2))
    val out = Xlsx.read(spark, dir.toString, cfg, headerRows = 1, trailerRows = 1)
    assert(canon(out) == Seq(
      Seq("A1", "1", "1.0"), Seq("A2", "2", "1.0")).sortBy(_.mkString("|")))
  }

  test("xlsx: ref-less cells advance from the previous cell (ECMA-376), not element position") {
    // <c r="B1"> then a ref-less <c> → the second cell is column C;
    // position-based placement would overwrite B
    val sparse = """<row r="1"><c r="B1"><v>5</v></c><c><v>7</v></c></row>"""
    val rows = Xlsx.parseWorkbook(makeXlsx(sparse, Seq.empty), sheet = 1, width = 3)
    assert(rows.map(_.toSeq) == Seq(Seq(null, "5", "7")))
  }

  test("xlsx: phonetic rPh runs are excluded from shared and inline strings") {
    val bytes = makeXlsx(
      """<row r="1"><c r="A1" t="s"><v>0</v></c>""" +
      """<c r="B1" t="inlineStr"><is><r><t>plain</t></r><rPh sb="0" eb="2"><t>GUIDE</t></rPh></is></c>""" +
      // phonetic-ONLY inline cell: has <t> nodes but no visible text → null
      """<c r="C1" t="inlineStr"><is><rPh sb="0" eb="2"><t>KANA</t></rPh></is></c></row>""",
      shared = Seq.empty,
      rawSharedXml = Some(
        """<?xml version="1.0"?><sst><si><r><t>Tokyo</t></r><rPh sb="0" eb="2"><t>TOKYO-KANA</t></rPh></si></sst>"""))
    val rows = Xlsx.parseWorkbook(bytes, sheet = 1, width = 3)
    assert(rows.map(_.toSeq) == Seq(Seq("Tokyo", "plain", null)))
  }

  test("xlsx: a malformed cell ref nulls itself without relocating its neighbors") {
    // cell with unparseable ref is skipped; the FOLLOWING ref-less cell
    // must continue from the last valid position, not from column A
    val row = """<row r="1"><c r="B1"><v>1</v></c><c r="??"><v>9</v></c><c><v>2</v></c></row>"""
    val rows = Xlsx.parseWorkbook(makeXlsx(row, Seq.empty), sheet = 1, width = 4)
    assert(rows.map(_.toSeq) == Seq(Seq(null, "1", "2", null)))
  }

  test("xlsx: malformed shared-string index nulls the cell, not the job") {
    val bad = """<row r="1"><c r="A1" t="s"><v>junk</v></c>""" +
      """<c r="B1" t="s"><v>99</v></c><c r="C1"><v>7</v></c></row>"""
    val rows = Xlsx.parseWorkbook(makeXlsx(bad, Seq("only-entry")), sheet = 1, width = 3)
    // non-numeric index → null; out-of-range index → null; number survives
    assert(rows.map(_.toSeq) == Seq(Seq(null, null, "7")))
  }

  test("xlsx: booleans and rich-text runs decode; doctype payloads rejected") {
    val rich = """<row r="1"><c r="A1" t="inlineStr"><is><r><t>ab</t></r><r><t>cd</t></r></is></c>""" +
      """<c r="B1"><v>3</v></c><c r="C1" t="b"><v>1</v></c></row>"""
    val bytes = makeXlsx(rich, Seq.empty)
    val rows = Xlsx.parseWorkbook(bytes, sheet = 1, width = 3)
    assert(rows.map(_.toSeq) == Seq(Seq("abcd", "3", "true")))
    // XXE hardening: a DOCTYPE in sheet XML must fail loudly, not resolve
    val evil = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      z.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
      z.write(("""<?xml version="1.0"?><!DOCTYPE x [<!ENTITY e SYSTEM "file:///etc/passwd">]>""" +
        """<worksheet><sheetData><row><c t="inlineStr"><is><t>&e;</t></is></c></row></sheetData></worksheet>""").getBytes("UTF-8"))
      z.closeEntry(); z.close(); bos.toByteArray
    }
    intercept[Exception](Xlsx.parseWorkbook(evil, sheet = 1, width = 1))
  }

  test("xlsx: an entry inflating past the byte cap fails loudly (zip-bomb guard)") {
    // highly-compressible sheet XML: tiny zipped, big inflated
    val big = """<row r="1"><c r="A1" t="inlineStr"><is><t>""" +
      ("x" * 2_000_000) + "</t></is></c></row>"
    val bytes = makeXlsx(big, Seq.empty)
    assert(bytes.length < 100_000) // genuinely bomb-shaped: >20x inflation
    val e = intercept[IllegalArgumentException](
      Xlsx.parseWorkbook(bytes, sheet = 1, width = 1, maxEntryBytes = 1_000_000))
    assert(e.getMessage.contains("zip-bomb"))
    // generous cap still parses it
    assert(Xlsx.parseWorkbook(bytes, sheet = 1, width = 1).nonEmpty)
  }
}
