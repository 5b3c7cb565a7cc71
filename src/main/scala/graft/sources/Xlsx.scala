package graft.sources

import graft.schema.TableConfig
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal native .xlsx ingestion (SURVEY.md §2.1 S7 — the reference
  * streams Excel workbooks with openpyxl, pns_to_ods_optimize.py:95-229).
  *
  * An .xlsx file is a zip containing sheet XML plus an optional shared-
  * strings table; everything needed to read one ships in the JDK
  * (`java.util.zip` + `javax.xml.parsers`). Files parse EXECUTOR-side via
  * `binaryFiles` — a landing directory of daily workbook drops fans out
  * across the cluster, one task per file, no driver-side loops. Each
  * workbook is small by construction (Excel caps at ~1M rows), so a
  * whole-file DOM parse per task is the right trade; banner/trailer trim
  * happens in-memory during the parse, costing zero extra jobs.
  *
  * Scope (documented, matching the reference's usage): values come back as
  * their stored strings — shared strings, inline strings, booleans, and
  * raw numbers. Excel date serials are numbers here (the reference's
  * sheets carry dates as formatted text); formula CACHED values are read,
  * formulas are not evaluated.
  */
object Xlsx {

  /** Default cap on a single inflated zip entry: far above any legitimate
    * sheet XML (Excel caps a sheet at ~1M rows), far below executor heap. */
  val DefaultMaxEntryBytes: Long = 256L * 1024 * 1024

  /** Inflate one zip entry with a hard byte cap. A zip-bomb .xlsx (tiny
    * compressed, multi-GB declared) fails LOUDLY here instead of OOMing
    * the task during `readAllBytes`/DOM parse — landing files are
    * untrusted input. */
  private def readEntryBounded(zin: java.util.zip.ZipInputStream, name: String,
                               maxBytes: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    var total = 0L
    var n = zin.read(buf)
    while (n >= 0) {
      total += n
      if (total > maxBytes)
        throw new IllegalArgumentException(
          s"workbook entry $name inflates past $maxBytes bytes — refusing (zip-bomb guard)")
      bos.write(buf, 0, n)
      n = zin.read(buf)
    }
    bos.toByteArray
  }

  /** Parse one workbook's sheet into rows of nullable cell strings, padded
    * to `width` columns. Pure function of the bytes — runs in executors. */
  private[sources] def parseWorkbook(bytes: Array[Byte], sheet: Int, width: Int,
                                     maxEntryBytes: Long = DefaultMaxEntryBytes): Seq[Array[String]] = {
    val entries = scala.collection.mutable.Map[String, Array[Byte]]()
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val name = e.getName
        if (name == s"xl/worksheets/sheet$sheet.xml" || name == "xl/sharedStrings.xml")
          entries(name) = readEntryBounded(zin, name, maxEntryBytes)
        zin.closeEntry(); e = zin.getNextEntry
      }
    } finally zin.close()
    val sheetXml = entries.getOrElse(s"xl/worksheets/sheet$sheet.xml",
      throw new IllegalArgumentException(s"workbook has no sheet$sheet.xml"))

    // XXE-hardened JDK DOM parse (untrusted landing files)
    def dom(b: Array[Byte]): org.w3c.dom.Document = {
      val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
      f.setExpandEntityReferences(false)
      f.newDocumentBuilder().parse(new java.io.ByteArrayInputStream(b))
    }

    // visible <t> runs of an <si>/<is> node, EXCLUDING phonetic <rPh>
    // guides (Japanese Excel stores furigana there — concatenating them
    // would corrupt the visible cell value; openpyxl excludes them).
    // Returned as a Seq so callers can distinguish "no visible runs at
    // all" (→ null cell) from an actual empty string.
    def visibleRuns(el: org.w3c.dom.Element): Seq[String] = {
      def inRPh(n: org.w3c.dom.Node): Boolean = {
        var p = n.getParentNode
        while (p != null && p != el) {
          if (p.getNodeName == "rPh") return true
          p = p.getParentNode
        }
        false
      }
      val ts = el.getElementsByTagName("t")
      (0 until ts.getLength).map(ts.item(_))
        .filterNot(inRPh).map(_.getTextContent)
    }

    val shared: IndexedSeq[String] = entries.get("xl/sharedStrings.xml").map { b =>
      val sis = dom(b).getElementsByTagName("si")
      (0 until sis.getLength).map(i =>
        visibleRuns(sis.item(i).asInstanceOf[org.w3c.dom.Element]).mkString)
    }.getOrElse(IndexedSeq.empty)

    def colIndex(ref: String): Int = {
      var i = 0; var acc = 0
      while (i < ref.length && ref.charAt(i).isLetter) {
        acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
      }
      acc - 1
    }

    val rows = dom(sheetXml).getElementsByTagName("row")
    (0 until rows.getLength).map { r =>
      val out = new Array[String](width)
      val cells = rows.item(r).asInstanceOf[org.w3c.dom.Element].getElementsByTagName("c")
      var i = 0
      // ECMA-376: a cell without an r ref occupies the column AFTER the
      // previous cell — NOT its element position (a sparse row like
      // <c r="B1"/><c/> puts the second cell in C, and position-based
      // placement would overwrite B)
      var nextIdx = 0
      while (i < cells.getLength) {
        val c = cells.item(i).asInstanceOf[org.w3c.dom.Element]
        val idx = if (c.hasAttribute("r")) colIndex(c.getAttribute("r")) else nextIdx
        // a malformed ref (-1) must not reset the running position — the
        // bad cell nulls itself, it doesn't relocate its neighbors
        if (idx >= 0) nextIdx = idx + 1
        if (idx >= 0 && idx < width) {
          val t = c.getAttribute("t")
          val v: String = t match {
            case "inlineStr" =>
              // null iff there are no VISIBLE runs (a phonetic-only cell
              // has <t> nodes but no displayable text)
              val runs = visibleRuns(c)
              if (runs.isEmpty) null else runs.mkString
            case "s" =>
              // a malformed or out-of-range shared index nulls the CELL
              // (the module's per-cell-guard contract), never the job
              val vs = c.getElementsByTagName("v")
              if (vs.getLength == 0) null
              else vs.item(0).getTextContent.trim.toIntOption
                .flatMap(shared.lift).orNull
            case "b" =>
              val vs = c.getElementsByTagName("v")
              if (vs.getLength == 0) null
              else if (vs.item(0).getTextContent.trim == "1") "true" else "false"
            case _ => // numbers and formula-cached strings carry a raw <v>
              val vs = c.getElementsByTagName("v")
              if (vs.getLength == 0) null else vs.item(0).getTextContent
          }
          out(idx) = v
        }
        i += 1
      }
      out
    }
  }

  /** Read a .xlsx file or landing directory of them against a declared
    * schema — same banner/trailer/coercion/required-key semantics as
    * [[TabularFile.read]], with the workbook container parsed natively. */
  def read(spark: SparkSession, path: String, cfg: TableConfig,
           headerRows: Int = 1, trailerRows: Int = 0,
           requiredKeys: Seq[String] = Nil, sheet: Int = 1,
           withEtlDate: Boolean = false,
           maxEntryBytes: Long = DefaultMaxEntryBytes): DataFrame = {
    val files = TabularFile.listDataFiles(spark, path)
    val rawSchema = StructType(cfg.schema.fields.map(f => StructField(f.name, StringType)))
    if (files.isEmpty) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], cfg.schema)
      return TabularFile.finish(empty, cfg, requiredKeys, withEtlDate)
    }
    val width = cfg.schema.fields.length
    val hr = headerRows; val tr = trailerRows; val sh = sheet // serializable captures
    val maxB = maxEntryBytes
    // binaryFiles splits its argument on commas and expands globs — escape
    // glob metacharacters, and union per-file RDDs (still one lazy job)
    // when a path itself contains a comma
    def esc(p: String): String = p.replaceAll("([{}\\[\\]*?\\\\])", "\\\\$1")
    val payloads =
      if (files.exists(_.contains(",")))
        files.map(f => spark.sparkContext.binaryFiles(esc(f))).reduce(_ union _)
      else spark.sparkContext.binaryFiles(files.map(esc).mkString(","))
    val rows = payloads
      .flatMap { case (_, pds) =>
        val all = parseWorkbook(pds.toArray(), sh, width, maxB)
        // banner/trailer are per file and the workbook is already in
        // memory — trim before anything leaves the task
        all.slice(hr, math.max(hr, all.length - tr))
          .map(a => Row(a.toIndexedSeq: _*))
      }
    TabularFile.finish(spark.createDataFrame(rows, rawSchema), cfg, requiredKeys, withEtlDate)
  }
}
