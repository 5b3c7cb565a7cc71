package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-aware reads of IMMUTABLE store segments, without the
  * schema-inference Spark job `spark.read.parquet(dir)` runs per call.
  *
  * A maintenance tick resolves each side of the diff, the current
  * tables, and the dims — ten-plus segment reads — and every
  * schema-less read launched one footer-sniffing job before any data
  * moved (measured: ~half the jobs in a [[JoinView.maintainMulti]]
  * tick were inference, pure fixed overhead at CDC cadence; at 1000
  * executors each is a full scheduler round-trip for one footer).
  *
  * Store segments are written once and never modified ([[ManifestStore]]
  * / [[MorStore]] commit-then-point contract), and every file in a
  * segment shares one schema (one writer job) — so the schema is read
  * ONCE, driver-side, from the first footer, and cached for the
  * session keyed by directory. Segment names embed a UUID, so a path
  * never maps to two schemas. Schema EVOLUTION is unaffected: it
  * happens across segments (the union layer reads missing columns as
  * NULL), never within one.
  *
  * The footer decode intentionally reuses Spark's own parquet-to-
  * Catalyst converter wired from the session's conf, so flags like
  * `nanosAsLong` / `inferTimestampNTZ` resolve exactly as a plain
  * `spark.read.parquet` would; any failure falls back to that plain
  * read (one job, correct by construction).
  */
private[graft] object SegmentIO {

  private final case class Key(confFp: String, dir: String)

  private[graft] val MaxEntries = 65536

  // access-ordered LRU: a weeks-long streaming driver touches millions
  // of segment paths; past the cap the COLDEST entry falls out (one
  // footer re-read if it ever comes back) while the hot stores' entries
  // stay warm — the previous wholesale clear() at the cap caused a
  // momentary footer-read stampede across every live store at once
  private val cache =
    new java.util.LinkedHashMap[Key, StructType](1024, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[Key, StructType]): Boolean =
        size() > MaxEntries
    }

  /** The parquet-relevant session conf, as a cache-key component: two
    * sessions whose converter flags differ (nanosAsLong,
    * inferTimestampNTZ, …) legitimately read different Catalyst schemas
    * from one footer — keying by directory alone handed one session the
    * other's schema, and a supplied-schema read masks that as nulls
    * instead of failing. */
  private def confFingerprint(spark: SparkSession): String = {
    val c = spark.sessionState.conf
    Seq(c.isParquetBinaryAsString, c.isParquetINT96AsTimestamp,
        c.caseSensitiveAnalysis, c.parquetFieldIdReadEnabled,
        c.parquetInferTimestampNTZEnabled, c.legacyParquetNanosAsLong).mkString(",")
  }

  /** `spark.read.parquet(dir)` with the segment's schema supplied
    * explicitly — no inference job. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(schemaOf(spark, dir)).parquet(dir)

  /** Drop every cached schema for `dir` — REQUIRED after any in-place
    * overwrite of a previously read path (the layout rewriters); store
    * segments proper are immutable and never need it. */
  def invalidate(dir: String): Unit = cache.synchronized {
    val it = cache.keySet().iterator()
    while (it.hasNext) if (it.next().dir == dir) it.remove()
  }

  private[graft] def cachedEntries: Int = cache.synchronized(cache.size())

  def schemaOf(spark: SparkSession, dir: String): StructType = {
    val key = Key(confFingerprint(spark), dir)
    val hit = cache.synchronized(cache.get(key))
    if (hit != null) hit
    else {
      val st = try driverSideSchema(spark, dir)
               catch { case scala.util.control.NonFatal(_) => spark.read.parquet(dir).schema }
      cache.synchronized(cache.put(key, st))
      st
    }
  }

  /** Driver-side MAX of an int32/int64 column across every parquet file
    * in `dirs`, from footer row-group statistics — no Spark job. None
    * when any file lacks usable stats for the column (caller falls back
    * to the job path), or when every row group is empty. Correctness
    * contract: parquet min/max stats are exact bounds, and for the
    * integral physical types used here they are never truncated. */
  private[graft] def footerMaxLong(spark: SparkSession, dirs: Seq[String],
                                   column: String): Option[Long] = {
    val conf = spark.sessionState.newHadoopConf()
    var best: Option[Long] = None
    for (dir <- dirs) {
      val p = new Path(dir)
      val fs = p.getFileSystem(conf)
      val files = fs.listStatus(p).iterator
        .map(_.getPath)
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
        .toSeq
      if (files.isEmpty) return None
      for (f <- files) {
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
        try {
          val md = reader.getFooter.getBlocks
          val it = md.iterator()
          while (it.hasNext) {
            val block = it.next()
            if (block.getRowCount > 0) {
              val cit = block.getColumns.iterator()
              var found = false
              while (cit.hasNext) {
                val c = cit.next()
                if (c.getPath.toDotString == column) {
                  found = true
                  val st = c.getStatistics
                  if (st == null || !st.hasNonNullValue) return None
                  val mx = st.genericGetMax match {
                    case i: java.lang.Integer => i.toLong
                    case l: java.lang.Long => l.longValue()
                    case _ => return None
                  }
                  best = Some(best.fold(mx)(math.max(_, mx)))
                }
              }
              if (!found) return None
            }
          }
        } finally reader.close()
      }
    }
    best
  }

  private def driverSideSchema(spark: SparkSession, dir: String): StructType = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    val first = fs.listStatus(p).iterator
      .map(_.getPath)
      .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .getOrElse(throw new java.io.FileNotFoundException(s"no parquet files in $dir"))
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(first, conf))
    val message = try reader.getFileMetaData.getSchema finally reader.close()
    val sql = spark.sessionState.conf
    val converted =
      new org.apache.spark.sql.execution.datasources.parquet.ParquetToSparkSchemaConverter(sql)
        .convert(message)
    // Spark's file-source read path relaxes every field to nullable
    // regardless of the footer's required-ness (files may be appended
    // by writers with weaker guarantees) — match it exactly, or plans
    // built on this schema make non-null assumptions the engine's own
    // reads never make
    relaxNullability(converted).asInstanceOf[StructType]
  }

  private def relaxNullability(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = relaxNullability(f.dataType), nullable = true)))
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = relaxNullability(a.elementType), containsNull = true)
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(keyType = relaxNullability(m.keyType),
        valueType = relaxNullability(m.valueType), valueContainsNull = true)
    case other => other
  }
}
