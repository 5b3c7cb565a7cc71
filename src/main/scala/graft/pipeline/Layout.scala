package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-layout control for parquet tables: Z-order (Morton) clustering
  * plus file-level zone maps — per-file min/max/null-count statistics —
  * with predicate-driven FILE skipping at read time.
  *
  * Reference analog: the reference's warehouse relies on engine-side
  * partition/index pruning (its MERGE templates filter on load-date
  * partitions; see reference dbt macros `incremental_predicates`
  * usage in models/staging). This module is the lakehouse form of the
  * same idea: data files carry covering statistics, and a scan consults
  * the statistics BEFORE listing files into the Spark job.
  *
  * Why this matters at 100 TB: partition pruning stops at the partition
  * grain (a day, a source). Zone maps prune at the FILE grain inside a
  * partition, and Z-ordering makes multi-column pruning effective — a
  * linear sort clusters only its leading column, so a predicate on the
  * second column touches every file; the Morton key interleaves bits so
  * each file covers a small hyper-rectangle of the key space and a range
  * predicate on ANY interleaved column skips most files. The stats table
  * is one row per file (KB–MB scale for a 100 TB table) and is consulted
  * on the driver before the scan is planned, exactly like
  * Delta/Iceberg data skipping.
  *
  * The pruning is an OPTIMIZATION, never a semantic: [[prunedRead]]
  * re-applies the full residual predicate to the surviving files, so a
  * stale or missing zone map can only cost time, not correctness.
  */
object Layout {

  /** Morton (Z-order) key over k non-negative integer columns, composed
    * entirely from built-in bitwise expressions so the key computation
    * stays inside WholeStageCodegen — no custom Expression needed.
    *
    * Semantics (mirrored verbatim by the DuckDB oracle): each input is
    * cast to long and clamped into [0, 2^bits); result bit `i*k + j` is
    * bit `i` of input `j`. Requires k*bits <= 63 so the key fits a
    * signed long. NULL in any input propagates to a NULL key (standard
    * SQL null semantics) — callers that need nulls clustered should
    * coalesce to a sentinel first.
    */
  def zorderKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zorderKey needs at least one column")
    require(bits > 0 && cols.size * bits <= 63,
      s"k*bits must be in (0, 63]: k=${cols.size}, bits=$bits")
    val k = cols.size
    val hi = (1L << bits) - 1
    // Spark's least/greatest SKIP nulls, so propagation must be explicit
    val clamped = cols.map { c =>
      val v = c.cast("long")
      when(v.isNull, lit(null).cast("long"))
        .otherwise(least(greatest(v, lit(0L)), lit(hi)))
    }
    val terms = for { i <- 0 until bits; j <- 0 until k }
      yield shiftleft(shiftright(clamped(j), i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** The identical key as DuckDB SQL over column expressions — the
    * oracle twin of [[zorderKey]], generated from the same (i, j) loop
    * so the two engines agree bit for bit. */
  def zorderKeySql(cols: Seq[String], bits: Int): String = {
    val k = cols.size
    val hi = (1L << bits) - 1
    val clamped = cols.map(c =>
      s"CASE WHEN CAST(($c) AS BIGINT) IS NULL THEN NULL" +
        s" ELSE LEAST(GREATEST(CAST(($c) AS BIGINT), 0), $hi) END")
    (for { i <- 0 until bits; j <- 0 until k }
      yield s"((((${clamped(j)}) >> $i) & 1) << ${i * k + j})").mkString(" | ")
  }

  /** Hidden metadata directory under the table dir. Underscore-prefixed
    * paths are invisible to Spark's file listing, so a plain
    * `spark.read.parquet(dir)` never sees the stats as data. */
  val ZoneMapDir = "_zonemaps"

  /** Hash count of the per-file Bloom filters — fixed so build and
    * probe agree without carrying it per row; the bitmap length itself
    * travels with the filter (mBits = 8·bytes). */
  val BloomK = 4

  /** Build per-file zone maps for `cols`: one row per data file with
    * `rows`, `min_<c>`, `max_<c>`, `nulls_<c>`, plus an optional
    * per-file Bloom filter `bloom_<c>` for each of `bloomCols` — the
    * equality-skipping companion for columns the sort order does NOT
    * cluster (a zone map on an unclustered high-cardinality column
    * admits every file; the Bloom filter still rejects most of them
    * for a point lookup). One aggregate pass grouped on
    * `input_file_name()` — at production scale the min/max come free
    * from parquet footers and the Bloom is the same pass Delta/Iceberg
    * writers fold into the commit; the aggregate form keeps the layer
    * portable across file formats and costs one scan at WRITE time,
    * amortized over every pruned read.
    *
    * Size `bloomBits` ≈ 10× the expected DISTINCT keys per file (~1%
    * false positives at k=4). An undersized filter saturates and
    * admits every file: skipping silently degrades to none — never to
    * wrong answers (the residual still filters), but the scan cost
    * returns. At production file sizes (~1M keys per 128 MB file) that
    * means 2^23 bits ≈ 1 MiB per file per column. */
  def buildZoneMaps(spark: SparkSession, dir: String, cols: Seq[String],
                    bloomCols: Seq[String] = Nil,
                    bloomBits: Int = 1 << 15): Unit = {
    require(cols.nonEmpty || bloomCols.nonEmpty,
      "zone maps need at least one stats or bloom column")
    val df = SegmentIO.read(spark, dir)
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
      sum(col(c).isNull.cast("long")).as(s"nulls_$c"))) ++
      bloomCols.map(c => graft.functions.BloomOps
        .bloomBuild(col(c).cast("string"), bloomBits, BloomK).as(s"bloom_$c"))
    val allAggs = count(lit(1)).as("rows") +: aggs
    df.groupBy(input_file_name().as("file"))
      .agg(allAggs.head, allAggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/$ZoneMapDir")
  }

  /** Linear clustering: range-partition + in-partition sort on
    * `sortCols`, so each of the `files` output files covers a tight
    * range of the LEADING sort column. Zone maps on `statsCols` are
    * built in the same call — layout and statistics are one operation,
    * the way a table-format writer records footer stats at commit. */
  def writeClustered(df: DataFrame, dir: String, sortCols: Seq[String],
                     files: Int, statsCols: Seq[String],
                     bloomCols: Seq[String] = Nil,
                     bloomBits: Int = 1 << 18): Unit = {
    df.repartitionByRange(files, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(dir)
    // this is an IN-PLACE overwrite of a readable path — any schema
    // cached from a prior generation of the dir is now stale
    SegmentIO.invalidate(dir)
    buildZoneMaps(df.sparkSession, dir, statsCols, bloomCols, bloomBits)
  }

  /** Z-order clustering: range-partition + sort on the Morton key of
    * `zCols`, so each file covers a small hyper-rectangle of the
    * interleaved key space and range predicates on ANY of the z-columns
    * prune files (the multi-column skipping a linear sort cannot give).
    * The key column is dropped before the write — it is a layout
    * decision, not data. */
  def writeZOrdered(df: DataFrame, dir: String, zCols: Seq[String], bits: Int,
                    files: Int, statsCols: Seq[String],
                    bloomCols: Seq[String] = Nil,
                    bloomBits: Int = 1 << 18): Unit = {
    val keyed = df.withColumn("__zorder", zorderKey(zCols.map(col), bits))
    keyed.repartitionByRange(files, col("__zorder"))
      .sortWithinPartitions("__zorder")
      .drop("__zorder")
      .write.mode("overwrite").parquet(dir)
    SegmentIO.invalidate(dir) // in-place overwrite, same as writeClustered
    buildZoneMaps(df.sparkSession, dir, statsCols, bloomCols, bloomBits)
  }

  /** A file-skipping predicate: `residual` is the exact filter
    * re-applied to surviving files; `column` names the stats used. */
  sealed trait FilePred {
    def column: String
    def residual: Column
  }

  /** Closed-interval range predicate on one column; an absent bound is
    * unbounded on that side. NULL column values never match (SQL
    * three-valued logic), which is what lets an all-null file be
    * skipped. Prunes via the min/max zone map. */
  final case class RangePred(column: String, lo: Option[Any], hi: Option[Any])
      extends FilePred {
    def residual: Column = {
      val c = col(column)
      val lower = lo.map(v => c >= lit(v))
      val upper = hi.map(v => c <= lit(v))
      (lower.toSeq ++ upper.toSeq).reduceOption(_ && _).getOrElse(c.isNotNull)
    }
  }

  /** Point-lookup predicate. Prunes via the min/max zone map (as the
    * degenerate range [v, v]) AND, when a `bloom_<column>` filter was
    * built, via a driver-side Bloom membership probe — the skipping
    * path for columns the sort order does NOT cluster. The Bloom probe
    * hashes the SAME string form the build hashed (`CAST(c AS
    * STRING)`), so use string/integral-typed values whose string
    * rendering is canonical. */
  final case class EqPred(column: String, value: Any) extends FilePred {
    def residual: Column = col(column) === lit(value)
  }

  final case class PruneStats(totalFiles: Int, selectedFiles: Int) {
    def skipped: Int = totalFiles - selectedFiles
  }

  /** Zone-map-pruned read: filter the stats table — as a DataFrame, so
    * the admissibility test runs distributed and only SURVIVOR FILE
    * NAMES reach the driver (at 100 TB with small files the stats table
    * itself is millions of rows; the full-collect form would move every
    * min/max/bloom bitmap through the driver just to throw most away) —
    * keep only files whose [min, max] interval can intersect EVERY
    * predicate's range, then read just those files and re-apply the
    * full residual predicate. A file whose min stat is NULL holds only
    * NULLs for that column and is skipped (no null matches a range).
    * Files are skipped conservatively: a missing stats column keeps the
    * file.
    *
    * Returns the filtered frame plus (total, selected) file counts —
    * the skipping effectiveness a caller asserts in tests and logs in
    * production telemetry. */
  def prunedRead(spark: SparkSession, dir: String,
                 preds: Seq[FilePred]): (DataFrame, PruneStats) = {
    require(preds.nonEmpty, "prunedRead needs at least one predicate")
    // NOT SegmentIO: buildZoneMaps writes mode=overwrite, so a zone-map
    // dir can legitimately be rebuilt — its schema must not be cached
    val zm = spark.read.parquet(s"$dir/$ZoneMapDir")
    val statCols = zm.columns.toSet
    // stats comparisons use the SAME engine comparison semantics that
    // computed the min/max at build time (Spark's own type coercion)
    def rangeAdmits(column: String, lo: Option[Any], hi: Option[Any]): Column =
      if (!statCols.contains(s"min_$column")) lit(true)
      else {
        val mn = col(s"min_$column"); val mx = col(s"max_$column")
        val bounds = hi.map(h => mn <= lit(h)).toSeq ++ lo.map(l => mx >= lit(l))
        (Seq(mn.isNotNull && mx.isNotNull) ++ bounds).reduce(_ && _)
      }
    def bloomAdmits(column: String, v: Any): Column =
      if (!statCols.contains(s"bloom_$column")) lit(true)
      else col(s"bloom_$column").isNull ||
        graft.functions.BloomOps.bloomProbeSelfSized(
          col(s"bloom_$column"), lit(String.valueOf(v)), BloomK)
    val admits = preds.map {
      case RangePred(c, lo, hi) => rangeAdmits(c, lo, hi)
      case EqPred(c, v) => rangeAdmits(c, Some(v), Some(v)) && bloomAdmits(c, v)
    }.reduce(_ && _)
    val total = zm.count()
    val survivors = zm.filter(admits).select("file")
      .collect().map(_.getString(0))
    val residual = preds.map(_.residual).reduce(_ && _)
    // survivor files are members of this immutable segment — its
    // cached schema applies, no per-read inference job
    val schema = SegmentIO.schemaOf(spark, dir)
    val df =
      if (survivors.isEmpty) spark.read.schema(schema).parquet(dir).filter(lit(false))
      else spark.read.schema(schema).parquet(survivors.toIndexedSeq: _*).filter(residual)
    (df, PruneStats(total.toInt, survivors.length))
  }
}
