package graft.pipeline

import graft.marts.Marts
import graft.merge.MergeEngine
import graft.meta.MetaStore
import graft.schema.TableConfig
import graft.sources.Jdbc
import graft.validate.Checks
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import java.util.Properties

/** SURVEY.md §3 E3 — the reverse-ETL aggregation publish restated:
  * `fact LEFT JOIN broadcast dims → flag filter → groupBy → sums →
  *  null-safe keyed MERGE into the downstream warehouse`.
  * (reference: ods_to_llb.py:62-198 +
  *  staging_revenue_by_employee.sql extract/merge pair)
  */
object ReverseEtl {

  final case class E3Result(martRows: Long, published: Long)

  /** Driver-side JDBC-metadata existence check (case-insensitive; exact
    * name patterns rather than a whole-catalog scan). */
  private def tableExists(url: String, table: String, props: Properties): Boolean = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val md = conn.getMetaData
      // getTables treats the name as a LIKE pattern ('_' is a single-char
      // wildcard) — 'rev_emp' would match an unrelated 'revXemp' and send
      // the run down the merge path against the wrong table. Escape with
      // the driver's declared escape string before probing.
      val esc = Option(md.getSearchStringEscape).getOrElse("\\")
      def escaped(t: String): String =
        t.replace(esc, esc + esc).replace("_", esc + "_").replace("%", esc + "%")
      Seq(table, table.toUpperCase, table.toLowerCase).distinct.exists { pat =>
        val rs = md.getTables(null, null, escaped(pat), null)
        try rs.next() finally rs.close()
      }
    } finally conn.close()
  }

  /** Build the mart and publish it to a JDBC warehouse with merge
    * semantics: stage the batch, merge against the existing downstream
    * table on the (null-safe) business key, overwrite-publish the merged
    * state. Probes connectivity first (V4) like the reference's sensors. */
  def publishMart(spark: SparkSession, fact: DataFrame,
                  dims: Seq[(DataFrame, String)], flags: Column,
                  groupKeys: Seq[String], aggs: Seq[Column],
                  cfg: TableConfig, url: String, table: String,
                  metaPath: String, runDay: String,
                  props: Properties = new Properties): E3Result = {
    require(Jdbc.probe(url, props), s"connectivity probe failed for $url")
    val meta = new MetaStore(spark, metaPath)
    meta.timed(cfg.name, s"e3[$runDay]", runDay) {
      val mart = Marts.joinAgg(fact, dims, flags, groupKeys, aggs)
      Checks.enforce(Seq(Checks.nonEmpty(mart), Checks.unique(mart, cfg.keys)))
      val martRows = mart.count()

      // explicit existence probe: ONLY a missing table means first
      // publish — any other failure (transient JDBC error, schema drift)
      // must abort, because the publish below overwrites the table and a
      // swallowed merge error would destroy the downstream history
      val merged =
        if (!tableExists(url, table, props)) mart
        else {
          val existing = Jdbc.table(spark, url, table, props = props)
          // downstream engines may upper-case identifiers — align by name;
          // the EVOLVING merge keeps columns the downstream team added
          // (they survive as target-side values) instead of the overwrite
          // silently destroying them
          val aligned = existing.toDF(existing.columns.map(_.toLowerCase).toSeq: _*)
          // a downstream table without the merge keys is the wrong table
          // (renamed/repurposed) — evolution would null-key every existing
          // row and garbage-merge; abort before the destructive overwrite
          require(cfg.keys.forall(k => aligned.columns.contains(k.toLowerCase)),
            s"downstream table '$table' lacks merge key(s) ${cfg.keys.mkString(",")}; refusing to publish")
          MergeEngine.upsertEvolving(aligned, mart, cfg)
        }
      // durably materialize BEFORE the overwrite: the merged plan still
      // reads the downstream table, and JDBC overwrite truncates it before
      // inserting; a cache could be evicted mid-insert and recompute from
      // the truncated table — a parquet round-trip cannot
      val tmpRoot = java.nio.file.Files.createTempDirectory("reverse_etl")
      try {
        val tmp = s"$tmpRoot/merged"
        merged.write.parquet(tmp)
        val durable = spark.read.parquet(tmp)
        Jdbc.publish(durable, url, table, mode = "overwrite", props = props)
        E3Result(martRows, durable.count())
      } finally {
        val fs = new org.apache.hadoop.fs.Path(tmpRoot.toString)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(tmpRoot.toString), true)
      }
    }
  }
}
