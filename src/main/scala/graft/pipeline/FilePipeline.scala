package graft.pipeline

import graft.marts.Marts
import graft.meta.MetaStore
import graft.schema.TableConfig
import graft.sources.{FileTransfer, TabularFile}
import graft.validate.Checks
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.time.LocalDate

/** SURVEY.md §3 E2 — the file-based pipeline restated:
  * `SFTP/FTP staging → tabular read (banner/trailer/coercion/key filter) →
  *  validate → time-partition overwrite → freshness-guarded rollups`.
  * (reference: pns_dag.py:31-113 + pns_to_ods_optimize.py + datamart_dag)
  */
object FilePipeline {

  final case class E2Result(landed: Seq[String], loaded: Long,
                            rolledUp: Boolean)

  /** One daily run for the given date: stage the T-1-stamped files, parse
    * and normalize them, replace the affected time partitions, then
    * refresh the day rollup only when the new data is fresher. */
  def runDaily(spark: SparkSession, cfg: TableConfig, partitionCol: String,
               remoteDir: String, landingDir: String, tableRoot: String,
               rollupRoot: String, metaPath: String, runDate: LocalDate,
               headerRows: Int = 1, trailerRows: Int = 0,
               requiredKeys: Seq[String] = Nil,
               rollupAggs: Seq[Column] = Seq(count(lit(1)).as("n"))): E2Result = {
    val meta = new MetaStore(spark, metaPath)
    meta.timed(cfg.name, s"e2[$runDate]", runDate.toString) {
      // S8: land yesterday's files
      val landed = FileTransfer.downloadTMinus(remoteDir, landingDir, runDate)
      if (landed.isEmpty) E2Result(Nil, 0L, rolledUp = false)
      else {
        // S7: parse + coerce + filter — persist so validation, the
        // partition write, and the count don't each re-parse the files
        val parsed = TabularFile.read(spark, landingDir, cfg,
          headerRows, trailerRows, requiredKeys).persist()
        try {
          Checks.enforce(Seq(Checks.schemaMatches(parsed, cfg.schema), Checks.nonEmpty(parsed)))

          // M4: idempotent time-partition replacement
          val store = new PartitionedStore(spark, tableRoot, partitionCol)
          if (store.exists) store.overwritePartitions(parsed) else store.snapshot(parsed)
          val loaded = parsed.count()

          // M6/A5: day rollup only if the table advanced past the mart —
          // compared at DAY grain on both sides (the reference's guard is
          // max(src.status_date) > max(dest.delivery_date), same grain;
          // comparing a raw timestamp against the mart's day string would
          // always fire)
          val table = store.read.get
          val mart = new TableStore(spark, rollupRoot)
          val cursor = cfg.cursorField.getOrElse(partitionCol)
          val tableDays = table.select(to_date(col(cursor)).as("day"))
          val rolled = mart.read match {
            case Some(existing) =>
              Marts.refreshIfStale(tableDays, "day", existing, "day") {
                mart.snapshot(Marts.dayRollup(table, cursor, Nil, rollupAggs))
              }.isDefined
            case None =>
              mart.snapshot(Marts.dayRollup(table, cursor, Nil, rollupAggs)); true
          }
          E2Result(landed, loaded, rolled)
        } finally parsed.unpersist()
      }
    }
  }
}
