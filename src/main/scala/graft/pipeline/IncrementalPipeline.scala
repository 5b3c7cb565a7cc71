package graft.pipeline

import graft.meta.MetaStore
import graft.ops.Normalize
import graft.schema.TableConfig
import graft.sources.{Staging, Windowed, WatermarkStore}
import graft.validate.Checks
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** The end-to-end incremental slice — SURVEY.md §3 E1 restated in Spark:
  *
  * {{{ window → normalize → validate → stage (count-verified) → merge →
  *     watermark advance → run-metadata }}}
  *
  * One invocation = one reference DAG run over one half-open cursor
  * window. Replaying a window (the backdate DAGs) converges because the
  * merge is idempotent; the watermark store records progress; every run
  * logs a task_result row, success or failure.
  */
object IncrementalPipeline {

  final case class Layout(stagingRoot: String, tableRoot: String,
                          metaPath: String, watermarkPath: String)

  final case class WindowResult(version: Int, stagedRows: Long)

  def runWindow(spark: SparkSession, cfg: TableConfig, layout: Layout,
                source: DataFrame, start: String, end: String,
                manual: Boolean = false): WindowResult = {
    val meta = new MetaStore(spark, layout.metaPath)
    meta.timed(cfg.name, s"window[$start,$end)", start) {
      val windowed = Windowed.cursorWindow(source, cfg,
        lit(start).cast(TimestampType), lit(end).cast(TimestampType))
      val normalized = Normalize.ingest(windowed, cfg)

      // V1 schema contract before load, A3 count reconciliation after
      Checks.enforce(Seq(Checks.schemaMatches(normalized, cfg.schema)))
      val stagingPath = Staging.stagingPath(layout.stagingRoot, cfg, manual)
      val stagedRows = Staging.overwrite(normalized, stagingPath)
      Checks.enforce(Seq(Checks.rowCountReconciles(normalized.count(), stagedRows)))
      // the volume gauge the reference scrapes per load (timed() already
      // emits the duration timer + success/failure counter around this)
      meta.emit("rows_staged", "gauge", stagedRows.toDouble,
        cfg.name, s"window[$start,$end)", start)

      val store = new TableStore(spark, layout.tableRoot)
      val version = store.upsert(Staging.read(spark, stagingPath), cfg)

      new WatermarkStore(spark, layout.watermarkPath).set(cfg.name, end)
      WindowResult(version, stagedRows)
    }
  }

  /** Current table state (None before the first window). */
  def state(spark: SparkSession, layout: Layout): Option[DataFrame] =
    new TableStore(spark, layout.tableRoot).read
}
