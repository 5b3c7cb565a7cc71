package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.util.{Failure, Success, Try}

/** One task execution record — the engine's `task_result.*` row
  * (reference helper1/task_logger.py:6-66: dag_id, task_id, run_day,
  * start/end, duration, result, is_success, try_number). */
final case class TaskResult(
    pipeline: String,
    task: String,
    runDay: String,
    startedAtMs: Long,
    endedAtMs: Long,
    durationSec: Double,
    isSuccess: Boolean,
    result: String,
    tryNumber: Int)

/** One metric observation — the engine's statsd line. The reference maps
  * Airflow's statsd stream into Prometheus (`configs/statsd.yaml`:
  * `*.dag.*.*.duration` observers and `*.ti_successes`/`*.ti_failures`
  * counters, labeled with dag_id/task_id; `configs/airflow.cfg:1-5` turns
  * the stream on). Same dimensions here: `pipeline` plays dag_id, `task`
  * plays task_id, `metricType` distinguishes counter/timer/gauge. */
final case class Metric(
    name: String,
    metricType: String,
    value: Double,
    pipeline: String,
    task: String,
    runDay: String,
    atMs: Long)

/** Run-metadata bookkeeping (SURVEY.md §2.10 V3/V6): every pipeline task
  * appends its outcome to an append-only parquet log, the Spark stand-in
  * for the reference's `task_result.<schema>` Postgres table and
  * `ds.procedure_log`. Append-only, partition-free tiny writes — readers
  * aggregate; nothing ever rewrites history.
  *
  * Metrics land beside it in `<path>/_metrics` (underscore-prefixed, so
  * the task-result parquet read never sees them): [[timed]] emits the
  * statsd trio automatically — `task_duration` timer + `ti_successes` /
  * `ti_failures` counter — and [[emit]] takes custom counters/gauges
  * (rows staged, bytes written). A Prometheus bridge is one scan of this
  * table; the engine's job is to RECORD, durable and queryable.
  */
final class MetaStore(spark: SparkSession, path: String) {
  import spark.implicits._

  private def metricsPath = s"$path/_metrics"

  def log(tr: TaskResult): Unit =
    Seq(tr).toDS().write.mode("append").parquet(path)

  /** True when the directory holds at least one DATA file — a dir created
    * by a metrics-only write (just `_metrics/`, or `_SUCCESS` markers)
    * must read as empty, not throw schema-inference errors. */
  private def hasData(dir: String): Boolean = {
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
    files.exists(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
  }

  def taskResults: DataFrame =
    if (hasData(path)) spark.read.parquet(path)
    else Seq.empty[TaskResult].toDS().toDF()

  def emit(ms: Seq[Metric]): Unit =
    if (ms.nonEmpty) ms.toDS().write.mode("append").parquet(metricsPath)

  def emit(name: String, metricType: String, value: Double,
           pipeline: String, task: String, runDay: String): Unit =
    emit(Seq(Metric(name, metricType, value, pipeline, task, runDay,
      System.currentTimeMillis())))

  def metrics: DataFrame =
    if (hasData(metricsPath)) spark.read.parquet(metricsPath)
    else Seq.empty[Metric].toDS().toDF()

  /** Run `body` under metadata bookkeeping: success or failure is recorded
    * with wall-clock duration, then the outcome is rethrown/returned —
    * the pre_execute/post_execute wrapper every reference operator has
    * (bccp_to_ods.py:173-183). Also emits the statsd pair the reference
    * scrapes per task: a duration timer and a success/failure counter. */
  def timed[T](pipeline: String, task: String, runDay: String, tryNumber: Int = 1)(body: => T): T = {
    val t0 = System.currentTimeMillis()
    val outcome = Try(body)
    val t1 = System.currentTimeMillis()
    val (ok, msg) = outcome match {
      case Success(v) => (true, String.valueOf(v).take(500))
      case Failure(e) => (false, s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}")
    }
    val record = Try {
      log(TaskResult(pipeline, task, runDay, t0, t1, (t1 - t0) / 1000.0, ok, msg, tryNumber))
      emit(Seq(
        Metric("task_duration", "timer", (t1 - t0) / 1000.0, pipeline, task, runDay, t1),
        Metric(if (ok) "ti_successes" else "ti_failures", "counter", 1.0,
          pipeline, task, runDay, t1)))
    }
    // when the BODY failed, the bookkeeping writes are best-effort: a
    // session sick enough to fail the task usually fails the telemetry
    // write too, and that secondary failure must not REPLACE the body's
    // original exception below. A successful body still demands its run
    // record (V3 contract) — there, a failed write fails the task.
    if (ok) record.get
    outcome.get
  }
}

/** M7 — chunked fan-out with bounded retry (SURVEY.md §2.6 M7): the
  * reference fetches control rows, chunks id lists (default 1000), calls a
  * stored procedure per chunk with up to 3 retries, and logs every attempt
  * (reconciliation_batch_operator.py:42-178). Orchestration is inherently
  * driver-side — each chunk's work is a Spark job; the loop just sequences
  * and retries them.
  */
object BatchFanout {

  final case class ChunkOutcome(chunkIndex: Int, size: Int, attempts: Int,
                                success: Boolean, error: String)

  def runChunked[A](items: Seq[A], chunkSize: Int = 1000, maxRetry: Int = 3)
                   (proc: Seq[A] => Unit): Seq[ChunkOutcome] = {
    require(chunkSize > 0, "chunkSize must be positive")
    items.grouped(chunkSize).zipWithIndex.map { case (chunk, i) =>
      var attempt = 0
      var lastError = ""
      var ok = false
      while (!ok && attempt < maxRetry) {
        attempt += 1
        Try(proc(chunk)) match {
          case Success(_) => ok = true
          case Failure(e) => lastError = s"${e.getClass.getSimpleName}: ${e.getMessage}"
        }
      }
      ChunkOutcome(i, chunk.size, attempt, ok, if (ok) "" else lastError)
    }.toSeq
  }
}
