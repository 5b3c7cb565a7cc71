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

/** Run-metadata bookkeeping (SURVEY.md §2.10 V3/V6): every pipeline task
  * appends its outcome to an append-only parquet log, the Spark stand-in
  * for the reference's `task_result.<schema>` Postgres table and
  * `ds.procedure_log`. Append-only, partition-free tiny writes — readers
  * aggregate; nothing ever rewrites history.
  */
final class MetaStore(spark: SparkSession, path: String) {
  import spark.implicits._

  def log(tr: TaskResult): Unit =
    Seq(tr).toDS().write.mode("append").parquet(path)

  def taskResults: DataFrame =
    if (new java.io.File(path).exists) spark.read.parquet(path)
    else Seq.empty[TaskResult].toDS().toDF()

  /** Run `body` under metadata bookkeeping: success or failure is recorded
    * with wall-clock duration, then the outcome is rethrown/returned —
    * the pre_execute/post_execute wrapper every reference operator has
    * (bccp_to_ods.py:173-183). */
  def timed[T](pipeline: String, task: String, runDay: String, tryNumber: Int = 1)(body: => T): T = {
    val t0 = System.currentTimeMillis()
    val outcome = Try(body)
    val t1 = System.currentTimeMillis()
    val (ok, msg) = outcome match {
      case Success(v) => (true, String.valueOf(v).take(500))
      case Failure(e) => (false, s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}")
    }
    log(TaskResult(pipeline, task, runDay, t0, t1, (t1 - t0) / 1000.0, ok, msg, tryNumber))
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
