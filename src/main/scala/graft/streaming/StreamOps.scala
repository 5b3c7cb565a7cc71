package graft.streaming

import graft.pipeline.TableStore
import graft.schema.TableConfig
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Structured Streaming restatement of the reference's micro-batch CDC
  * (SURVEY.md §2.8 stretch). The reference polls sources on a 5-minute
  * cron and re-merges late data with hourly backdate DAGs; Spark-first,
  * the same semantics are a file/CDC stream with an event-time watermark
  * and an idempotent merge in `foreachBatch` — `Trigger.AvailableNow`
  * drains whatever arrived and stops, which IS the scheduled-batch shape
  * (run per cron tick, exactly-once via checkpoint + idempotent merge).
  */
object StreamOps {

  /** Incremental file-arrival stream over a landing directory. */
  def fileStream(spark: SparkSession, dir: String, schema: StructType,
                 format: String = "parquet"): DataFrame =
    spark.readStream.schema(schema).format(format).load(dir)

  /** Watermarked event-time windowed aggregation (late data beyond
    * `lateness` is dropped, matching the reference's bounded backdate
    * re-scan horizon). */
  def windowedCounts(stream: DataFrame, tsCol: String, windowDur: String,
                     lateness: String, keys: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowDur) +: keys.map(col).toSeq: _*)
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start") +: keys.map(col) :+ col("n"): _*)

  /** Drain all available input and merge each micro-batch into the store.
    * Checkpoint + idempotent merge = effectively-once upserts; rerunning
    * after new files arrive continues from the checkpoint. Blocks until
    * the drain completes. */
  def mergeAvailable(stream: DataFrame, store: TableStore, cfg: TableConfig,
                     checkpoint: String): Unit = {
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        store.upsert(batch, cfg); ()
      }
      .start()
    q.awaitTermination()
  }
}
