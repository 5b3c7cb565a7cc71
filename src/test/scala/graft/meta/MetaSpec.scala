package graft.meta

import graft.SparkSpec
import java.nio.file.Files

class MetaSpec extends SparkSpec {

  test("V3 MetaStore.timed records success and failure, rethrows") {
    val dir = Files.createTempDirectory("meta").toString + "/task_result"
    val store = new MetaStore(spark, dir)
    assert(store.timed("p1", "extract", "2024-01-01")(42) == 42)
    intercept[RuntimeException] {
      store.timed("p1", "load", "2024-01-01")(throw new RuntimeException("kaput"))
    }
    val rows = store.taskResults.collect()
    assert(rows.length == 2)
    val byTask = rows.map(r => r.getAs[String]("task") -> r.getAs[Boolean]("isSuccess")).toMap
    assert(byTask("extract") && !byTask("load"))
    assert(rows.exists(_.getAs[String]("result").contains("kaput")))
  }

  test("timed emits the statsd pair: duration timer + success/failure counter") {
    val dir = Files.createTempDirectory("meta-metrics").toString + "/task_result"
    val store = new MetaStore(spark, dir)
    store.timed("bccp", "extract", "2024-01-01")(1)
    intercept[RuntimeException] {
      store.timed("bccp", "load", "2024-01-01")(throw new RuntimeException("x"))
    }
    val ms = store.metrics.collect()
      .map(r => (r.getAs[String]("name"), r.getAs[String]("metricType"),
                 r.getAs[String]("task"))).toSet
    assert(ms == Set(
      ("task_duration", "timer", "extract"),
      ("ti_successes", "counter", "extract"),
      ("task_duration", "timer", "load"),
      ("ti_failures", "counter", "load")))
    // dimensions match the reference scrape: pipeline=dag_id, task=task_id
    val dims = store.metrics.select("pipeline").distinct().collect().map(_.getString(0))
    assert(dims.toSeq == Seq("bccp"))
    // metrics are invisible to the task_result read (underscore dir)
    assert(store.taskResults.count() == 2)
  }

  test("emit records custom gauges/counters queryable by dimension") {
    val dir = Files.createTempDirectory("meta-gauge").toString + "/task_result"
    val store = new MetaStore(spark, dir)
    store.emit("rows_staged", "gauge", 1234.0, "bccp", "window[a,b)", "2024-01-01")
    store.emit("rows_staged", "gauge", 5678.0, "bccp", "window[b,c)", "2024-01-02")
    val total = store.metrics.filter(org.apache.spark.sql.functions.col("name") === "rows_staged")
      .agg(org.apache.spark.sql.functions.sum("value")).head().getDouble(0)
    assert(total == 6912.0)
    assert(store.taskResults.count() == 0) // no task rows — metrics only
  }

  test("M7 BatchFanout: chunking, retry-until-success, bounded retries") {
    var calls = 0
    val outcomes = BatchFanout.runChunked((1 to 25).toSeq, chunkSize = 10, maxRetry = 3) { chunk =>
      calls += 1
      // second chunk fails twice then succeeds; third chunk always fails
      if (chunk.head == 11 && calls < 4) throw new RuntimeException("flaky")
      if (chunk.head == 21) throw new RuntimeException("dead")
    }
    assert(outcomes.map(_.size) == Seq(10, 10, 5))
    assert(outcomes(0).success && outcomes(0).attempts == 1)
    assert(outcomes(1).success && outcomes(1).attempts == 3)
    assert(!outcomes(2).success && outcomes(2).attempts == 3 && outcomes(2).error.contains("dead"))
  }
}
