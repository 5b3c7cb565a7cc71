package graft.pipeline

import graft.SparkSpec
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Driver-side footer schema for immutable segment dirs: must agree
  * byte-for-byte with Spark's own inference (same converter, same
  * conf), and must not launch the inference job it exists to remove. */
class SegmentIOSpec extends SparkSpec {
  import spark.implicits._

  test("footer schema equals Spark's inference; rows read identically; no job") {
    val dir = Files.createTempDirectory("segio").toString + "/seg"
    Seq(
      (1L, "a", Timestamp.valueOf("2024-01-01 00:00:00"), Some(1.5), Seq(1, 2)),
      (2L, null.asInstanceOf[String], Timestamp.valueOf("2024-06-01 12:00:00"), None, Seq.empty[Int])
    ).toDF("k", "s", "ts", "d", "xs").write.parquet(dir)

    assert(SegmentIO.schemaOf(spark, dir) == spark.read.parquet(dir).schema)
    assert(canon(SegmentIO.read(spark, dir)) == canon(spark.read.parquet(dir)))

    // the point of the exercise: resolving a CACHED segment's frame
    // schedules zero Spark jobs (schema-less reads launch one footer-
    // sniffing job per call — ~half of a maintenance tick's job count)
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      SegmentIO.read(spark, dir).filter(col("k") > 0) // plan only, no action
      Thread.sleep(300) // listener bus drains asynchronously
      assert(jobs.get() == 0, "cached-schema read must not schedule jobs")
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
