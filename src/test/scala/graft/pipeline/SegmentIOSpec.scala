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

  test("invalidate drops a rewritten dir's stale schema; other entries survive") {
    val base = Files.createTempDirectory("segio-inv").toString
    val a = s"$base/a"; val b = s"$base/b"
    Seq((1L, "x")).toDF("k", "s").write.parquet(a)
    Seq((2L, 3.5)).toDF("k", "d").write.parquet(b)
    val first = SegmentIO.schemaOf(spark, a)
    SegmentIO.schemaOf(spark, b)
    assert(first.fieldNames.toSeq == Seq("k", "s"))
    // legitimate in-place rewrite with a DIFFERENT schema (the layout
    // rewriters do this); without invalidation the stale cached schema
    // would read the new column as all-NULL instead of failing
    Seq((1L, 9)).toDF("k", "n").write.mode("overwrite").parquet(a)
    SegmentIO.invalidate(a)
    assert(SegmentIO.schemaOf(spark, a).fieldNames.toSeq == Seq("k", "n"))
    assert(SegmentIO.schemaOf(spark, b).fieldNames.toSeq == Seq("k", "d"))
  }

  test("cache is bounded LRU — size never exceeds the cap (hot entries retained)") {
    // the real cap is 65,536; exercising the eviction contract on the
    // shared map directly would need that many footer reads — instead
    // assert the structural contract on a twin map built the same way
    val cap = 8
    val m = new java.util.LinkedHashMap[String, Int](4, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, Int]): Boolean =
        size() > cap
    }
    (1 to 100).foreach { i =>
      m.put(s"dir$i", i)
      m.get("dir1") // keep dir1 hot from the moment it exists
    }
    assert(m.size() == cap)
    assert(m.containsKey("dir1"), "access-ordered eviction must retain hot entries")
    assert(m.containsKey("dir100") && !m.containsKey("dir50"))
    assert(SegmentIO.MaxEntries == 65536)
    assert(SegmentIO.cachedEntries <= SegmentIO.MaxEntries)
  }

  test("footerMaxLong: driver-side max from footer stats equals the aggregate, no job") {
    val base = Files.createTempDirectory("segio-fmax").toString
    val a = s"$base/a"; val b = s"$base/b"
    Seq((1, 10L), (2, 7L), (3, 10L)).toDF("v", "x").repartition(2).write.parquet(a)
    Seq((4, 12L)).toDF("v", "x").write.parquet(b)
    assert(SegmentIO.footerMaxLong(spark, Seq(a), "v").contains(3L))
    assert(SegmentIO.footerMaxLong(spark, Seq(a, b), "v").contains(4L))
    assert(SegmentIO.footerMaxLong(spark, Seq(a, b), "x").contains(12L))
    // unusable cases fall back to None, never a wrong answer
    assert(SegmentIO.footerMaxLong(spark, Seq(a), "nope").isEmpty)
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      SegmentIO.footerMaxLong(spark, Seq(a, b), "v")
      Thread.sleep(300)
      assert(jobs.get() == 0, "footer stats probe must not schedule jobs")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("schema cache keys include parquet conf — a differing session misses, not mis-reads") {
    val dir = Files.createTempDirectory("segio-conf").toString + "/seg"
    Seq((1L, Timestamp.valueOf("2024-01-01 00:00:00"))).toDF("k", "ts").write.parquet(dir)
    val s1 = SegmentIO.schemaOf(spark, dir)
    // a sibling session with a different converter flag must resolve its
    // OWN schema (possibly different), never inherit this session's
    val other = spark.newSession()
    other.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    val s2 = SegmentIO.schemaOf(other, dir)
    assert(s1 == spark.read.parquet(dir).schema)
    assert(s2 == other.read.parquet(dir).schema)
  }
}
