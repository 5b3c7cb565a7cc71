package graft

import org.apache.spark.sql.SparkSession

/** Scratch attribution main (dev-only): run one stream drain with a
  * job listener that prints EVERY job's duration + callsite, so the
  * per-micro-batch fixed cost decomposes into named jobs.
  * Usage: sbt "Test/runMain graft.StreamAttr <sfDir> <query>"
  */
object StreamAttr {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val query = args(1)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        val stages = js.stageInfos.map(si =>
          si.name.split("\n").head.take(60) + "[" + si.numTasks + "t]").mkString(" <- ")
        starts.put(js.jobId, (System.nanoTime(), s"$desc || $stages"))
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, what) =>
          println(f"JOB ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $what")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(query)(spark, sfDir)
    val n = df.count()
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s, rows=$n")
    Thread.sleep(500)
    spark.stop()
  }
}
