package graft

import org.apache.spark.sql.SparkSession

/** Scale-soak runner (the SCALE_SOAK.md protocol as a permanent tool):
  * 3 passes per SF at local[8], median reported, for a comma-listed
  * query subset.
  *
  * Usage: sbt "Test/runMain graft.SoakMain <q1,q2,…> [sfDir1,sfDir2]"
  * (default SFs: /root/testdata/sf0.01 and sf0.1 — the 10× pair). */
object SoakMain {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfs = if (args.length > 1) args(1).split(",").toSeq
              else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-soak")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- sfs; q <- names) {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sf).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SOAK|$q|$sf|${times.sorted.apply(1)}%.2f")
    }
    spark.stop()
  }
}
