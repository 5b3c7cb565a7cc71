import org.apache.spark.sql.SparkSession

/** Scratch soak runner for the round-11 session-2 operators (deleted
  * after the SCALE_SOAK addendum is recorded). 3 passes per SF at
  * local[8], median reported — the established protocol. */
object SoakR11b {
  def main(args: Array[String]): Unit = {
    val qs = Seq("j_scd2_asof", "pipeline_curation_funnel", "a_pivot",
      "a_unpivot", "sample_epoch_order", "w_rolling_7d")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("soak-r11b")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1"); q <- qs) {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, sf).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SOAK|$q|$sf|${times.sorted.apply(1)}%.2f")
    }
    spark.stop()
  }
}
