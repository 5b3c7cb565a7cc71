package graft.validate

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnomalySpec extends SparkSpec {
  import spark.implicits._

  test("a single spike is flagged; the robust baseline ignores it") {
    // 9 calm days + one 100× spike: median/MAD stay on the calm level
    val series = ((1 to 9).map(i => ("m1", i, 10.0 + (i % 3))) :+ (("m1", 10, 1000.0)))
      .toDF("metric_name", "t", "v")
    val out = Anomaly.madOutliers(series, Seq("metric_name"), "v", threshold = 3.5)
    val flagged = out.filter(col("is_anomaly")).select("t").as[Int].collect().toSeq
    assert(flagged == Seq(10), s"only the spike should flag: $flagged")
    // the spike must NOT drag the median: calm points score |z| < 1
    val calmMax = out.filter(col("t") =!= 10)
      .agg(max(abs(col("robust_z")))).head().getDouble(0)
    assert(calmMax < 1.0, s"calm points should score low: $calmMax")
  }

  test("constant series has no scale: z NULL, nothing flagged") {
    val series = (1 to 5).map(i => ("c", i, 7.0)).toDF("metric_name", "t", "v")
    val out = Anomaly.madOutliers(series, Seq("metric_name"), "v")
    assert(out.filter(col("robust_z").isNotNull).count() == 0)
    assert(out.filter(col("is_anomaly")).count() == 0)
  }

  test("series are scored independently per key") {
    val series = ((1 to 5).map(i => ("a", i, 10.0 + i)) ++
      (1 to 5).map(i => ("b", i, 1000.0 + i))).toDF("metric_name", "t", "v")
    val out = Anomaly.madOutliers(series, Seq("metric_name"), "v")
    // neither series sees the other's level as anomalous
    assert(out.filter(col("is_anomaly")).count() == 0)
  }
}
