package graft
import org.apache.spark.sql.SparkSession
object Gen10x {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Soak.generate(spark, "/root/testdata/sf0.1", "/dev/shm/graft_soak10x", 10)
    Soak.generateTpch(spark, "/root/testdata/sf0.1", "/dev/shm/graft_soak10x", 10)
    spark.stop()
  }
}
