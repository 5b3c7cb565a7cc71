package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory for the engine.
  *
  * Tuned for the harness (single-JVM `local[N]`) but with settings chosen
  * for cluster scale: AQE on (runtime re-plan, skew-join splitting,
  * partition coalescing), shuffle partitions sized to cores rather than the
  * 200 default, and a pinned UTC session timezone (the reference pins
  * Asia/Ho_Chi_Minh at every DAG boundary — see
  * reference plugins/operators/casreport_to_ods.py:79-86; we pin once at
  * the session instead so window arithmetic is deterministic).
  */
object GraftSession {

  def builder(appName: String = "graft", cores: String = defaultCores): SparkSession.Builder =
    SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // testdata events.parquet carries TIMESTAMP(NANOS) which Spark's
      // vectorized reader rejects outright; read as long nanos and convert
      // at the accessor (Tables.events) — integer `div`, no double detour
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")

  def defaultCores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def getOrCreate(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
