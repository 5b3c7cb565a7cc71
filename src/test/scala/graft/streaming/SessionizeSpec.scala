package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files
import java.sql.Timestamp

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ev(u: Long, t: String, v: Double) = (u, Timestamp.valueOf(t), v)
  private val data = Seq(
    ev(1, "2024-01-01 10:00:00", 1.0),
    ev(1, "2024-01-01 10:10:00", 2.0),  // same session (gap 30m)
    ev(1, "2024-01-01 12:00:00", 4.0),  // new session
    ev(2, "2024-01-01 10:05:00", 8.0)
  ).toDF("user_id", "ts", "value")

  test("batch sessionization: gap splits sessions, aggregates per session") {
    val out = Sessionize.sessionsBatch(data)
      .select(col("user_id"), col("n_events"), col("total_value"))
    assert(canon(out) == Seq(
      Seq("1", "2", "3.0"), Seq("1", "1", "4.0"), Seq("2", "1", "8.0")
    ).sortBy(_.mkString("|")))
  }

  test("late events: in-gap extends session backwards; too-late emits separately") {
    import org.apache.spark.sql.streaming.Trigger
    import java.nio.file.Files
    val t = Files.createTempDirectory("sess-late").toString
    val inbox = s"$t/in"
    // batch 1 opens a session at 10:00
    Seq(ev(1, "2024-01-01 10:00:00", 1.0)).toDF("user_id", "ts", "value")
      .write.mode("append").parquet(inbox)
    // batch 2: 09:50 (late, within 30m gap → extends span backwards) and
    // 07:00 (too late → separate single-event session); sentinel flushes
    Seq(ev(1, "2024-01-01 09:50:00", 2.0), ev(1, "2024-01-01 07:00:00", 4.0),
        ev(99, "2024-01-02 12:00:00", 0.0)).toDF("user_id", "ts", "value")
      .write.mode("append").parquet(inbox)
    val schema = Seq(ev(1, "2024-01-01 00:00:00", 0.0)).toDF("user_id", "ts", "value").schema
    val q = Sessionize.sessions(spark, spark.readStream.schema(schema).parquet(inbox),
        gap = "30 minutes", lateness = "6 hours")
      .writeStream.format("memory").queryName("sl").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = canon(spark.table("sl").filter(org.apache.spark.sql.functions.col("user_id") === 1)
      .select("n_events", "total_value"))
    // 07:00 alone (4.0) and the 09:50+10:00 session (3.0)
    assert(got == Seq(Seq("1", "4.0"), Seq("2", "3.0")).sortBy(_.mkString("|")))
  }

  test("streaming sessionization emits closed sessions; watermark closes the tail") {
    val t = Files.createTempDirectory("sess").toString
    val inbox = s"$t/in"
    data.write.parquet(inbox)
    // a late-horizon event pushes the watermark far enough to time out and
    // close every session above
    Seq(ev(99L, "2024-01-02 00:00:00", 0.0)).toDF("user_id", "ts", "value")
      .write.mode("append").parquet(inbox)
    val stream = spark.readStream.schema(data.schema).parquet(inbox)
    val q = Sessionize.sessions(spark, stream, gap = "30 minutes", lateness = "1 hour")
      .writeStream.format("memory").queryName("sess").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = canon(spark.table("sess").filter(col("user_id") =!= 99)
      .select(col("user_id"), col("n_events"), col("total_value")))
    assert(got == Seq(
      Seq("1", "2", "3.0"), Seq("1", "1", "4.0"), Seq("2", "1", "8.0")
    ).sortBy(_.mkString("|")))
  }
}
