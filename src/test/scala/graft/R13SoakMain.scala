package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 soak driver (SCALE_SOAK protocol, one-off shapes that are
  * not registered queries):
  *
  *   1. MinhashIndexStore LONGEVITY: 50 consecutive ingest ticks over
  *      the 10× replica corpus with takedowns interleaved (every 5th
  *      tick removes 20% of an earlier batch) — the claim under test
  *      is the one `MinhashIndexStore` makes from design: probe wall
  *      stays bounded because the signature scan is narrow and
  *      MorStore hot-partition auto-compaction bounds the live-segment
  *      fan-in, however long the ingest cadence runs.
  *
  * Usage: sbt "Test/runMain graft.R13SoakMain [1|all]"
  */
object R13SoakMain {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("all")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-r13-soak")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (which == "1" || which == "all") indexLongevity(spark)
    spark.stop()
  }

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** 50 ticks of ~1000 docs each (the full 10× replica corpus),
    * takedowns every 5th tick. Per tick: ingest wall (probe + state
    * append), survivors admitted, live segment fan-in of both state
    * tables. A drifting wall or a monotonically growing segment count
    * is the failure the soak exists to catch. */
  private def indexLongevity(spark: SparkSession): Unit = {
    val replicaDir = "/dev/shm/graft_soak10x"
    Soak.generate(spark, "/root/testdata/sf0.1", replicaDir, 10)
    val docs = spark.read.parquet(s"$replicaDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val t = java.nio.file.Files.createTempDirectory("mhidx_soak").toString
    val store = new graft.llm.MinhashIndexStore(spark, s"$t/idx", "doc_id", "text")
    val nTicks = 50
    println(s"""{"soak":"index_longevity","ticks":$nTicks,"corpus_rows":${docs.count()}}""")
    var wallFirst10 = 0.0; var wallLast10 = 0.0
    for (tick <- 0 until nTicks) {
      val batch = docs.filter(pmod(col("doc_id"), lit(nTicks)) === tick)
        .localCheckpoint(false)
      val (survivors, sec) = time {
        store.ingest(batch).count()
      }
      // takedown: every 5th tick removes 20% of the batch admitted 3
      // ticks earlier — interleaved deletes are the path that would
      // break a compaction that dropped tombstones too eagerly
      var removed = 0L
      if (tick % 5 == 4 && tick >= 3) {
        // 20% of the batch admitted 3 ticks earlier: every 5th doc BY
        // RANK within that batch (the residues compose — a doc_id%5
        // filter would be unsatisfiable for most batch residues)
        val victims = docs
          .filter(pmod(col("doc_id"), lit(nTicks)) === (tick - 3) &&
            pmod(floor(col("doc_id") / nTicks), lit(5)) === 0)
          .select("doc_id")
        removed = victims.count()
        store.remove(victims)
      }
      val (sigSegs, txtSegs) = store.segmentCounts
      if (tick < 10) wallFirst10 += sec
      if (tick >= nTicks - 10) wallLast10 += sec
      println(f"""{"tick":$tick,"ingest_sec":$sec%.2f,"admitted":$survivors,"removed":$removed,"sig_segments":$sigSegs,"text_segments":$txtSegs}""")
    }
    println(f"""{"soak":"index_longevity","first10_sec":$wallFirst10%.1f,"last10_sec":$wallLast10%.1f,"drift":${wallLast10 / wallFirst10}%.2f}""")
  }
}
