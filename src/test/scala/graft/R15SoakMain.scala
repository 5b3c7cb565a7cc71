package graft

import graft.llm.{IvfIndexStore, IvfMorIndexStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 soak: the IVF-MOR write-amplification DECADE proof.
  *
  * r14 measured one point: an identical hash-spread re-embed tick
  * wrote 4.1× fewer gross bytes through the MOR store than the CoW
  * store on a 400-vector index, with the claim that the gap grows
  * linearly in index size because CoW is O(touched cells' bytes) and
  * MOR is O(batch). One point can't carry a linear claim — this main
  * measures the SAME fixed-size batch (40 vectors, hash-spread so it
  * touches essentially every cell) against 400 / 4,000 / 20,000-vector
  * indexes and prints the ratio ladder for the SCALE_SOAK addendum.
  * Gross bytes come from task output metrics (the spec's exact
  * harness), not dir sizes, so compaction-reclaimed bytes still count.
  *
  * Run: `sbt "Test/runMain graft.R15SoakMain"`.
  */
object R15SoakMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-r15-soak")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sizes = if (args.isEmpty) Seq(400, 4000, 20000) else args.map(_.toInt).toSeq
    val rows = sizes.map(n => measureTick(spark, n))
    println("\n[r15-soak] MOR vs CoW gross bytes, IDENTICAL 40-vector hash-spread re-embed tick:")
    println(f"${"index"}%8s ${"MOR B"}%10s ${"CoW B"}%10s ${"ratio"}%7s")
    rows.foreach { case (n, mor, cow) =>
      println(f"$n%8d $mor%10d $cow%10d ${cow.toDouble / mor}%7.1f")
    }
    val first = rows.head; val last = rows.last
    val growth = (last._3.toDouble / last._2) / (first._3.toDouble / first._2)
    println(f"[r15-soak] ratio growth across ${last._1 / first._1}x index: ${growth}%.1fx " +
      "(linear-in-index-size claim predicts ~the index growth factor)")
    spark.stop()
  }

  /** Deterministic clustered corpus (the IvfMorIndexStoreSpec shape,
    * scaled): n vectors of dim 16 around 8 anchor directions. */
  private def corpus(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val r = new scala.util.Random(31)
    val centers = Array.fill(8)(Array.fill(16)(r.nextGaussian()))
    (0L until n.toLong).map { i =>
      val c = centers((i % 8).toInt)
      i -> c.map(x => (x + r.nextGaussian() * 0.05).toFloat)
    }.toDF("vec_id", "embedding")
  }

  /** Gross task-output bytes for the SAME 40-vector re-embed tick on an
    * n-vector index, (n, morBytes, cowBytes). k=32 cells so the
    * hash-spread batch touches essentially all of them. */
  def measureTick(spark: SparkSession, n: Int): (Int, Long, Long) = {
    val full = corpus(spark, n).localCheckpoint(false)
    val r = new scala.util.Random(77)
    val centroids = Array.fill(32)(Array.fill(16)(r.nextGaussian().toFloat))
    def root() = java.nio.file.Files.createTempDirectory("r15amp").toString + "/idx"
    val mor = new IvfMorIndexStore(spark, root(), "embedding", "vec_id", centroids)
    val cow = new IvfIndexStore(spark, root(), "embedding", "vec_id",
      centroids, idIndex = true)
    mor.upsert(full); cow.append(full)
    // FIXED batch: 40 ids strided across the corpus (hash-spread over
    // cells), re-embedded as negations so most move cells
    val batch = full.filter(col("vec_id") % lit(math.max(n / 40, 1)) === 0)
      .limit(40)
      .withColumn("embedding", transform(col("embedding"), x => -x))
      .localCheckpoint(false)
    val written = new java.util.concurrent.atomic.AtomicLong()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          { written.addAndGet(te.taskMetrics.outputMetrics.bytesWritten); () }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      written.set(0); mor.upsert(batch); Thread.sleep(400)
      val morB = written.get()
      written.set(0); cow.upsertEmbeddings(batch); Thread.sleep(400)
      (n, morB, written.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
