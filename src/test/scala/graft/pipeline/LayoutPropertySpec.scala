package graft.pipeline

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized safety property for the file-skipping layer: for ANY
  * random layout and ANY random predicate set, the pruned read must
  * return exactly the rows of a full scan with the same residual
  * filter — statistics may only skip IO, never change answers. */
class LayoutPropertySpec extends SparkSpec {
  import spark.implicits._

  test("random predicates over a random layout: pruning never changes answers") {
    val rnd = new Random(2024)
    val t = Files.createTempDirectory("layout-prop").toString + "/data"
    // skew the value space so zone ranges overlap irregularly, and
    // sprinkle NULLs (the all-null-file skip path)
    val rows = (1 to 4000).map { i =>
      val a = if (rnd.nextInt(20) == 0) None else Some(rnd.nextInt(500).toLong)
      val b = s"u${rnd.nextInt(300)}"
      (i.toLong, a, b, rnd.nextDouble() * 100)
    }
    val df = rows.toDF("id", "a", "b", "score")
    // a partially-clustered layout: range-partition on `a` so min/max
    // zones are tight there and useless on `b`
    df.repartitionByRange(16, col("a")).write.parquet(t)
    Layout.buildZoneMaps(spark, t, Seq("a", "b", "score"))

    (1 to 30).foreach { trial =>
      val preds: Seq[Layout.FilePred] = rnd.nextInt(4) match {
        case 0 =>
          val lo = rnd.nextInt(500).toLong
          Seq(Layout.RangePred("a", Some(lo), Some(lo + rnd.nextInt(80).toLong)))
        case 1 => Seq(Layout.EqPred("b", s"u${rnd.nextInt(320)}")) // some absent
        case 2 =>
          Seq(Layout.RangePred("score", Some(rnd.nextDouble() * 90), None))
        case 3 =>
          val lo = rnd.nextInt(500).toLong
          Seq(Layout.RangePred("a", Some(lo), Some(lo + 40L)),
            Layout.EqPred("b", s"u${rnd.nextInt(300)}"))
      }
      val (pruned, stats) = Layout.prunedRead(spark, t, preds)
      val residual = preds.map(_.residual).reduce(_ && _)
      val want = canon(spark.read.parquet(t).filter(residual).select("id"))
      val got = canon(pruned.select("id"))
      assert(got == want,
        s"trial $trial diverged (selected ${stats.selectedFiles}/${stats.totalFiles}): $preds")
      assert(stats.selectedFiles <= stats.totalFiles)
    }
  }
}
