package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[NfcNormalize]] canonicalizes composed/decomposed Unicode ahead of
  * every hash-based stage; dedup correctness on web text rests on it. */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val decomposed = "cafe\u0301 nai\u0308ve"
  private val composed = "caf\u00e9 na\u00efve"

  test("decomposed and composed forms converge to identical bytes") {
    val out = Seq((1L, decomposed), (2L, composed)).toDF("id", "text")
      .select(col("id"), TextOps.nfcNormalize(col("text")).as("t"))
      .select(col("id"), col("t"), octet_length(col("t")).as("b"), md5(col("t")).as("h"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(1L) == out(2L))
    assert(out(1L)._1 == composed)
    assert(out(1L)._3 == out(2L)._3, "post-NFC fingerprints must match")
  }

  test("ASCII fast path is the identity; NULL propagates") {
    val out = Seq((1L, Option("plain ascii text")), (2L, Option.empty[String]))
      .toDF("id", "text")
      .select(col("id"), TextOps.nfcNormalize(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).contains("plain ascii text"))
    assert(out(2L).isEmpty)
  }

  test("agrees with Java Normalizer on random Latin-1 + combining-mark strings") {
    val marks = Seq('\u0300', '\u0301', '\u0308', '\u0327')
    val rng = new scala.util.Random(42)
    val strings = (0 until 200).map { i =>
      (0 until rng.nextInt(20)).map { _ =>
        if (rng.nextBoolean()) ('a' + rng.nextInt(26)).toChar
        else marks(rng.nextInt(marks.size))
      }.mkString
    }
    val got = strings.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), TextOps.nfcNormalize(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    strings.zipWithIndex.foreach { case (t, i) =>
      val expect = java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC)
      assert(got(i.toLong) == expect, s"mismatch on ${t.map(_.toInt.toHexString)}")
    }
  }

  test("stays inside whole-stage codegen over a file-backed scan") {
    val dir = java.nio.file.Files.createTempDirectory("nfc-wscg").toString
    Seq((decomposed, 1L)).toDF("text", "id").write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir)
      .select(TextOps.nfcNormalize(col("text")).as("t"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"expected WSCG span, got:\n$plan")
  }

  test("SQL surface: nfc_normalize registered via extensions") {
    val n = spark.sql(s"SELECT nfc_normalize('café') = nfc_normalize('café') AS eq")
      .collect()(0).getBoolean(0)
    assert(n)
  }
}
