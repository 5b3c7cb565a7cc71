package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private val K = 16
  private val W = 8

  private def fps(docs: Seq[(Long, String)]): Map[Long, Set[(Long, Long)]] =
    Dedup.winnowFingerprints(docs.toDF("doc_id", "text"), "doc_id", "text", K, W)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).toSet }

  test("winnowing guarantee: a shared substring of length >= w+k-1 yields a shared fingerprint VALUE") {
    val shared = "COMMON RUN OF TWENTY-THREE!" // 27 chars >= 23
    val m = fps(Seq(
      1L -> s"left padding text then $shared and trailing stuff here",
      2L -> s"$shared entirely different surroundings on this one 0123456789"))
    val v1 = m(1L).map(_._2)
    val v2 = m(2L).map(_._2)
    assert(v1.intersect(v2).nonEmpty, "guaranteed shared fingerprint missing")
  }

  test("fingerprint density is ~2/(w+1): far fewer fingerprints than positions") {
    val text = (1 to 60).map(i => s"tok${i * 7 % 97}x").mkString(" ") // ~370 chars, no repeats
    val m = fps(Seq(1L -> text))
    val nPositions = text.length - K + 1
    assert(m(1L).size < nPositions / 2, s"${m(1L).size} fps for $nPositions positions")
    assert(m(1L).nonEmpty)
  }

  test("selection is deterministic and partitioning-invariant") {
    val docs = (0L until 30L).map(i => i -> s"document $i " * 6)
    val df = docs.toDF("doc_id", "text")
    val a = Dedup.winnowFingerprints(df, "doc_id", "text", K, W)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Dedup.winnowFingerprints(df.repartition(11), "doc_id", "text", K, W)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("docs shorter than k+w-1 produce no fingerprints (no partial windows)") {
    val m = fps(Seq(1L -> "x" * (K + W - 2), 2L -> "y" * 60))
    assert(!m.contains(1L) && m.contains(2L))
  }

  test("winnowedPairs finds boilerplate-sharing docs and respects minShared") {
    val boiler = "SHARED BOILERPLATE SENTENCE THAT IS QUITE LONG INDEED OK" // 56 chars
    val docs = Seq(
      1L -> s"alpha unique body one $boiler tail a",
      2L -> s"beta unrelated middle $boiler tail b",
      3L -> "gamma totally unrelated text with nothing in common at all 99887766")
    val pairs = Dedup.winnowedPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
        K, W, minShared = 2, maxFpDf = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("the fingerprint df cap kills fingerprints shared by too many docs") {
    val boiler = "SHARED BOILERPLATE SENTENCE THAT IS QUITE LONG INDEED OK"
    val docs = (1L to 5L).map(i => i -> s"doc number $i body $boiler end")
    val pairs = Dedup.winnowedPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
        K, W, minShared = 2, maxFpDf = 4) // df of boilerplate fps = 5 > 4
      .collect()
    assert(pairs.isEmpty)
  }
}
