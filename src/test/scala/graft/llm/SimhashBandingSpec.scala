package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The Manku-style SimHash banding machinery (Dedup.scala): block-count
  * auto-sizing, variable-width band keys, pigeonhole recall, bucket
  * observability, and the degenerate-bucket cap. The `dedup_simhash_pairs`
  * oracle query proves the end-to-end contract against exact all-pairs
  * hamming in DuckDB; these specs pin the pieces in isolation, including
  * planted worst-case bit patterns no real corpus guarantees.
  */
class SimhashBandingSpec extends SparkSpec {
  import spark.implicits._

  private def simsDf(sims: Seq[(Long, Long)]): DataFrame =
    sims.toDF("id", "simhash")

  private def bruteForcePairs(sims: Seq[(Long, Long)], maxHamming: Int): Set[(Long, Long, Int)] =
    (for {
      (ida, sa) <- sims; (idb, sb) <- sims if ida < idb
      h = java.lang.Long.bitCount(sa ^ sb) if h <= maxHamming
    } yield (ida, idb, h)).toSet

  private def collectPairs(df: DataFrame): Set[(Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("simhashBlocks: floor at maxHamming+1, monotone in corpus size, exact knee") {
    // tiny corpora take the minimum split (the old fixed-b=4 behavior)
    assert(Dedup.simhashBlocks(100L) == 4)
    assert(Dedup.simhashBlocks(1L) == 4)
    // b=4 keys on one 16-bit block: expected population N/2^16 <= 1024
    // holds up to N = 2^26 ≈ 6.7e7; the next corpus size must widen
    assert(Dedup.simhashBlocks(67_000_000L) == 4)
    assert(Dedup.simhashBlocks(100_000_000L) == 5)
    // monotone non-decreasing as the corpus grows
    val sizes = Seq(1L, 1000L, 1000000L, 67000000L, 100000000L, 10000000000L, Long.MaxValue / 2)
    val bs = sizes.map(Dedup.simhashBlocks(_))
    assert(bs == bs.sorted, s"not monotone: $bs")
  }

  test("simhashBlocks: maxTables bounds the C(b, h) explode cost") {
    // C(9,3)=84 > 64 stops growth at b=8 even when the population target
    // is unreachable (the explode cost is the binding constraint)
    assert(Dedup.simhashBlocks(Long.MaxValue / 2, maxTables = 64) == 8)
    // C(7,3)=35 > 20 stops at b=6 (C(6,3)=20 fits exactly)
    assert(Dedup.simhashBlocks(Long.MaxValue / 2, maxTables = 20) == 6)
  }

  test("simhashIndexOf: pigeonhole — planted hamming<=h pairs share a band, h+1 spread pairs need not") {
    // bits=60, blocks=7 → variable widths (four 9-bit + three 8-bit
    // blocks), C(7,3)=35 band tables — the general machinery, not the
    // degenerate even split
    val base = 0x0123456789ABCDL // 56-bit value, fits 60 bits
    def flipped(positions: Int*): Long = positions.foldLeft(base)((v, p) => v ^ (1L << p))
    val worstCases = Seq(
      Seq(0), Seq(59),                  // single flips at the extremes
      Seq(0, 59),                       // two flips, first and last block
      Seq(8, 9, 17),                    // flips hugging block boundaries
      Seq(0, 1, 2),                     // three flips inside ONE block
      Seq(5, 20, 40),                   // three flips in three blocks
      Seq(0, 10, 58))                   // spread across first/second/last
    val sims = (100L, base) +: worstCases.zipWithIndex.map {
      case (pos, i) => (i.toLong, flipped(pos: _*))
    }
    val idx = Dedup.simhashIndexOf(simsDf(sims), "id", maxHamming = 3, bits = 60, blocks = 7)
      .collect().map(r => (r.getLong(0), (r.getInt(2), r.getLong(3))))
    val bandsOf = idx.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    worstCases.indices.foreach { i =>
      assert(bandsOf(100L).intersect(bandsOf(i.toLong)).nonEmpty,
        s"planted pair (base, ${worstCases(i)}) shares no band — pigeonhole violated")
    }
    // negative control: 4 flips in 4 DISTINCT blocks leave only 3
    // untouched blocks < the 4-block band width, so no band can match
    val far = Seq((100L, base), (200L, flipped(0, 10, 20, 55)))
    val fidx = Dedup.simhashIndexOf(simsDf(far), "id", maxHamming = 3, bits = 60, blocks = 7)
      .collect().map(r => (r.getLong(0), (r.getInt(2), r.getLong(3))))
    val fb = fidx.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(fb(100L).intersect(fb(200L)).isEmpty,
      "4 flips across 4 distinct blocks must not share a band")
  }

  test("simhashPairsFromSignatures equals brute-force all-pairs for every block split") {
    // random 60-bit signatures (seeded) + planted near pairs: banding must
    // return exactly the exact-hamming answer at any valid blocks setting
    val rnd = new scala.util.Random(7)
    val mask = (1L << 60) - 1
    val randoms = (0L until 40L).map(i => (i, rnd.nextLong() & mask))
    val planted = Seq(
      (100L, randoms(0)._2),                     // hamming 0 vs id 0
      (101L, randoms(1)._2 ^ (1L << 13)),        // hamming 1 vs id 1
      (102L, randoms(2)._2 ^ (1L << 5) ^ (1L << 45)),          // hamming 2
      (103L, randoms(3)._2 ^ (1L << 0) ^ (1L << 30) ^ (1L << 59))) // hamming 3
    val sims = randoms ++ planted
    val expected = bruteForcePairs(sims, maxHamming = 3)
    assert(expected.size >= 4, "planted pairs missing from the expected set")
    for (b <- 4 to 8) {
      val got = collectPairs(Dedup.simhashPairsFromSignatures(
        simsDf(sims), "id", maxHamming = 3, bits = 60, blocks = b))
      assert(got == expected, s"blocks=$b diverged from exact all-pairs")
    }
  }

  test("simhashBandStats reports bucket populations and candidate-pair volume") {
    // three identical signatures land in the same bucket in EVERY band
    val sims = simsDf(Seq((0L, 42L), (1L, 42L), (2L, 42L)))
    val idx = Dedup.simhashIndexOf(sims, "id", maxHamming = 3, bits = 60, blocks = 5)
    val stats = Dedup.simhashBandStats(idx)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getDouble(3)))
    // C(5,3)=10 band tables, each with one bucket of 3 → 3 candidate pairs
    assert(stats.length == 10)
    assert(stats.forall { case (_, n, pairs) => n == 3 && pairs == 3.0 })
  }

  test("maxBucket caps each bucket at its lowest-id members, deterministically dropping pairs") {
    val sims = simsDf(Seq((0L, 7L), (1L, 7L), (2L, 7L)))
    val uncapped = collectPairs(Dedup.simhashPairsFromSignatures(
      sims, "id", maxHamming = 3, bits = 60, blocks = 5))
    assert(uncapped.map(p => (p._1, p._2)) == Set((0L, 1L), (0L, 2L), (1L, 2L)))
    val capped = collectPairs(Dedup.simhashPairsFromSignatures(
      sims, "id", maxHamming = 3, bits = 60, blocks = 5, maxBucket = 2))
    // every bucket keeps ids {0, 1} (lowest two) → only the (0,1) pair
    assert(capped.map(p => (p._1, p._2)) == Set((0L, 1L)))
  }

  test("simhashPairs: caller-passed corpusSize drives sizing without changing answers") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog tonight"),
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely different text about catalyst optimizer rules")
    ).toDF("doc_id", "text")
    val auto = collectPairs(Dedup.simhashPairs(docs, "doc_id", "text"))
    // tiny corpusSize → auto-sizes to the same b=4 as the counted path
    val hinted = collectPairs(Dedup.simhashPairs(docs, "doc_id", "text", corpusSize = 3L))
    // a large hint widens the split (b=5) — recall is exact either way
    val wide = collectPairs(Dedup.simhashPairs(docs, "doc_id", "text",
      corpusSize = 100_000_000L))
    assert(auto == hinted && auto == wide)
    assert(auto.map(p => (p._1, p._2)) == Set((0L, 1L)))
  }
}
