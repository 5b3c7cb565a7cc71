package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus deduplication for training-data pipelines: exact, MinHash-LSH,
  * SimHash, and n-gram Jaccard. Beyond the reference's surface (its only
  * dedup is keyed ROW_NUMBER, hrm_employee.sql:1-26) — these are the
  * north-star operators (SURVEY.md §7.2-8).
  *
  * Scale design: every method is banded/bucketed — candidate pairs only
  * ever form inside an LSH bucket (same band signature), never via an
  * all-pairs crossJoin. At 100 TB the cost is O(docs × shingles) for
  * signatures plus a shuffle on band keys whose buckets stay small
  * (a bucket is a hash collision group, not a data partition).
  */
object Dedup {

  /** Exact dedup: canonical duplicate-group id = md5 of the raw text; the
    * survivor is the lowest doc id per group (deterministic). One shuffle
    * on the 128-bit text hash — never on the text bytes themselves. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol).asc)
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Word n-gram shingle set as an array column (lowercased, whitespace
    * tokenized). `sequence` + `transform` keep it in codegen — no UDF. */
  def shingles(textCol: Column, n: Int = 3): Column = {
    val words = split(lower(trim(textCol)), "\\s+")
    when(size(words) >= n,
      array_distinct(transform(
        sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + 1, lit(n))))))
      .otherwise(array(concat_ws(" ", words)))
  }

  /** MinHash signature columns: minhash_h = min over shingles of
    * xxhash64(h, shingle). k independent hash families via the seed-column
    * trick (xxhash64 of (family, value) pairs). */
  private def minhashCols(shingleCol: Column, numHashes: Int): Seq[Column] =
    (0 until numHashes).map { h =>
      array_min(transform(shingleCol, s => xxhash64(lit(h), s))).as(s"mh_$h")
    }

  /** MinHash + LSH banding: emits (id, band, bandHash) — one row per doc
    * per band. Docs sharing (band, bandHash) are near-dup candidates.
    *
    * numHashes=64, bands=16 → rows of 4 hashes: the standard S-curve puts
    * the detection knee near Jaccard ≈ (1/16)^(1/4) ≈ 0.5.
    */
  def minhashBands(docs: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    val sig = docs.select(col(idCol), shingles(col(textCol), shingleSize).as("__sh"))
      .select(col(idCol) +: minhashCols(col("__sh"), numHashes): _*)
    val bandStructs = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("bandHash"))
    }
    sig.select(col(idCol), explode(array(bandStructs: _*)).as("__b"))
      .select(col(idCol), col("__b.band"), col("__b.bandHash"))
  }

  /** Candidate near-dup pairs (idA < idB) from shared LSH buckets, deduped
    * across bands. The self-join is keyed on (band, bandHash) — bucket-local
    * by construction. */
  def candidatePairs(bandsDf: DataFrame, idCol: String): DataFrame = {
    val a = bandsDf.toDF("ida", "band", "bandHash")
    val b = bandsDf.toDF("idb", "band", "bandHash")
    a.join(b, Seq("band", "bandHash"))
      .filter(col("ida") < col("idb"))
      .select("ida", "idb").distinct()
  }

  /** Verify candidates with exact n-gram Jaccard (the n-gram Jaccard dedup
    * operator, usable standalone on any pair set). Computed set-wise with
    * array intersection — pairs only, never all-pairs. */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame, idCol: String, textCol: String,
                    shingleSize: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("__id"), shingles(col(textCol), shingleSize).as("__sh"))
    pairs
      .join(sh.withColumnsRenamed(Map("__id" -> "ida", "__sh" -> "sha")), Seq("ida"))
      .join(sh.withColumnsRenamed(Map("__id" -> "idb", "__sh" -> "shb")), Seq("idb"))
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("double"))
      .withColumn("uni", (size(col("sha")) + size(col("shb")) - col("inter")).cast("double"))
      .select(col("ida"), col("idb"), (col("inter") / col("uni")).as("jaccard"))
  }

  /** End-to-end MinHash-LSH near-dedup: drop every doc that is a verified
    * near-duplicate (Jaccard ≥ threshold) of a lower-id doc. */
  def nearDedup(docs: DataFrame, idCol: String, textCol: String,
                threshold: Double = 0.8, numHashes: Int = 64, bands: Int = 16,
                shingleSize: Int = 3): DataFrame = {
    val cand = candidatePairs(minhashBands(docs, idCol, textCol, numHashes, bands, shingleSize), idCol)
    val dupIds = jaccardVerify(cand, docs, idCol, textCol, shingleSize)
      .filter(col("jaccard") >= threshold)
      .select(col("idb").as(idCol)).distinct()
    docs.join(dupIds, Seq(idCol), "left_anti")
  }

  /** 64-bit SimHash per doc: sign-sum of word-hash bits, weighted by term
    * frequency. 64 conditional sums in one hash aggregate — no UDF, one
    * shuffle on the doc id. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = docs.select(col(idCol),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("__w"))
      .withColumn("__h", xxhash64(col("__w")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("__h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b_$j")
    }
    val sums = words.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 64).map { j =>
      when(col(s"b_$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce[Column](_.bitwiseOR(_))
    sums.select(col(idCol), sim.as("simhash"))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidates: band the 64-bit hash into 4×16-bit
    * chunks; any pair agreeing on one chunk (≤3 differing chunks ⇒ hamming
    * ≤ 48 worst-case, but in practice chunk-collision captures hamming ≤ 3
    * pairs with certainty by pigeonhole) is a candidate; verify by exact
    * hamming ≤ maxHamming. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sh = simhash(docs, idCol, textCol)
    val chunks = (0 until 4).map { k =>
      struct(lit(k).as("band"),
        shiftright(col("simhash"), k * 16).bitwiseAND(0xFFFFL).as("bandHash"))
    }
    val banded = sh.select(col(idCol), col("simhash"), explode(array(chunks: _*)).as("__b"))
      .select(col(idCol), col("simhash"), col("__b.band"), col("__b.bandHash"))
    val a = banded.toDF("ida", "sima", "band", "bandHash")
    val b = banded.toDF("idb", "simb", "band", "bandHash")
    a.join(b, Seq("band", "bandHash")).filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb"), hamming(col("sima"), col("simb")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
