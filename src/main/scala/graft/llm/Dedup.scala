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

  /** Spread a narrow input across the cluster before CPU-heavy per-row
    * work. A small corpus often arrives as ONE parquet file = one
    * partition, serializing shingling/hashing onto a single core; at real
    * scale inputs arrive pre-split and this is a no-op. */
  private[llm] def parallelize(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }

  /** Exact dedup: canonical duplicate-group id = md5 of the raw text; the
    * survivor is the lowest doc id per group (deterministic). One shuffle
    * on the 128-bit text hash — never on the text bytes themselves. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol).asc)
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Word n-gram shingle set as an array column (lowercased, whitespace
    * tokenized). Native codegen expression — one pass per row; the
    * composable higher-order form it replaced kept ArrayTransform's
    * interpreted per-element dispatch on every shingle pipeline's hot
    * path (measured as the dominant cost of contamination/near-dedup). */
  def shingles(textCol: Column, n: Int = 3): Column =
    graft.functions.TextOps.wordShingles(textCol, n)

  /** The original composable form, kept as the semantic reference the
    * native expression is property-tested against. */
  private[graft] def shinglesComposable(textCol: Column, n: Int = 3): Column = {
    val words = split(lower(trim(textCol)), "\\s+")
    when(size(words) >= n,
      array_distinct(transform(
        sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + 1, lit(n))))))
      .otherwise(array(concat_ws(" ", words)))
  }

  /** MinHash signature: one row per doc with mh_0..mh_{k-1} columns,
    * mh_h = min over shingles of xxhash64(h, shingle) — k independent hash
    * families via the seed-column trick.
    *
    * Shape matters: shingles EXPLODE first, then a single hash aggregate
    * computes all k mins. Computing k `transform`s over a shingle-array
    * column instead looks equivalent but lets Catalyst's projection
    * collapse inline the (expensive) shingling expression into every one
    * of the k columns — a k× slowdown measured at 64×. The explode shape
    * shingles each doc exactly once, and the k mins partial-aggregate
    * map-side, so the only shuffle carries k longs per doc per partition.
    */
  def minhashSignature(docs: DataFrame, idCol: String, textCol: String,
                       numHashes: Int = 64, shingleSize: Int = 3): DataFrame = {
    val ex = parallelize(docs).select(col(idCol),
      explode(shingles(col(textCol), shingleSize)).as("__sh"))
      // two-hash trick: hash the shingle string twice, derive the k
      // families as h1 XOR rotl(h2, i) — k× fewer string hashes, same
      // S-curve, and bitwise mixing never overflows under ANSI mode
      // (Spark 4 default) the way Kirsch-Mitzenmacher h1 + i·h2 does
      .select(col(idCol), xxhash64(col("__sh")).as("__h1"),
              xxhash64(lit(1), col("__sh")).as("__h2"))
    require(numHashes <= 64, "rotate-mix derivation supports at most 64 families")
    def rotl(c: Column, i: Int): Column =
      if (i == 0) c else shiftleft(c, i).bitwiseOR(shiftrightunsigned(c, 64 - i))
    val mins = (0 until numHashes).map(h =>
      min(col("__h1").bitwiseXOR(rotl(col("__h2"), h))).as(s"mh_$h"))
    ex.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
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
    val sig = minhashSignature(docs, idCol, textCol, numHashes, shingleSize)
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
    * array intersection — pairs only, never all-pairs.
    *
    * With `prefilterDocs` (the default), docs are semi-joined down to the
    * ids the pair set actually mentions BEFORE shingling — for an
    * externally-supplied pair set over a large corpus this is the
    * difference between shingling a handful of docs and all of them.
    * [[nearDedup]] turns it OFF: there the pair set is DERIVED from the
    * docs, and the semi-join would re-run the whole candidate pipeline a
    * second time just to compute the id list (measured net loss). */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame, idCol: String, textCol: String,
                    shingleSize: Int = 3, prefilterDocs: Boolean = true): DataFrame = {
    val base =
      if (!prefilterDocs) docs
      else {
        val wanted = pairs.select(col("ida").as(idCol))
          .union(pairs.select(col("idb").as(idCol))).distinct()
        docs.join(wanted, Seq(idCol), "left_semi")
      }
    val sh = parallelize(base)
      .select(col(idCol).as("__id"), shingles(col(textCol), shingleSize).as("__sh"))
    val inter = size(array_intersect(col("sha"), col("shb"))).cast("double")
    val uni = (size(col("sha")) + size(col("shb"))).cast("double") - inter
    pairs
      .join(sh.withColumnsRenamed(Map("__id" -> "ida", "__sh" -> "sha")), Seq("ida"))
      .join(sh.withColumnsRenamed(Map("__id" -> "idb", "__sh" -> "shb")), Seq("idb"))
      .select(col("ida"), col("idb"), (inter / uni).as("jaccard"))
  }

  /** Distinct character n-grams of whitespace-normalized lowercase
    * text — the shingle unit for scripts WITHOUT word boundaries (CJK,
    * Thai), where [[shingles]]' whitespace split degenerates to whole
    * sentences. Same short-text convention: below n characters the
    * whole text is the one shingle. */
  def charShingles(textCol: Column, n: Int = 3): Column = {
    val t = regexp_replace(lower(trim(textCol)), "\\s+", " ")
    when(length(t) >= n,
      array_distinct(transform(sequence(lit(0), length(t) - n),
        i => t.substr(i + 1, lit(n)))))
      .otherwise(array(t))
  }

  /** Character-n-gram Jaccard pairs via a shingle inverted index — the
    * CJK-capable near-dup detector. One explode + equi-join on the
    * shingle value builds intersection counts (pairs form only inside
    * shared-shingle buckets, like every banded operator here), then set
    * sizes close the Jaccard. `maxDf` drops stop-grams whose bucket
    * would otherwise quadratically dominate — the same df-cap contract
    * as [[containmentPairs]]; a dropped gram can only LOWER a pair's
    * computed intersection, so the threshold stays conservative. */
  def charJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, threshold: Double = 0.6,
                       maxDf: Long = Long.MaxValue): DataFrame = {
    val sh = parallelize(docs)
      .select(col(idCol).as("__id"), charShingles(col(textCol), n).as("__sh"))
    val sizes = sh.select(col("__id"), size(col("__sh")).as("__n"))
    val inv0 = sh.select(col("__id"), explode(col("__sh")).as("__g"))
    val inv = (if (maxDf == Long.MaxValue) inv0
      else {
        val df = inv0.groupBy("__g").agg(count(lit(1)).as("__df"))
        inv0.join(df.filter(col("__df") <= maxDf).select("__g"), Seq("__g"))
      }).select("__id", "__g")
    val inter = inv.toDF("ida", "ga").join(inv.toDF("idb", "gb"),
        col("ga") === col("gb") && col("ida") < col("idb"))
      .groupBy("ida", "idb").agg(count(lit(1)).as("__inter"))
    val j = col("__inter").cast("double") /
      (col("__na") + col("__nb") - col("__inter")).cast("double")
    inter
      .join(sizes.toDF("ida", "__na"), Seq("ida"))
      .join(sizes.toDF("idb", "__nb"), Seq("idb"))
      .filter(j >= threshold)
      .select(col("ida"), col("idb"), round(j, 6).as("jaccard"))
  }

  /** Candidate pairs by shared normalized text prefix — the sound
    * blocking key for the suffix-edit duplicate family (boilerplate or
    * tracking tails appended to an otherwise-identical page, the common
    * scraped-web case). Any pair differing only after `prefixLen`
    * normalized characters lands in the same bucket by construction, so
    * unlike probabilistic banding this generator has recall exactly 1
    * on that family. One shuffle on the prefix hash; bucket width is
    * the identical-prefix family size, never corpus size. */
  def prefixCandidates(docs: DataFrame, idCol: String, textCol: String,
                       prefixLen: Int = 32): DataFrame = {
    val key = md5(substring(lower(trim(col(textCol))), 1, prefixLen))
    val a = docs.select(col(idCol).as("ida"), key.as("__k"))
    val b = docs.select(col(idCol).as("idb"), key.as("__k"))
    a.join(b, Seq("__k")).filter(col("ida") < col("idb"))
      .select("ida", "idb").distinct()
  }

  /** Verify candidate pairs with exact character-level edit similarity
    * `1 - levenshtein/max(len)` — the precision layer behind ANY
    * candidate generator (prefix blocks, MinHash bands, SimHash bands).
    * Levenshtein is O(len²) per pair, which is exactly why it must
    * never see the corpus: cost is O(|pairs|), and the `prefilterDocs`
    * semi-join (same contract as [[jaccardVerify]]) keeps the text
    * join from scanning docs the pair set never mentions. */
  def editVerify(pairs: DataFrame, docs: DataFrame, idCol: String, textCol: String,
                 minSim: Double, prefilterDocs: Boolean = true): DataFrame = {
    val base =
      if (!prefilterDocs) docs
      else {
        val wanted = pairs.select(col("ida").as(idCol))
          .union(pairs.select(col("idb").as(idCol))).distinct()
        docs.join(wanted, Seq(idCol), "left_semi")
      }
    val t = base.select(col(idCol), col(textCol))
    pairs
      .join(t.toDF("ida", "ta"), Seq("ida"))
      .join(t.toDF("idb", "tb"), Seq("idb"))
      .withColumn("edit_sim",
        round(lit(1.0) - levenshtein(col("ta"), col("tb")).cast("double") /
          greatest(length(col("ta")), length(col("tb"))).cast("double"), 6))
      .filter(col("edit_sim") >= minSim)
      .select("ida", "idb", "edit_sim")
  }

  /** End-to-end MinHash-LSH near-dedup: drop every doc that is a verified
    * near-duplicate (Jaccard ≥ threshold) of a lower-id doc. */
  def nearDedup(docs: DataFrame, idCol: String, textCol: String,
                threshold: Double = 0.8, numHashes: Int = 64, bands: Int = 16,
                shingleSize: Int = 3): DataFrame = {
    // spread once here; the nested stages' own parallelize() is then a no-op
    val d = parallelize(docs)
    val cand = candidatePairs(minhashBands(d, idCol, textCol, numHashes, bands, shingleSize), idCol)
    val dupIds = jaccardVerify(cand, d, idCol, textCol, shingleSize, prefilterDocs = false)
      .filter(col("jaccard") >= threshold)
      .select(col("idb").as(idCol)).distinct()
    docs.join(dupIds, Seq(idCol), "left_anti")
  }

  /** Incremental near-dedup: drop NEW docs that are near-duplicates of
    * an EXISTING corpus — the production cadence shape (each ingest
    * batch screens against the accumulated corpus; the corpus is never
    * re-clustered). Ids must be globally unique across both frames.
    *
    * Scale shape: the batch and the corpus each reduce to LSH band keys;
    * candidates form in ONE equi-join on (band, bandHash) — cost is
    * O(batch bands) probing the corpus index, never batch × corpus. The
    * corpus TEXT is touched only for candidate verification, and
    * `jaccardVerify`'s prefilter semi-joins it down to the mentioned ids
    * first. A long-lived deployment persists the corpus band index and
    * appends each batch's bands to it, making the per-batch cost
    * independent of corpus age. Batch-internal duplicates are NOT
    * dropped here (run [[nearDedup]]/[[graft.llm.Clusters.dedupByCluster]]
    * within the batch for that). */
  def nearDedupIncremental(newDocs: DataFrame, corpus: DataFrame, idCol: String,
                           textCol: String, threshold: Double = 0.8,
                           numHashes: Int = 64, bands: Int = 16,
                           shingleSize: Int = 3): DataFrame = {
    val nb = minhashBands(parallelize(newDocs), idCol, textCol, numHashes, bands, shingleSize)
      .toDF("ida", "band", "bandHash")
    val cb = minhashBands(parallelize(corpus), idCol, textCol, numHashes, bands, shingleSize)
      .toDF("idb", "band", "bandHash")
    // the candidate set is read twice downstream (the verify join AND the
    // prefilter's id list) — cut the lineage so the two MinHash pipelines
    // above run once, not once per consumer. The prefilter itself is the
    // scale win here: it's what keeps verification from shingling the
    // whole corpus instead of just the candidate ids.
    val cand = nb.join(cb, Seq("band", "bandHash")).select("ida", "idb").distinct()
      .localCheckpoint(false)
    val texts = newDocs.select(col(idCol), col(textCol))
      .unionByName(corpus.select(col(idCol), col(textCol)))
    val dupNew = jaccardVerify(cand, texts, idCol, textCol, shingleSize)
      .filter(col("jaccard") >= threshold)
      .select(col("ida").as(idCol)).distinct()
    newDocs.join(dupNew, Seq(idCol), "left_anti")
  }

  /** Eval-set decontamination: for every (train doc, eval doc) pair,
    * the fraction of the EVAL doc's n-gram set that also appears in the
    * train doc — the standard overlap test for benchmark leakage into
    * training corpora. Returns pairs at or above `threshold`.
    *
    * Shape: both corpora explode to (id, shingle) and meet in ONE
    * equi-join keyed on the shingle — cost O(shared shingles), never
    * |train|×|eval|. The eval side is benchmarks (small) and broadcastable;
    * the train side streams through at any corpus size. `maxShingleDf > 0`
    * drops shingles appearing in more than that many TRAIN docs first
    * (boilerplate n-grams like "of the and" otherwise dominate the join
    * and carry no contamination signal) — at web scale this cap is also
    * what bounds join skew. */
  def contamination(train: DataFrame, trainId: String, eval: DataFrame, evalId: String,
                    textCol: String, shingleSize: Int = 3, threshold: Double = 0.5,
                    maxShingleDf: Int = 0, broadcastEval: Boolean = true): DataFrame = {
    val trainSh0 = parallelize(train).select(col(trainId).as("train_id"),
      explode(shingles(col(textCol), shingleSize)).as("__sh"))
    val trainSh =
      if (maxShingleDf <= 0) trainSh0
      else {
        val df_ = trainSh0.groupBy("__sh")
          .agg(count(lit(1)).as("__df")).filter(col("__df") <= maxShingleDf)
        trainSh0.join(df_.select("__sh"), Seq("__sh"))
      }
    // the explode takes the shingle expression INLINE (matching
    // minhashSignature): exploding a previously-named array column makes
    // InferFiltersFromGenerate bolt a size/isnotnull filter onto the
    // interpreted higher-order shingle expression — measured 8× slower on
    // the small side than this shape. Eval set sizes come back afterwards
    // via a broadcast join on the (tiny) eval id.
    val evalExp = parallelize(eval).select(col(evalId).as("eval_id"),
      explode(shingles(col(textCol), shingleSize)).as("__sh"))
    val evalN = eval.select(col(evalId).as("eval_id"),
      size(shingles(col(textCol), shingleSize)).as("__en"))
    // eval is normally the benchmark suite — thousands of docs, small by
    // construction — so its exploded shingles broadcast and the train
    // side (the 100 TB side) streams through a hash join without ever
    // shuffling. Without the hint Spark sees an explode with unknown
    // cardinality and falls back to a sort-merge join that shuffles
    // every (train_id, shingle) row. For an eval corpus too large to
    // broadcast (exploded shingles approach the multi-GB broadcast
    // ceiling), pass broadcastEval = false to keep the optimizer's
    // shuffled join instead of a driver OOM.
    trainSh.join(if (broadcastEval) broadcast(evalExp) else evalExp, Seq("__sh"))
      .groupBy("train_id", "eval_id")
      .agg(count(lit(1)).as("__hits"))
      .join(broadcast(evalN), Seq("eval_id"))
      .withColumn("overlap_frac", col("__hits").cast("double") / col("__en").cast("double"))
      .filter(col("overlap_frac") >= threshold)
      .select("train_id", "eval_id", "overlap_frac")
  }

  /** Containment near-dup pairs: `|sh(A) ∩ sh(B)| / min(|sh(A)|, |sh(B)|)`
    * — catches a small document embedded verbatim in a larger one (quoted
    * articles, boilerplate-wrapped reposts), which Jaccard structurally
    * misses: a 100-shingle doc inside a 2000-shingle doc has containment
    * 1.0 but Jaccard 0.05, far below any near-dup threshold, so
    * [[nearDedup]]'s banding never surfaces the pair.
    *
    * Shape: corpus self-join on shingles with a document-frequency cap —
    * the same equi-join skeleton as [[contamination]] turned inward. The
    * cap is THE scale guardrail: self-join fan-out is Σ df² over kept
    * shingles, which the cap bounds by `maxShingleDf · Σ df` (linear in
    * corpus shingle volume); an uncapped self-join on a boilerplate
    * shingle is the quadratic blowup. Trade-off, stated: hits are counted
    * over capped shingles while sizes count ALL shingles, so containment
    * is UNDERESTIMATED for pairs whose overlap is mostly
    * boilerplate-grade shingles — the conservative direction for a
    * dedup-candidate generator feeding an exact verifier. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       threshold: Double = 0.8, shingleSize: Int = 3,
                       maxShingleDf: Int = 100): DataFrame = {
    require(threshold > 0.0, "a zero threshold keeps every colliding pair")
    require(maxShingleDf > 0, "the self-join needs a document-frequency cap")
    val exp = parallelize(docs).select(col(idCol).as("__id"),
      explode(shingles(col(textCol), shingleSize)).as("__sh"))
    val kept = exp.join(
      exp.groupBy("__sh").agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxShingleDf).select("__sh"),
      Seq("__sh"))
    val sizes = docs.select(col(idCol).as("__id"),
      size(shingles(col(textCol), shingleSize)).as("__n"))
    kept.as("a").join(kept.as("b"),
        col("a.__sh") === col("b.__sh") && col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .agg(count(lit(1)).as("__hits"))
      // sizes is corpus-wide (one row per doc) — NOT broadcast-hinted:
      // at scale it exceeds any broadcast budget, and the surviving-pairs
      // side is the small one anyway (AQE picks the build side at runtime)
      .join(sizes.select(col("__id").as("id_a"), col("__n").as("__na")), Seq("id_a"))
      .join(sizes.select(col("__id").as("id_b"), col("__n").as("__nb")), Seq("id_b"))
      .withColumn("containment",
        round(col("__hits").cast("double") /
              least(col("__na"), col("__nb")).cast("double"), 6))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("containment"))
  }

  /** SimHash per doc: sign-sum of word-hash bits, weighted by term
    * frequency. `bits` conditional sums in one hash aggregate — no UDF,
    * one shuffle on the doc id.
    *
    * `wordHash` is the per-token 64-bit hash; the xxhash64 default is the
    * fast in-engine choice. [[portableWordHash]] (md5-derived, 60 usable
    * bits) produces identical values in any engine with a standard md5 —
    * pass it with `bits = 60` when the result must be replayable outside
    * Spark (the correctness oracle does exactly that). */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
              bits: Int = 64, wordHash: Column => Column = xxhash64(_)): DataFrame = {
    require(bits >= 1 && bits <= 64, "bits must be in 1..64")
    val words = parallelize(docs).select(col(idCol),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("__w"))
      .withColumn("__h", wordHash(col("__w")))
    val bitSums = (0 until bits).map { j =>
      sum(when(shiftright(col("__h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b_$j")
    }
    val sums = words.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until bits).map { j =>
      when(col(s"b_$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce[Column](_.bitwiseOR(_))
    sums.select(col(idCol), sim.as("simhash"))
  }

  /** Engine-neutral 60-bit token hash: the first 15 hex chars of md5,
    * parsed as an integer. Any engine with a standard md5 reproduces it
    * bit-for-bit (DuckDB: `CAST('0x' || substr(md5(w), 1, 15) AS
    * BIGINT)`); 15 hex digits keep the value positive in a signed 64-bit
    * lane on both sides. */
  def portableWordHash(w: Column): Column =
    conv(substring(md5(w), 1, 15), 16, 10).cast("long")

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Block count for [[simhashPairs]] banding, sized so the EXPECTED band
    * bucket population stays near `targetBucketSize` as the corpus grows —
    * the same sizing contract as `Similarity.autoPlanes`.
    *
    * With `b` blocks over a `bits`-bit hash, a band key concatenates
    * `b − maxHamming` blocks ⇒ key width ≈ `(b − maxHamming)·⌊bits/b⌋`
    * and table count C(b, maxHamming) (Manku, Jain, Sarma, "Detecting
    * Near-Duplicates for Web Crawling", WWW'07 §3). The naive 4×16-bit
    * split keys on ONE 16-bit block — 65,536 buckets total, so at 10⁸ docs
    * every bucket holds O(N/2¹⁶) members and the in-bucket self-join goes
    * quadratic. Widening the key is the fix: b=6/h=3 keys on ~31 bits
    * (2 × 10⁹ buckets) at the price of 20 band tables instead of 4.
    * Returns the smallest b whose expected population meets the target,
    * bounded by `maxTables` explode cost. */
  def simhashBlocks(corpusSize: Long, maxHamming: Int = 3, bits: Int = 64,
                    targetBucketSize: Long = 1024L, maxTables: Int = 64): Int = {
    require(maxHamming >= 1 && bits > maxHamming, "need bits > maxHamming >= 1")
    require(targetBucketSize > 0)
    def choose(n: Int, k: Int): Long =
      (1 to k).foldLeft(1L)((acc, i) => acc * (n - i + 1) / i)
    def keyBits(b: Int): Int = (bits / b) * (b - maxHamming)
    def popOk(b: Int): Boolean =
      corpusSize.toDouble / math.pow(2.0, math.min(62, keyBits(b))) <= targetBucketSize.toDouble
    var b = maxHamming + 1
    while (!popOk(b) && b + 1 <= bits / 2 && choose(b + 1, maxHamming) <= maxTables) b += 1
    b
  }

  /** Banded index over precomputed signatures: one row per (row, band)
    * with the band key the signature files under. `sims` must carry a
    * `simhash` column; `blocks` from [[simhashBlocks]]. Every pair within
    * hamming ≤ maxHamming shares at least one (band, bandHash) by
    * pigeonhole — maxHamming flips touch at most maxHamming blocks, so
    * some combination of `blocks − maxHamming` blocks is untouched, and
    * ALL (blocks − maxHamming)-subsets are band tables, so that untouched
    * combination is one of them. */
  def simhashIndexOf(sims: DataFrame, idCol: String,
                     maxHamming: Int = 3, bits: Int = 64,
                     blocks: Int = 6): DataFrame = {
    require(blocks >= maxHamming + 1, s"need blocks >= maxHamming+1, got $blocks")
    require(blocks <= bits, s"need blocks <= bits")
    val base = bits / blocks
    val extra = bits % blocks
    val widths = (0 until blocks).map(i => base + (if (i < extra) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _).init
    def blockVal(i: Int): Column =
      shiftright(col("simhash"), offsets(i)).bitwiseAND(lit((1L << widths(i)) - 1L))
    val bands = (0 until blocks).combinations(blocks - maxHamming).toSeq
      .zipWithIndex.map { case (combo, k) =>
        val key = combo.foldLeft(lit(0L): Column)((acc, i) =>
          shiftleft(acc, widths(i)).bitwiseOR(blockVal(i)))
        struct(lit(k).as("band"), key.as("bandHash"))
      }
    sims.select(col(idCol), col("simhash"), explode(array(bands: _*)).as("__b"))
      .select(col(idCol), col("simhash"),
              col("__b.band").as("band"), col("__b.bandHash").as("bandHash"))
  }

  /** Banded SimHash index computed from raw text — [[simhash]] then
    * [[simhashIndexOf]]. */
  def simhashIndex(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, bits: Int = 64,
                   wordHash: Column => Column = xxhash64(_),
                   blocks: Int = 6): DataFrame =
    simhashIndexOf(simhash(docs, idCol, textCol, bits, wordHash), idCol,
      maxHamming, bits, blocks)

  /** Per-band bucket populations and their candidate-pair volume — the
    * observability hook for the quadratic-bucket risk (the
    * `Similarity.bucketStats` contract). */
  def simhashBandStats(index: DataFrame): DataFrame =
    index.groupBy("band", "bandHash").agg(count(lit(1)).as("n"))
      .withColumn("candidate_pairs", col("n") * (col("n") - 1) / 2)

  /** Near-dup pairs over precomputed signatures: banded candidates (never
    * all-pairs) verified by exact hamming ≤ maxHamming. With `blocks` from
    * [[simhashBlocks]] recall is EXACT — every qualifying pair shares a
    * band by pigeonhole — so banding changes cost, not answers
    * (`dedup_simhash_pairs` proves it against an all-pairs oracle).
    *
    * `maxBucket > 0` caps each band bucket at its lowest-id members before
    * the self-join — the deterministic degenerate-bucket guard (capping
    * DROPS candidates; pair with [[simhashBandStats]] to see what). */
  def simhashPairsFromSignatures(sims: DataFrame, idCol: String,
                                 maxHamming: Int = 3, bits: Int = 64,
                                 blocks: Int = 6, maxBucket: Int = 0): DataFrame = {
    val idx0 = simhashIndexOf(sims, idCol, maxHamming, bits, blocks)
    val idx =
      if (maxBucket <= 0) idx0
      else {
        val w = Window.partitionBy("band", "bandHash").orderBy(col(idCol).asc)
        idx0.withColumn("__bn", row_number().over(w))
          .filter(col("__bn") <= maxBucket).drop("__bn")
      }
    val a = idx.toDF("ida", "sima", "band", "bandHash")
    val bt = idx.toDF("idb", "simb", "band", "bandHash")
    a.join(bt, Seq("band", "bandHash")).filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb"), hamming(col("sima"), col("simb")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Shared candidate generator of [[frameClipPairs]] and
    * [[frameClipSpans]]: df-capped inverted-index self-join on the
    * frame hash — only frames SHARING a signature ever meet. Columns:
    * `(ida, idb, offset, fa)`, ida < idb. */
  private def frameClipCandidates(frames: DataFrame, idCol: String,
                                  frameCol: String, hashCol: String,
                                  maxHashDf: Int): DataFrame = {
    val base = frames.select(col(idCol).cast("long").as("id"),
      col(frameCol).cast("long").as("f"), col(hashCol).as("h"))
    val kept =
      if (maxHashDf <= 0) base
      else {
        val df = base.groupBy("h").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= maxHashDf).select("h")
        base.join(df, Seq("h")) // inner: stop-hashes vanish entirely
      }
    val norm = kept.select(col("h"), col("id"), col("f")) // both branches → one column order
    val a = norm.toDF("h", "ida", "fa")
    val b = norm.toDF("h", "idb", "fb")
    a.join(b, Seq("h")).filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb"), (col("fa") - col("fb")).as("offset"), col("fa"))
  }

  /** Embedded-CLIP detection over per-frame signatures (the temporal
    * analog of winnowing's shared-fingerprint evidence): a video that
    * CONTAINS a segment of another shares frame hashes at ONE consistent
    * temporal offset, even when whole-stream fingerprints disagree —
    * exactly the case [[simhashPairsFromSignatures]] over
    * [[graft.llm.Multimodal.videoFingerprint]] misses. Input is any
    * `(id, frame_index, hash)` relation (e.g.
    * [[graft.llm.Multimodal.videoFramePhash]]).
    *
    * Method — the standard temporal-alignment vote of video copy
    * detection (Hough transform over (pair, offset), cf. Douze et al.
    * CIVR'09, public literature): inverted-index self-join on the frame
    * hash (never all-pairs — only frames sharing a signature meet),
    * `offset = frame_a − frame_b` per candidate, then one count per
    * `(ida, idb, offset)` cell; a genuine embedded clip votes `length`
    * times into one cell while chance collisions scatter. Emits cells
    * with ≥ `minFrames` distinct matched frames.
    *
    * Scale shape (100 TB): the join is keyed by hash — co-partitioned,
    * no broadcast of either side needed; `maxHashDf > 0` drops hashes
    * occurring in more than that many frames corpus-wide BEFORE the
    * self-join (the df-cap/stop-hash guard every banded family here
    * uses — a black-frame hash shared by every video would otherwise go
    * quadratic). Capping DROPS evidence deterministically (whole hash,
    * not per-bucket prefix), so the DuckDB oracle can replay it. */
  def frameClipPairs(frames: DataFrame, idCol: String, frameCol: String,
                     hashCol: String, minFrames: Int,
                     maxHashDf: Int = 0): DataFrame = {
    require(minFrames >= 1, "minFrames must be positive")
    frameClipCandidates(frames, idCol, frameCol, hashCol, maxHashDf)
      .groupBy(col("ida"), col("idb"), col("offset"))
      .agg(countDistinct(col("fa")).as("matched_frames"))
      .filter(col("matched_frames") >= minFrames)
  }

  /** Embedded-clip LOCALIZATION — the video twin of the text family's
    * span-level dedup ([[substringDupSpans]]/[[removeDupSpans]] find
    * WHERE the copied characters sit; this finds WHERE the copied
    * frames sit):
    * for each aligned (pair, offset) cell of [[frameClipPairs]]'
    * candidates, the maximal CONSECUTIVE runs of matched frames, via
    * the classic gaps-and-islands grouping (`frame − row_number()` is
    * constant exactly along a consecutive run). Emits one row per run
    * of ≥ `minRun` frames: `(ida, idb, offset, start_frame, run_len)`,
    * `start_frame` in the lower id's coordinates — the bounds an
    * excision or review step needs, which the count-based vote cannot
    * give (a 17-frame clip and 17 scattered coincidences count the
    * same; only one is a RUN).
    *
    * Frame indexes must be consecutive integers (everyNth = 1) for run
    * semantics to mean contiguity — for sampled frames use the vote
    * ([[frameClipPairs]]), which is sampling-agnostic. Scale shape: the
    * candidate join is [[frameClipPairs]]' hash-keyed inverted index
    * verbatim (with the same `maxHashDf` stop-hash cap); the window
    * partitions by (pair, offset) — candidate cells only, never the
    * corpus. */
  def frameClipSpans(frames: DataFrame, idCol: String, frameCol: String,
                     hashCol: String, minRun: Int,
                     maxHashDf: Int = 0): DataFrame = {
    require(minRun >= 1, "minRun must be positive")
    val cells = frameClipCandidates(frames, idCol, frameCol, hashCol, maxHashDf)
      .dropDuplicates("ida", "idb", "offset", "fa")
    val w = Window.partitionBy("ida", "idb", "offset").orderBy(col("fa").asc)
    cells.withColumn("__grp", col("fa") - row_number().over(w))
      .groupBy(col("ida"), col("idb"), col("offset"), col("__grp"))
      .agg(min(col("fa")).as("start_frame"), count(lit(1)).as("run_len"))
      .filter(col("run_len") >= minRun)
      .drop("__grp")
  }

  /** SimHash near-dup pairs from raw text — [[simhash]] then
    * [[simhashPairsFromSignatures]].
    *
    * Block-count resolution: explicit `blocks` wins; else `corpusSize > 0`
    * sizes via [[simhashBlocks]] with no job; else (both defaulted) the
    * corpus is COUNTED — one eager full pass over `docs`, re-run on every
    * call. When the input pipeline is expensive, pass a known `corpusSize`
    * (approximate is fine — sizing needs only the order of magnitude) or
    * cache `docs` first. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, bits: Int = 64,
                   wordHash: Column => Column = xxhash64(_),
                   blocks: Int = 0, targetBucketSize: Long = 1024L,
                   maxBucket: Int = 0, corpusSize: Long = 0L): DataFrame = {
    val b = if (blocks > 0) blocks
            else simhashBlocks(if (corpusSize > 0) corpusSize else docs.count(),
              maxHamming, bits, targetBucketSize)
    simhashPairsFromSignatures(simhash(docs, idCol, textCol, bits, wordHash),
      idCol, maxHamming, bits, b, maxBucket)
  }

  /** Exact-substring duplicate-SPAN detection (the character-level
    * "dedup makes LMs better" operator — Lee et al. ACL'22 mark every
    * substring of length ≥ k that occurs twice anywhere in the corpus,
    * including twice within ONE document, then excise the spans; this
    * computes those spans and per-doc coverage stats).
    *
    * Method: every char position opens one k-gram; a k-gram occurring
    * ≥ 2 times corpus-wide is duplicated; a maximal run of duplicated
    * positions (overlapping OR adjacent windows union into one
    * interval) is a span. Span merge is the classic gaps-and-islands
    * window: a position opens a new island iff it starts past
    * `max(prev position + k - 1) + 1`.
    *
    * Grouping is on the RAW k-gram string, not a hash — a hash would be
    * engine-specific (Spark xxhash64 ≠ DuckDB hash) and a collision
    * would mark a false span; only (id, pos, gram) projections ever
    * shuffle, never whole documents. Returns one row per input doc:
    * `(id, n_dup_spans, dup_chars, dup_frac)` with `dup_frac`
    * floor-quantized to ppm (`(chars·10^6) div len`) so the fraction is
    * rounding-mode-independent across engines (round-half-up vs
    * half-even diverge on exact 6-decimal ties; integral division
    * cannot).
    *
    * Scale: the gram explode is O(total chars) rows of ~(8+4+k) bytes —
    * the dominant shuffle. At 100 TB run the count pass first over
    * k-gram HASHES only (8-byte rows, map-side combined), broadcast-or
    * join the surviving duplicated hash set back, and only then
    * materialize raw grams for the survivors to confirm equality; or
    * reduce positions ~2/(w+1)× with winnowing fingerprints (Schleimer
    * et al. SIGMOD'03) at the cost of span-boundary resolution. The
    * suffix-array formulation (Lee et al.'s own) trades this shuffle
    * for a global sort — same asymptotics, worse constants on Spark. */
  /** Engine-neutral content hash of a gram (top `hexDigits` hex digits
    * of md5, 4 bits each) — replayable as
    * `CAST('0x'||substr(md5(g),1,hexDigits) AS BIGINT)`, the same
    * portability contract as [[portableWordHash]]. */
  def portableGramHash(g: Column, hexDigits: Int = 15): Column =
    conv(substring(md5(g), 1, hexDigits), 16, 10).cast("long")

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken SIGMOD'03 — the
    * MOSS algorithm): slide a window of `w` consecutive k-gram hashes
    * and keep each window's MINIMUM (ties → rightmost position). The
    * guarantee: any shared substring of length ≥ w+k−1 between two
    * documents yields at least one shared fingerprint, while only
    * ~2/(w+1) of positions are kept — this is the documented sub-linear
    * candidate path for [[substringDupSpans]] at corpus scale.
    *
    * Selection is a window MIN over the composite order (hash asc,
    * pos desc) — and because window aggregates run OUTSIDE whole-stage
    * codegen, the composite is PACKED into one BIGINT
    * (`hash40 · 2^20 + (2^20−1 − pos)`) instead of a struct: a 40-bit
    * [[portableGramHash]] plus a 2^20-char position budget per doc
    * (violations raise, never truncate). A primitive long min is ~2×
    * the throughput of per-row struct allocation in the sliding frame,
    * and the same (hash, rightmost-pos) selection is recovered
    * arithmetically. 40-bit fingerprint values collide at ~1e-12 per
    * pair — and identically in every engine, so oracle replay is exact
    * regardless. Returns `(idCol, pos, fp)`. */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = 16, w: Int = 8): DataFrame = {
    require(k >= 2 && w >= 1, s"need k >= 2 and w >= 1, got k=$k w=$w")
    val PosBudget = 1 << 20
    val t = docs.select(col(idCol).as("__id"),
      coalesce(col(textCol), lit("")).as("__t"))
    val grams = t.where(length(col("__t")) >= k + w - 1)
      .select(col("__id"),
        explode(sequence(lit(1), length(col("__t")) - (k - 1))).as("__pos"),
        col("__t"))
      .select(col("__id"),
        when(col("__pos") < PosBudget,
            portableGramHash(col("__t").substr(col("__pos"), lit(k)), 10) *
              lit(PosBudget.toLong) + (lit(PosBudget - 1L) - col("__pos")))
          .otherwise(raise_error(lit(
            s"winnowFingerprints: document exceeds $PosBudget chars — raise the position budget")))
          .as("__packed"),
        (length(col("__t")) - (k - 1)).as("__n"),
        col("__pos"))
    val win = Window.partitionBy("__id").orderBy("__pos").rowsBetween(0, w - 1)
    val ordered = Window.partitionBy("__id").orderBy("__pos")
    grams
      .withColumn("__sel", min(col("__packed")).over(win))
      // only FULL windows select (a start s has w grams iff s <= n-w+1)
      .where(col("__pos") <= col("__n") - (w - 1))
      // adjacent windows mostly re-select the same fingerprint — drop
      // the runs with a lag over the SAME sorted partition (no extra
      // exchange) so the distinct shuffles ~2n/(w+1) rows, not n; the
      // distinct still catches re-selection by NON-adjacent windows
      .withColumn("__prev", lag(col("__sel"), 1).over(ordered))
      .where(col("__prev").isNull || col("__sel") =!= col("__prev"))
      .select(col("__id"),
        (lit(PosBudget - 1L) - pmod(col("__sel"), lit(PosBudget.toLong))).as("pos"),
        expr(s"__sel div ${PosBudget}L").as("fp"))
      .distinct()
      .select(col("__id").as(idCol), col("pos"), col("fp"))
  }

  /** MOSS-style duplicate-candidate pairs: documents sharing at least
    * `minShared` winnowing fingerprint VALUES. The fingerprint join is
    * the only shuffle beyond winnowing itself, and it is equi-join on
    * the 60-bit value — candidates only form inside a fingerprint
    * collision group, never all-pairs (the same guardrail shape as the
    * MinHash band join). `maxFpDf` drops fingerprints shared by more
    * than that many docs first — boilerplate killers, same role as
    * [[containmentPairs]]' df cap. */
  def winnowedPairs(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 16, w: Int = 8, minShared: Int = 2,
                    maxFpDf: Int = 100): DataFrame = {
    val fps = winnowFingerprints(docs, idCol, textCol, k, w)
      .select(col(idCol).as("__id"), col("fp")).distinct()
      .localCheckpoint(false)
    val df = fps.groupBy("fp").agg(count(lit(1)).as("__df"))
    val kept = fps.join(df.where(col("__df") <= maxFpDf).select("fp"), "fp")
    kept.toDF("fp", "ida").join(kept.toDF("fp", "idb"), Seq("fp"))
      .where(col("ida") < col("idb"))
      .groupBy("ida", "idb").agg(count(lit(1)).as("shared_fps"))
      .where(col("shared_fps") >= minShared)
  }

  /** The shared island algebra behind [[substringDupSpans]] and
    * [[removeDupSpans]]: merged maximal duplicated-char spans
    * (__id, __isl, __s, __e), 1-based inclusive, from the k-gram
    * corpus count + position join + gaps-and-islands window. `t` must
    * carry (__id, __t). */
  private[llm] def dupIslands(t: DataFrame, k: Int): DataFrame = {
    // one gram per char position; cut lineage — grams feed BOTH the
    // corpus-wide count and the position join (unigramNegLogProb idiom)
    val grams = t.where(length(col("__t")) >= k)
      .select(col("__id"),
        explode(sequence(lit(1), length(col("__t")) - (k - 1))).as("__pos"),
        col("__t"))
      .select(col("__id"), col("__pos"),
        col("__t").substr(col("__pos"), lit(k)).as("__gram"))
      .localCheckpoint(false)
    val dup = grams.groupBy("__gram").agg(count(lit(1)).as("__n"))
      .where(col("__n") >= 2).select("__gram")
    val hits = grams.join(dup, "__gram").select(col("__id"), col("__pos"))
    val wPrev = Window.partitionBy("__id").orderBy("__pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("__id").orderBy("__pos")
      .rowsBetween(Window.unboundedPreceding, 0)
    hits
      .withColumn("__prevEnd", max(col("__pos") + (k - 1)).over(wPrev))
      .withColumn("__new",
        when(col("__prevEnd").isNull || col("__pos") > col("__prevEnd") + 1, 1)
          .otherwise(0))
      .withColumn("__isl", sum(col("__new")).over(wRun))
      .groupBy("__id", "__isl")
      .agg(min(col("__pos")).as("__s"), (max(col("__pos")) + (k - 1)).as("__e"))
  }

  def substringDupSpans(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 32): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val t = docs.select(col(idCol).as("__id"),
      coalesce(col(textCol), lit("")).as("__t"))
    val islands = dupIslands(t, k)
    val perDoc = islands.groupBy("__id")
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("__e") - col("__s") + 1).cast("long").as("dup_chars"))
    t.select(col("__id"), length(col("__t")).cast("long").as("__len"))
      .join(perDoc, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"),
        when(col("__len") > 0,
          expr("(coalesce(dup_chars, 0L) * 1000000) div __len") / lit(1000000.0))
          .otherwise(lit(0.0)).as("dup_frac"))
  }

  /** Excise every duplicated span — the removal half of Lee et al.
    * ACL'22 ("Deduplicating Training Data Makes Language Models
    * Better"): cut each merged span [[substringDupSpans]] marks and
    * keep the gaps, so duplicated boilerplate vanishes at substring
    * granularity. Marked spans cover EVERY occurrence (the k-gram
    * count has no first-copy exemption), so repeated text disappears
    * from all docs — the survivor-preserving alternative at coarser
    * granularity is [[paragraphDedup]]/[[exact]]. Output one row per
    * doc: (id, text_clean, removed_chars); removed_chars is emergent
    * (len(text) − len(clean)), so it cannot drift from the cut.
    *
    * Scale: the span side is [[dupIslands]]' cost (gram agg + position
    * join + one per-doc window); the cut itself is one groupBy to an
    * array of spans (a doc's island count is bounded by len/k) and a
    * single `aggregate` fold over that array per row — no extra
    * corpus shuffle beyond the reassembly join. */
  def removeDupSpans(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 32): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val t = docs.select(col(idCol).as("__id"),
      coalesce(col(textCol), lit("")).as("__t"))
    val spans = dupIslands(t, k).groupBy("__id")
      .agg(array_sort(collect_list(struct(col("__s"), col("__e")))).as("__spans"))
    t.join(spans, Seq("__id"), "left")
      .select(col("__id"), col("__t"),
        when(col("__spans").isNull, col("__t")).otherwise(
          aggregate(col("__spans"),
            struct(lit("").as("acc"), lit(0L).as("prev")),
            (st, sp) => struct(
              concat(st("acc"), col("__t").substr(
                (st("prev") + 1).cast("int"),
                (sp("__s") - st("prev") - 1).cast("int"))).as("acc"),
              sp("__e").cast("long").as("prev")),
            st => concat(st("acc"), col("__t").substr(
              (st("prev") + 1).cast("int"),
              greatest(length(col("__t")) - st("prev").cast("int"), lit(0))))))
          .as("__clean"))
      .select(col("__id").as(idCol), col("__clean").as("text_clean"),
        (length(col("__t")) - length(col("__clean"))).cast("long").as("removed_chars"))
  }

  /** Paragraph-level exact dedup across the corpus — the CCNet /
    * RefinedWeb "strip repeated boilerplate" stage: split each doc on
    * `sep`, keep the corpus-wide FIRST occurrence (lowest (id, pos)) of
    * every paragraph of at least `minChars` chars, drop later copies,
    * and reassemble each doc from its surviving paragraphs in order.
    * Paragraphs under `minChars` never dedup — blank lines and short
    * headers are document structure, not boilerplate. Output one row
    * per input doc: (id, text_clean, n_kept, n_removed); a doc whose
    * every paragraph was seen earlier comes back with text_clean = "".
    *
    * Scale: one explode to a row per paragraph, first-occurrence
    * selection is a single window over the 128-bit paragraph hash (all
    * copies of a paragraph land in one hash partition; rank 1 is the
    * earliest), reassembly is one groupBy doc collecting the survivors
    * — every stage is O(paragraphs), and paragraph text shuffles at
    * most twice (winner window, reassembly), never joins against
    * itself.
    */
  def paragraphDedup(docs: DataFrame, idCol: String, textCol: String,
      minChars: Int = 30, sep: String = "\n"): DataFrame = {
    val pars = parallelize(docs).select(
      col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("__pos", "__par")))
    val w = Window.partitionBy(md5(col("__par")))
      .orderBy(col(idCol).asc, col("__pos").asc)
    val kept = pars
      .withColumn("__keep",
        length(col("__par")) < minChars || row_number().over(w) === 1)
    kept.groupBy(col(idCol))
      .agg(
        concat_ws(sep, transform(
          array_sort(collect_list(when(col("__keep"),
            struct(col("__pos"), col("__par"))))),
          s => s("__par"))).as("text_clean"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(!col("__keep"), 1L).otherwise(0L)).as("n_removed"))
  }
}
