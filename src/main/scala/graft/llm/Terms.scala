package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level term statistics: TF-IDF keyword extraction and global
  * n-gram frequency — the feature side of corpus curation (keyword
  * indexes, boilerplate detection, domain-mix dashboards).
  *
  * Scale shape: everything is explode → hash-aggregate. Term counts
  * partial-aggregate map-side, so the shuffle carries (term, count)
  * partials, never raw token streams. The only window is per-doc top-k
  * selection, partitioned on the doc id — the same key the term counts
  * are already clustered by.
  */
object Terms {

  /** Top-k terms per document by smoothed TF-IDF
    * (`tf · (ln((N+1)/(df+1)) + 1)`, the standard smooth-idf so unseen
    * and ubiquitous terms stay finite). Deterministic: ties order by
    * term; `score` is rounded to 4 decimals for cross-engine floats.
    *
    * The corpus size N is counted EAGERLY and embedded as a literal:
    * joining a 1-row aggregate on a constant key looks cheaper but
    * Catalyst folds the trivial condition away and plans a
    * BroadcastNestedLoopJoin (banned in every registered query); the
    * count itself is parquet metadata — no data scan.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String, k: Int = 5): DataFrame = {
    val n = docs.count()
    // spread the (often single-file → single-partition) input before the
    // per-row tokenize+explode — same rationale as Dedup.parallelize
    val words = Dedup.parallelize(docs).select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = words.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    // tf is already distinct per (doc, term): plain count = doc frequency
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(docFreq, "term")
      .withColumn("score",
        col("tf") * (log(lit(n + 1).cast("double") / (col("df") + 1).cast("double")) + 1))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("term").asc)
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .select(col(idCol), col("term"), col("tf"), round(col("score"), 4).as("score"))
  }

  /** Global top-k word n-grams with counts — the boilerplate/duplication
    * radar (a handful of n-grams dominating a web corpus is the classic
    * template-text signal). Deterministic ordering: count desc, ngram asc. */
  def topNgrams(docs: DataFrame, textCol: String, n: Int = 2, k: Int = 100): DataFrame = {
    require(n >= 1, "n must be >= 1")
    // raw occurrence counts — unlike [[Dedup.shingles]] there is no
    // per-doc distinct (a doc repeating a template line should count
    // every repetition) and docs shorter than n words contribute nothing
    val words = split(lower(trim(col(textCol))), "\\s+")
    val grams = when(size(words) >= n,
      transform(sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + 1, lit(n)))))
      .otherwise(array())
    Dedup.parallelize(docs).select(explode(grams).as("ngram"))
      .filter(length(col("ngram")) > 0)
      .groupBy("ngram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram").asc)
      .limit(k)
  }

  /** Per-doc novelty: the fraction of a document's distinct word
    * n-gram shingles that appear in NO other document (global document
    * frequency 1). Low novelty = template/boilerplate material; a
    * curation pass uses it alongside the repetition filters to pick what
    * near-dedup alone misses. Two hash aggregates (shingle df, per-doc
    * mean) — the shingle shuffle carries partials, never text. */
  def noveltyScore(docs: DataFrame, idCol: String, textCol: String,
                   shingleSize: Int = 3): DataFrame = {
    val sh = Dedup.parallelize(docs).select(col(idCol),
      explode(Dedup.shingles(col(textCol), shingleSize)).as("__sh"))
    val docFreq = sh.groupBy("__sh").agg(count(lit(1)).as("__df"))
    sh.join(docFreq, "__sh")
      .groupBy(col(idCol))
      .agg(avg(when(col("__df") === 1, 1.0).otherwise(0.0)).as("novelty"))
  }

  /** Pairwise shingle-set Jaccard between document groups (sources,
    * snapshots, languages) — the corpus-mix diagnostic that surfaces
    * mirrored/re-scraped sources before they skew a training mix. Pairs
    * with zero overlap are omitted. Scale shape: the self-join is keyed
    * on the shingle, so per-shingle fan-out is bounded by group-pair
    * count (G²), never corpus size — G is small by definition. */
  /** Per-document average negative log-probability under the corpus's
    * own unigram LM — the cheap perplexity-style quality signal (word
    * salad and boilerplate-free prose score high, repetitive/common-token
    * docs score low). p(tok) = corpus_count(tok)/total_tokens; every
    * scored token appears in the corpus, so no smoothing is needed.
    *
    * Shape: ONE explode feeding a per-(doc, token) count whose lineage is
    * cut right there (`localCheckpoint` — the same pattern
    * [[groupOverlap]] documents): corpus token counts, the scalar total,
    * and the score join all read the materialized tf, which is bounded by
    * distinct (doc, token) pairs, never raw token occurrences. Without
    * the cut the tokenizing explode re-runs for every consumer — the
    * whole corpus re-tokenized three times. Per-token costs are
    * QUANTIZED to integer micro-nats and summed as longs (weighted by
    * tf, exactly equal to the per-occurrence sum), so the per-doc
    * mean is bit-identical regardless of summation order or engine (a
    * float sum would drift by summation order; ln itself differs by
    * ≤1 ulp across libms, vanishing under the 1e-6 quantization). */
  def unigramNegLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs.select(col(idCol),
        explode(split(lower(trim(coalesce(col(textCol), lit("")))), "\\s+")).as("__tok"))
      .filter(col("__tok") =!= "")
      .groupBy(col(idCol), col("__tok")).agg(count(lit(1)).as("__tf"))
      .localCheckpoint(false)
    // tiny (#distinct tokens); checkpointed because it feeds BOTH the
    // scalar total and the score join
    val counts = tf.groupBy("__tok").agg(sum(col("__tf")).as("__cnt"))
      .localCheckpoint(false)
    // empty corpus → NULL sum; any value works (no rows to score)
    val totalRow = counts.agg(sum(col("__cnt"))).head()
    val total = if (totalRow.isNullAt(0)) 1L else totalRow.getLong(0)
    tf.join(counts, "__tok")
      .withColumn("__nll",
        round(-log(col("__cnt").cast("double") / total.toDouble) * 1e6).cast("long"))
      .groupBy(idCol)
      .agg(sum(col("__tf")).as("n_tokens"),
        (sum(col("__tf") * col("__nll")).cast("double") / sum(col("__tf")) / 1e6)
          .as("avg_neg_logprob"))
  }

  /** Corpus-bigram conditional negative log-likelihood — the step up
    * from [[unigramNegLogProb]] that actually penalizes scrambled
    * word ORDER, not just rare words: each bigram occurrence (w1,w2)
    * costs −ln p(w2|w1) under the corpus's add-1-smoothed bigram LM,
    * p(w2|w1) = (C(w1,w2)+1) / (C(w1,·)+V) with V the unigram
    * vocabulary size. Same integer micro-nat quantization contract as
    * the unigram scorer: per-bigram costs round to micro-nats and sum
    * as longs weighted by tf, so the per-doc mean is bit-identical
    * across engines and summation orders.
    *
    * Scale: one bigram explode + (doc, bigram) hash agg (checkpointed
    * — it feeds both the model counts and the score join), bigram and
    * context counts are model-sized aggs off that, plus one distinct
    * pass for V. Cost is O(corpus tokens) with no self-joins. */
  def bigramNegLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = split(lower(trim(coalesce(col(textCol), lit("")))), "\\s+")
    val bigrams = when(size(words) >= 2,
      transform(sequence(lit(0), size(words) - 2),
        i => concat_ws(" ", slice(words, i + 1, lit(2)))))
      .otherwise(array().cast("array<string>"))
    val tf = docs.select(col(idCol), explode(bigrams).as("__bg"))
      .groupBy(col(idCol), col("__bg")).agg(count(lit(1)).as("__tf"))
      .localCheckpoint(false)
    val bgCounts = tf.groupBy("__bg").agg(sum(col("__tf")).as("__cnt"))
      .withColumn("__w1", element_at(split(col("__bg"), " ", 2), 1))
      .localCheckpoint(false) // model-sized; feeds contexts + score join
    val ctxCounts = bgCounts.groupBy("__w1").agg(sum(col("__cnt")).as("__ctx"))
    val v = docs.select(explode(words).as("__tok"))
      .filter(col("__tok") =!= "").distinct().count()
    tf.join(bgCounts, "__bg")
      .join(ctxCounts, "__w1")
      .withColumn("__nll",
        round(-log((col("__cnt") + 1L).cast("double") /
          (col("__ctx") + v).cast("double")) * 1e6).cast("long"))
      .groupBy(idCol)
      .agg(sum(col("__tf")).as("n_bigrams"),
        (sum(col("__tf") * col("__nll")).cast("double") / sum(col("__tf")) / 1e6)
          .as("avg_neg_logprob"))
  }

  /** Per-group KL divergence from the corpus unigram distribution —
    * the drift detector for multi-source mixes: KL(p_g ‖ q) =
    * Σ_types p_g(t)·ln(p_g(t)/q(t)) with p_g the group's own unsmoothed
    * unigram distribution and q the whole corpus's (every group token
    * appears in the corpus, so q > 0 wherever p_g > 0 and no smoothing
    * is needed). A source of generic text sits near 0; a source whose
    * vocabulary diverges (spam, another language, boilerplate) scores
    * high. Per-TYPE log-ratios quantize to integer micro-nats and sum
    * as longs weighted by the group's token count, so the result is
    * summation-order- and engine-exact; the double products inside the
    * ln are pure IEEE and identical cross-engine.
    *
    * Scale: one tokenize + (group, token) hash agg (checkpointed — it
    * feeds the corpus counts, the group totals, and the score join),
    * then model-sized joins. O(corpus tokens) total, no self-joins. */
  def sourceKlDivergence(docs: DataFrame, groupCol: String,
                         textCol: String): DataFrame = {
    val st = docs.select(col(groupCol),
        explode(split(lower(trim(coalesce(col(textCol), lit("")))), "\\s+")).as("__tok"))
      .filter(col("__tok") =!= "")
      .groupBy(col(groupCol), col("__tok")).agg(count(lit(1)).as("__cs"))
      .localCheckpoint(false)
    val corpus = st.groupBy("__tok").agg(sum(col("__cs")).as("__c"))
    val totalRow = corpus.agg(sum(col("__c"))).head()
    val total = if (totalRow.isNullAt(0)) 1L else totalRow.getLong(0)
    st.join(corpus, "__tok")
      .withColumn("__lr",
        round(log((col("__cs").cast("double") * total.toDouble) /
          (sum(col("__cs")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(groupCol)).cast("double") * col("__c").cast("double"))) * 1e6)
          .cast("long"))
      .groupBy(groupCol)
      .agg(sum(col("__cs")).as("n_tokens"),
        (sum(col("__cs") * col("__lr")).cast("double") / sum(col("__cs")) / 1e6)
          .as("kl_nats"))
  }

  def groupOverlap(docs: DataFrame, groupCol: String, textCol: String,
                   shingleSize: Int = 3): DataFrame = {
    // cut the lineage: sh feeds both self-join sides AND the sizes
    // aggregate — without the checkpoint the corpus-wide explode+distinct
    // shuffle runs again for sizes (the join sides alone get a
    // ReusedExchange, the differently-shaped aggregate does not)
    val sh = Dedup.parallelize(docs).select(col(groupCol).as("g"),
        explode(Dedup.shingles(col(textCol), shingleSize)).as("__sh"))
      .distinct()
      .localCheckpoint(false)
    val sizes = sh.groupBy("g").agg(count(lit(1)).as("n"))
    val inter = sh.toDF("ga", "__sh").join(sh.toDF("gb", "__sh"), Seq("__sh"))
      .filter(col("ga") < col("gb"))
      .groupBy("ga", "gb").agg(count(lit(1)).as("__i"))
    inter
      .join(sizes.toDF("ga", "__na"), "ga")
      .join(sizes.toDF("gb", "__nb"), "gb")
      .select(col("ga"), col("gb"),
        (col("__i").cast("double") /
          (col("__na") + col("__nb") - col("__i")).cast("double")).as("jaccard"))
  }

  /** KMV-sketched pairwise group Jaccard — the 100 TB path for
    * [[groupOverlap]]. The exact version's shingle self-join touches
    * every distinct (group, shingle) row; here each group first reduces
    * to its `k` SMALLEST distinct shingle hashes (a bottom-k / KMV
    * sketch — Bar-Yossef et al. RANDOM'02; Beyer et al. SIGMOD'07), and
    * the pairwise estimate runs over sketches alone: after the one
    * corpus pass, cost is O(pairs · k), independent of corpus size.
    *
    * Estimator: for a pair, take the k smallest hashes of the sketch
    * UNION; J ≈ (how many of those appear in BOTH sketches) / k. When
    * the union holds fewer than k hashes the sketch is the exact set and
    * the estimate is exact. Pairs whose sketches share NO hash are
    * omitted (estimates below the 1/k resolution are indistinguishable
    * from zero — same omission contract as [[groupOverlap]], coarser).
    *
    * Deterministic and engine-neutral: hashes are md5-derived
    * ([[Dedup.portableWordHash]]), so sketch, union, and count replay
    * exactly in any engine with a standard md5 — the correctness oracle
    * does, making an APPROXIMATE operator hash-checkable. */
  def groupOverlapSketch(docs: DataFrame, groupCol: String, textCol: String,
                         k: Int = 256, shingleSize: Int = 3): DataFrame = {
    require(k >= 1, "sketch size k must be >= 1")
    val h = Dedup.parallelize(docs).select(col(groupCol).as("g"),
        explode(Dedup.shingles(col(textCol), shingleSize)).as("__sh"))
      .select(col("g"), Dedup.portableWordHash(col("__sh")).as("h"))
      .distinct()
    val wg = Window.partitionBy("g").orderBy(col("h").asc)
    // checkpoint: the sketch feeds both candidate sides AND two union
    // legs — four consumers of one corpus-wide shuffle
    val kmv = h.withColumn("__rn", row_number().over(wg))
      .filter(col("__rn") <= k).select("g", "h")
      .localCheckpoint(false)
    // candidate pairs via sketch-hash collisions — an equi-join on the
    // hash, never a group × group cartesian
    val cand = kmv.toDF("ga", "h").join(kmv.toDF("gb", "h"), Seq("h"))
      .filter(col("ga") < col("gb"))
      .select("ga", "gb").distinct()
    // per-pair union of the two sketches, with membership flags
    val ua = cand.join(kmv.toDF("ga", "h"), Seq("ga"))
      .select(col("ga"), col("gb"), col("h"), lit(1).as("inA"), lit(0).as("inB"))
    val ub = cand.join(kmv.toDF("gb", "h"), Seq("gb"))
      .select(col("ga"), col("gb"), col("h"), lit(0).as("inA"), lit(1).as("inB"))
    val uni = ua.unionByName(ub)
      .groupBy("ga", "gb", "h")
      .agg(max(col("inA")).as("inA"), max(col("inB")).as("inB"))
    // k smallest of each pair's union; estimate = both-present / taken
    val wp = Window.partitionBy("ga", "gb").orderBy(col("h").asc)
    uni.withColumn("__rn", row_number().over(wp)).filter(col("__rn") <= k)
      .groupBy("ga", "gb")
      .agg((sum(col("inA") * col("inB")).cast("double") /
            count(lit(1)).cast("double")).as("jaccard_est"))
  }

  /** KMV SET ALGEBRA across sources — [[groupOverlapSketch]] grown from
    * a similarity score into cardinality estimates for the full set
    * algebra: |A|, |B|, |A∪B|, |A∩B|, |A∖B| per group pair, all from
    * the same bottom-k signatures (Beyer et al., SIGMOD'07). The "how
    * much NEW data does source B add over A" planning question at
    * corpus scale, for one corpus pass + O(pairs·k) arithmetic.
    *
    * Estimators, all md5-hash-derived and therefore SQL-replayable:
    * a sketch holding fewer than k hashes IS its set (exact count);
    * otherwise `(k−1)·H / kthMin` with H = 2^60 the hash range (the
    * classic KMV unbiased estimator). Intersections come via
    * `J_est · |A∪B|_est`; differences via `|A| − |A∩B|` (clamped at 0 —
    * independently-estimated terms can cross slightly). */
  def groupSetSketchOps(docs: DataFrame, groupCol: String, textCol: String,
                        k: Int = 128, shingleSize: Int = 3): DataFrame = {
    require(k >= 2, "sketch size k must be >= 2")
    val h = Dedup.parallelize(docs).select(col(groupCol).as("g"),
        explode(Dedup.shingles(col(textCol), shingleSize)).as("__sh"))
      .select(col("g"), Dedup.portableWordHash(col("__sh")).as("h"))
      .distinct()
    val wg = Window.partitionBy("g").orderBy(col("h").asc)
    val kmv = h.withColumn("__rn", row_number().over(wg))
      .filter(col("__rn") <= k).select("g", "h")
      .localCheckpoint(false)
    val H = math.pow(2.0, 60) // portableWordHash range (60 md5 bits)
    def est(n: Column, kth: Column): Column =
      when(n < k, n.cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(H) / kth.cast("double"))
    val sizes = kmv.groupBy("g")
      .agg(count(lit(1)).as("n"), max(col("h")).as("kth"))
      .select(col("g"), round(est(col("n"), col("kth")), 2).as("e"))
    val cand = kmv.toDF("ga", "h").join(kmv.toDF("gb", "h"), Seq("h"))
      .filter(col("ga") < col("gb"))
      .select("ga", "gb").distinct()
    val ua = cand.join(kmv.toDF("ga", "h"), Seq("ga"))
      .select(col("ga"), col("gb"), col("h"), lit(1).as("inA"), lit(0).as("inB"))
    val ub = cand.join(kmv.toDF("gb", "h"), Seq("gb"))
      .select(col("ga"), col("gb"), col("h"), lit(0).as("inA"), lit(1).as("inB"))
    val uni = ua.unionByName(ub)
      .groupBy("ga", "gb", "h")
      .agg(max(col("inA")).as("inA"), max(col("inB")).as("inB"))
    val wp = Window.partitionBy("ga", "gb").orderBy(col("h").asc)
    val pair = uni.withColumn("__rn", row_number().over(wp)).filter(col("__rn") <= k)
      .groupBy("ga", "gb")
      .agg(count(lit(1)).as("t"), max(col("h")).as("kth"),
        sum(col("inA") * col("inB")).as("both"))
      .withColumn("jaccard_est", round(col("both").cast("double") / col("t"), 6))
      .withColumn("union_est", round(est(col("t"), col("kth")), 2))
      .withColumn("inter_est", round(col("jaccard_est") * col("union_est"), 2))
    pair
      .join(sizes.toDF("ga", "est_a"), Seq("ga"))
      .join(sizes.toDF("gb", "est_b"), Seq("gb"))
      .select(col("ga"), col("gb"), col("est_a"), col("est_b"),
        col("union_est"), col("inter_est"), col("jaccard_est"),
        round(greatest(col("est_a") - col("inter_est"), lit(0.0)), 2).as("diff_a_est"),
        round(greatest(col("est_b") - col("inter_est"), lit(0.0)), 2).as("diff_b_est"))
  }

  /** Power-of-two token-length histogram: bucket = floor(log2(tokens)),
    * with empty docs in bucket -1. The one-line corpus shape summary a
    * packing/batching configuration starts from (sequence-length budget,
    * truncation loss estimates). Single partial-aggregated pass. */
  def lengthHistogram(docs: DataFrame, textCol: String): DataFrame = {
    val n = TextAnalysis.tokenCount(col(textCol))
    docs.select(
        when(n <= 0, lit(-1L))
          .otherwise(floor(log2(n.cast("double"))).cast("long")).as("bucket_log2"),
        n.cast("long").as("__n"))
      .groupBy("bucket_log2")
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("n_tokens"))
  }
}
