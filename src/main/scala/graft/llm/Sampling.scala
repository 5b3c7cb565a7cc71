package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` depends on partitioning and RNG state — rerunning a
  * pipeline yields a different sample, which breaks replayable builds.
  * Hash-based sampling decides membership from row CONTENT: the same row
  * is in or out on every run, on any cluster layout, and the property
  * composes with incremental processing (new rows don't reshuffle old
  * decisions — the reservoir problem solved by determinism).
  */
object Sampling {

  /** Bernoulli-style sample: keep rows whose seeded content hash falls
    * under the fraction. Reproducible, partition-independent. */
  def deterministicSample(df: DataFrame, fraction: Double, seed: Long = 42L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    val bucket = pmod(xxhash64((lit(seed) +: df.columns.map(col).toSeq): _*), lit(1000000L))
    df.filter(bucket < (fraction * 1000000L).toLong)
  }

  /** Fixed-size per-stratum sample: the n rows with the lowest seeded
    * hash per stratum (bottom-k-by-hash ≡ uniform without replacement).
    * One shuffle on the strata key — [[capPerGroup]] with the content
    * hash as the total order. */
  def stratifiedFixedSample(df: DataFrame, strataCols: Seq[String], n: Int,
                            seed: Long = 42L): DataFrame =
    capPerGroup(df, strataCols,
      Seq(xxhash64((lit(seed) +: df.columns.map(col).toSeq): _*).asc), n)

  /** 16-bit engine-neutral content bucket in [0, 65536): the first four
    * hex chars of md5 over the seed-salted key columns. md5 (unlike
    * xxhash64) is identical in every engine, so split assignments can be
    * audited outside Spark. NULL keys encode as an explicit sentinel —
    * concat_ws would silently DROP them, colliding distinct identities
    * (same convention as Normalize.surrogateKey). */
  def md5Bucket(keyCols: Seq[Column], seed: String): Column =
    conv(substring(md5(concat_ws("||",
        (lit(seed) +: keyCols.map(c => coalesce(c.cast("string"), lit("__null__")))): _*)),
      1, 4), 16, 10).cast("long")

  /** Deterministic per-EPOCH training order — the data-loader contract:
    * each document lands in a shard (md5 over (epoch seed, id) mod
    * `shards`) and a position within its shard (rank of a second hash
    * slice, id tie-break), so an epoch's global order is
    * (shard, pos). Different epochs reshuffle completely; the same
    * epoch replays byte-identically on any cluster (md5 arithmetic —
    * auditable outside Spark, like every sampling decision here).
    *
    * Two-level on purpose: a single global row_number would serialize
    * 100 TB through one partition. The only window runs per shard —
    * pick `shards` ≈ training data-parallel degree and each shard's
    * order materializes independently, which is exactly how the
    * consuming loader reads it. */
  def epochOrder(docs: DataFrame, idCol: String, epoch: Int,
                 shards: Int): DataFrame = {
    require(shards >= 1, s"shards must be positive, got $shards")
    val h = md5(concat_ws("||", lit(s"epoch:$epoch"),
      coalesce(col(idCol).cast("string"), lit("__null__"))))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__o").asc, col(idCol).asc)
    docs.select(col(idCol), h.as("__h"))
      .withColumn("shard",
        (conv(substring(col("__h"), 1, 4), 16, 10).cast("long") % shards).cast("int"))
      .withColumn("__o", conv(substring(col("__h"), 5, 12), 16, 10).cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Cap rows per group: keep the first `n` rows of each group in
    * `order` — per-domain/per-source document caps, the corpus-balancing
    * pass that stops one mirror-heavy site from dominating a training
    * mix. Supply a TOTAL order (tie-break on a unique id) or the kept
    * set is layout-dependent. One shuffle on the group key. */
  def capPerGroup(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
                  n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    require(order.nonEmpty, "capPerGroup needs an explicit total order")
    // collision-proof rank column: never clobbers caller data that
    // happens to carry the same name (deterministic pick, not a UUID, so
    // repeated builds produce identical plans)
    val rn = Iterator.from(0).map(i => s"__rn$i").find(!df.columns.contains(_)).get
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn(rn, row_number().over(w)).filter(col(rn) <= n).drop(rn)
  }

  /** Deterministic weighted Bernoulli: keep each row with probability
    * `weight` (clamped to [0,1]), decided by the engine-neutral
    * [[md5Bucket]] of its key columns — the domain-reweighting primitive
    * (quality-weighted corpus mixing, source up/down-sampling). Replay-
    * stable and incremental-safe like every sampler here; the md5 bucket
    * makes each decision auditable outside Spark. `keyCols` is the row's
    * stable identity; `weight` may be any per-row expression. */
  def weightedSample(df: DataFrame, keyCols: Seq[String], weight: Column,
                     seed: String = "weighted"): DataFrame = {
    val u = md5Bucket(keyCols.map(col), seed).cast("double") / 65536.0
    df.filter(u < least(greatest(weight.cast("double"), lit(0.0)), lit(1.0)))
  }

  /** Temperature-flattened source mixing — the `n^α` reweighting used to
    * assemble multi-source training mixes (rare sources up-weighted,
    * dominant ones down-weighted; α=1 is proportional sampling, α=0 is
    * equal-per-source, the standard knob in multilingual/multi-corpus
    * training). Source s with n_s rows receives target share
    * p_s = n_s^α / Σ_t n_t^α; for a `targetRows` budget each of its rows
    * keeps with rate min(1, targetRows·p_s/n_s) — capped at 1: this
    * operator SUBSAMPLES, it never replicates, so an up-weighted source
    * contributes at most all of its rows (epoch repetition is the
    * trainer's job).
    *
    * Per-row decisions come from the engine-neutral [[md5Bucket]]
    * (replay-stable, partition-independent, auditable outside Spark);
    * the rate is rounded to 12 decimals so that cross-engine ulp drift
    * in the Σ n^α reduction cannot flip a boundary row. One tiny
    * aggregate (one row per source) computes the rates; they re-join the
    * corpus broadcast, so the corpus itself is touched in a single
    * filtered pass — no skew, no second shuffle at 100 TB. */
  def temperatureMix(df: DataFrame, groupCol: String, keyCols: Seq[String],
                     alpha: Double, targetRows: Long,
                     seed: String = "temperature"): DataFrame = {
    require(alpha >= 0, s"alpha must be >= 0, got $alpha")
    require(targetRows > 0, s"targetRows must be positive, got $targetRows")
    // NULL sources are a real group, not rows to lose: an equi-join on a
    // raw NULL key silently drops them, so the rate re-join is NULL-SAFE
    // (`<=>`). No string sentinel — a source literally named "__null__"
    // stays a distinct group from the NULL group (the collision a
    // coalesce-sentinel would silently create).
    val g = col(groupCol).cast("string")
    val counts = df.groupBy(g.as("__g")).agg(count(lit(1)).as("__n"))
    // Σ n^α: one scalar off a #sources-row aggregate (bounded small)
    val totRow = counts.agg(sum(pow(col("__n").cast("double"), alpha))).head()
    if (totRow.isNullAt(0)) return df // empty corpus: empty out, no NPE
    val tot = totRow.getDouble(0)
    val rates = counts.select(col("__g"),
      round(least(lit(1.0),
        lit(targetRows.toDouble) * pow(col("__n").cast("double"), alpha)
          / lit(tot) / col("__n").cast("double")), 12).as("__rate"))
    val u = md5Bucket(keyCols.map(col), seed).cast("double") / 65536.0
    df.join(broadcast(rates), g <=> col("__g"))
      .filter(u < col("__rate"))
      .drop("__g", "__rate")
  }

  /** Deterministic train/val/test split: each row gets the first label
    * whose cumulative weight bound exceeds its content bucket. Replay-
    * stable, partition-independent, incremental-safe (new rows never
    * reassign old ones) — the properties `randomSplit` lacks. `keyCols`
    * should be the row's stable identity (e.g. the document id), NOT
    * mutable payload columns. */
  def splitByHash(df: DataFrame, keyCols: Seq[String],
                  weights: Seq[(String, Double)], seed: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "weights must be positive")
    val total = weights.map(_._2).sum
    val bucket = md5Bucket(keyCols.map(col), seed)
    val bounds = weights.scanLeft(0.0)(_ + _._2).tail.map(w => (w / total * 65536).toLong)
    val labeled = weights.map(_._1).zip(bounds).foldRight(lit(weights.last._1): Column) {
      case ((label, hi), acc) => when(bucket < hi, label).otherwise(acc)
    }
    df.withColumn("split", labeled)
  }

  /** Leakage-safe train/val/test split: a plain [[splitByHash]] on doc
    * ids lets two NEAR-DUPLICATE documents straddle train and eval —
    * the eval set then scores memorization, not generalization. Here the
    * split key is the document's near-dup CLUSTER id
    * ([[Clusters.duplicateClusters]]' min-id label), so every member of
    * a duplicate cluster co-assigns by construction; singletons hash
    * their own id (their cluster label). Costs one clustering pass on
    * top of the hash arithmetic — at corpus scale the clustering is
    * usually already materialized for dedup, in which case pass it in
    * via `precomputed` and this is a broadcast-or-shuffle join plus the
    * same O(1)-per-row md5 decision as every sampler here. */
  def splitByCluster(docs: DataFrame, idCol: String, textCol: String,
                     weights: Seq[(String, Double)], seed: String = "split",
                     threshold: Double = 0.8,
                     precomputed: Option[DataFrame] = None): DataFrame = {
    val clusters = precomputed.getOrElse(
        Clusters.duplicateClusters(docs, idCol, textCol, threshold))
      .select(col(idCol), col("cluster_id"))
    val keyed = docs.join(clusters, Seq(idCol), "left")
      // defensive: a doc absent from the cluster map is its own cluster
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
    splitByHash(keyed, Seq("cluster_id"), weights, seed)
  }

  /** Token-budget cap per group: keep each group's rows in the
    * engine-neutral md5 hash order (tie-broken by `keyCols` — pass a
    * unique id for a total order) while the cumulative `tokens` count
    * stays within `budget`. Row caps treat a tweet and a book as the
    * same spend; token budgets are what trainers actually allocate
    * per source/domain. The kept set is a PREFIX of the hash order,
    * so a larger budget always yields a superset (monotone) and
    * re-runs are replay-stable like every sampler here. One shuffle
    * on the group key; the running sum is a single window pass. */
  def tokenBudgetPerGroup(df: DataFrame, groupCols: Seq[String],
                          tokens: Column, keyCols: Seq[String], budget: Long,
                          seed: String = "budget"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy((md5Bucket(keyCols.map(col), seed).asc +: keyCols.map(col(_).asc)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = Iterator.from(0).map(i => s"__cum$i").find(!df.columns.contains(_)).get
    df.withColumn(cum, sum(tokens.cast("long")).over(w))
      .filter(col(cum) <= budget).drop(cum)
  }

  /** Data Selection via Importance Resampling (Xie et al.,
    * arXiv:2302.03169): score every raw document by the log-likelihood
    * ratio between a TARGET-corpus unigram LM and the RAW-corpus
    * unigram LM (add-1 smoothed over their union vocabulary), then
    * draw `k` documents without replacement with probability ∝ the
    * importance weight w(x) = p_target(x)/p_raw(x) via Gumbel top-k
    * (Vieira '14; Kool et al. ICML'19): take the k largest
    * log w(x) + g_x where g_x = −ln(−ln(u_x)). The uniform u_x comes
    * from the engine-neutral [[md5Bucket]] of the doc id, so the draw
    * is deterministic, replay-stable, and auditable outside Spark.
    *
    * Per-token log-ratios are quantized to integer micro-nats and
    * summed as longs weighted by term frequency (order-independent,
    * cross-engine exact — the [[Terms.unigramNegLogProb]] contract);
    * the Gumbel perturbation quantizes the same way before ranking.
    * Output: (id, n_tokens, log_ratio, rank) for the k selected docs.
    *
    * Scale: two tokenize+count passes (raw corpus, target corpus), a
    * vocabulary-sized full-outer join, one score join back to the raw
    * term frequencies, and a distributed top-k (TakeOrdered — no
    * global sort materializes). The raw tf is checkpointed because it
    * feeds both its LM counts and the score join. */
  def importanceResample(raw: DataFrame, target: DataFrame, idCol: String,
                         textCol: String, k: Int,
                         seed: String = "dsir"): DataFrame = {
    require(k > 0, "k must be positive")
    def tf(df: DataFrame) = df.select(col(idCol),
        explode(split(lower(trim(coalesce(col(textCol), lit("")))), "\\s+")).as("__tok"))
      .filter(col("__tok") =!= "")
      .groupBy(col(idCol), col("__tok")).agg(count(lit(1)).as("__tf"))
    val rawTf = tf(raw).localCheckpoint(false)
    val vocab = tf(target).groupBy("__tok").agg(sum(col("__tf")).as("__ct"))
      .join(rawTf.groupBy("__tok").agg(sum(col("__tf")).as("__cr")),
        Seq("__tok"), "full_outer")
      .select(col("__tok"), coalesce(col("__cr"), lit(0L)).as("__cr"),
        coalesce(col("__ct"), lit(0L)).as("__ct"))
      .localCheckpoint(false) // tiny (vocab-sized); feeds totals + join
    val t = vocab.agg(sum(col("__cr")), sum(col("__ct")), count(lit(1))).head()
    val (totR, totT, v) =
      (if (t.isNullAt(0)) 0L else t.getLong(0),
       if (t.isNullAt(1)) 0L else t.getLong(1), t.getLong(2))
    val lr = vocab.select(col("__tok"),
      round((log((col("__ct") + 1L).cast("double") / (totT + v).toDouble) -
             log((col("__cr") + 1L).cast("double") / (totR + v).toDouble)) * 1e6)
        .cast("long").as("__lr"))
    val scored = rawTf.join(lr, "__tok")
      .groupBy(idCol)
      .agg(sum(col("__tf")).as("n_tokens"),
        sum(col("__tf") * col("__lr")).as("__sm"))
    val u = (md5Bucket(Seq(col(idCol)), seed).cast("double") + 0.5) / 65536.0
    val keyed = scored.withColumn("__key",
      round((col("__sm").cast("double") / 1e6 - log(-log(u))) * 1e6).cast("long"))
    // distributed top-k first; the rank window runs on k rows only
    val top = keyed.orderBy(col("__key").desc, col(idCol).asc).limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("__key").desc, col(idCol).asc)))
      .select(col(idCol), col("n_tokens"),
        round(col("__sm").cast("double") / 1e6, 6).as("log_ratio"), col("rank"))
  }
}
