package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lightweight text classification for corpus curation.
  *
  * Production pipelines gate training data through cheap linear text
  * classifiers — CCNet filters Common Crawl with a fastText model
  * scored against Wikipedia (Wenzek et al. LREC'20), and the original
  * fastText paper (Joulin et al. EACL'17) shows bag-of-words linear
  * models match far heavier classifiers on exactly this kind of
  * routing/filtering task. This is the Spark-native equivalent built
  * from aggregations only: multinomial Naive Bayes with Laplace
  * smoothing, trained and applied as DataFrame joins — no driver-side
  * learning loop, no UDFs, no per-row model object.
  *
  * Arithmetic contract: every log-probability is quantized to integer
  * MICRO-NATS as a per-(token, class) cost `round(-ln p · 10^6)` and
  * summed as BIGINT weighted by term frequency — the
  * [[Terms.unigramNegLogProb]] contract — so document scores are
  * bit-identical regardless of summation order, partitioning, or
  * engine, and the argmin class is deterministic (ties break on the
  * class label). A float log-sum could flip an argmin by reduction
  * order and never hash-match a second engine.
  */
object Classify {

  /** Train multinomial NB on `train` and classify `test`.
    *
    * Returns one row per test doc: `(idCol, labelCol, predicted,
    * cost_micro)` — `predicted` minimizes
    * `cost(c) = -ln P(c) - Σ_t tf·ln P(t|c)` in micro-nats, ties on
    * the smaller class label; `cost_micro` is the winning total.
    * Laplace smoothing: `P(t|c) = (cnt(t,c)+1) / (tot_c + V)` with `V`
    * = train vocabulary size; a token unseen for a class (or unseen
    * anywhere) costs `ln(tot_c + V)` — the cnt=0 case, so no V×C
    * zero-count grid is ever materialized. Token-less test docs are
    * classified by prior alone.
    *
    * Scale shape: train tokenization is one explode feeding a
    * (label, token) hash aggregate; the model is O(distinct (label,
    * token)) and joins the test term-frequency table on (class, token).
    * The per-class constants (prior cost, unseen-token cost) are a
    * bounded label-space collect — same contract as the k-means
    * centroid collect in [[Similarity]] — re-entering the plan as an
    * exploded literal array, NOT a cross join (no BroadcastNestedLoop
    * anywhere in the plan). The final argmin is a partial+final
    * `min(struct(cost, label))` aggregate, not a window.
    */
  def naiveBayes(train: DataFrame, test: DataFrame, idCol: String,
                 textCol: String, labelCol: String): DataFrame = {
    def toks(df: DataFrame) = df
      .select(col(idCol), col(labelCol),
        explode(split(lower(trim(coalesce(col(textCol), lit("")))), "\\s+")).as("__tok"))
      .filter(col("__tok") =!= "")
    // (label, token) counts — one explode, lineage cut (feeds totals,
    // vocabulary AND the weight table)
    val cnt = toks(train)
      .groupBy(col(labelCol).as("__label"), col("__tok"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(false)
    val tot = cnt.groupBy("__label").agg(sum(col("__c")).as("__t"))
    val vRow = cnt.agg(countDistinct(col("__tok"))).head()
    val v = if (vRow.isNullAt(0)) 0L else vRow.getLong(0)
    val nTotal = train.count()
    // bounded label-space collect: class priors + unseen-token costs
    val classes = nd(train, labelCol).join(tot, "__label").collect().map { r =>
      val label = r.getString(0)
      val n = r.getLong(1)
      val t = r.getLong(2)
      val priorCost = math.round(-math.log(n.toDouble / nTotal) * 1e6)
      val unseenCost = math.round(math.log((t + v).toDouble) * 1e6)
      (label, priorCost, unseenCost)
    }.sortBy(_._1)
    require(classes.nonEmpty, "naiveBayes: train set has no labeled tokens")
    val clsArray = array(classes.map { case (l, p, u) =>
      struct(lit(l).as("label"), lit(p).as("prior"), lit(u).as("w0"))
    }: _*)
    // per-(class, token) cost table
    val weights = cnt.join(tot, "__label")
      .select(col("__label"), col("__tok"),
        round(-log((col("__c") + 1).cast("double") / (col("__t") + v).cast("double")) * 1e6)
          .cast("long").as("__w"))
    val testTf = test
      .select(col(idCol),
        explode(split(lower(trim(coalesce(col(textCol), lit("")))), "\\s+")).as("__tok"))
      .filter(col("__tok") =!= "")
      .groupBy(col(idCol), col("__tok")).agg(count(lit(1)).as("__tf"))
    val grid = test.select(col(idCol), col(labelCol))
      .withColumn("__cls", explode(clsArray))
      .select(col(idCol), col(labelCol),
        col("__cls.label").as("__clabel"), col("__cls.prior").as("__prior"),
        col("__cls.w0").as("__w0"))
    grid
      .join(testTf, Seq(idCol), "left")
      .join(weights,
        grid("__clabel") === weights("__label") && testTf("__tok") === weights("__tok"),
        "left")
      .groupBy(col(idCol), col(labelCol), col("__clabel"), col("__prior"))
      .agg(coalesce(sum(col("__tf") * coalesce(col("__w"), col("__w0"))), lit(0L)).as("__s"))
      .select(col(idCol), col(labelCol),
        col("__clabel"), (col("__prior") + col("__s")).as("__total"))
      .groupBy(col(idCol), col(labelCol))
      .agg(min(struct(col("__total"), col("__clabel"))).as("__m"))
      .select(col(idCol), col(labelCol),
        col("__m.__clabel").as("predicted"),
        col("__m.__total").as("cost_micro"))
  }

  private def nd(train: DataFrame, labelCol: String) =
    train.groupBy(col(labelCol).as("__label")).agg(count(lit(1)).as("__nd"))
}
