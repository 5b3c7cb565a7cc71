package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained document-quality classifier: hashed-n-gram features + a
  * linear model trained by batched gradient rounds — the CCNet /
  * fastText corpus-curation move (Wenzek et al., LREC 2020: a linear
  * classifier over hashed token features, trained on a labeled seed
  * set, scores the whole crawl), here in the engine's deterministic,
  * oracle-replayable style.
  *
  * Model: least-squares linear probability (ŷ = w·x + b, squared-loss
  * gradient descent). Squared loss on purpose — its gradient
  * `(ŷ − y)·x` is pure +/×/÷ arithmetic, so BOTH engines (Spark and
  * the DuckDB oracle) replay training bit-identically; logistic loss
  * would put `exp()` on the replay path, and transcendental libm ULPs
  * differ across engines. For a keep/drop gate at a threshold the
  * linear-probability decision is the same classifier family CCNet
  * deploys (one linear score, one cutoff).
  *
  * Determinism contract (the established micro-quantization rule, same
  * as the NLL/perplexity family): every cross-row float SUM is
  * quantized per-term to integer micro-units `floor(v·1e6 + 0.5)` and
  * summed as BIGINT — order-independent, so shuffles and partitioning
  * can never flip a result. Margins are Σ floor(x·w·1e6+0.5) + bias
  * micro; gradients Σ floor(e·x·1e6+0.5). Weight updates happen on the
  * DRIVER over the collected (≤ buckets+1)-row gradient — `w ← w −
  * lr·G/(1e6·N)` with the exact same association the oracle SQL uses.
  *
  * Scale shape (100 TB): feature extraction is one corpus pass into
  * skinny (id, bucket, x) rows, cached once (`localCheckpoint`); each
  * round is two partial+final aggregates (margin per doc, gradient per
  * bucket) + a broadcast of the (buckets)-row weight table — nothing
  * driver-side ever exceeds `buckets` rows, and rounds is a small
  * constant. Scoring is one aggregate over the feature rows.
  */
object QualityLr {

  val DefaultBuckets = 64
  val DefaultRounds = 3
  // rows are unit-L2 (see featureRows), so with the intercept the
  // normal-equation curvature is bounded by 2 — lr < 1 keeps full-batch
  // GD contractive on ANY corpus, and 0.7 converges the dominant class
  // directions within the unrolled 3 rounds
  val DefaultLr = 0.7
  private val Seed = "qlr1"

  /** Trained model: `weights(b)` per hash bucket + intercept. */
  final case class Model(weights: Array[Double], bias: Double) {
    def buckets: Int = weights.length
  }

  /** Whitespace tokens of the lowered, trimmed text — `[""]` for
    * empty/NULL text (one empty token), the corpus-wide convention the
    * contamination oracle established (`string_split_regex` parity). */
  private def toks(text: Column): Column =
    split(lower(trim(coalesce(text, lit("")))), "\\s+")

  /** Skinny feature rows (id, b, x): L2-NORMALIZED hashed-unigram
    * PRESENCE — bucket = 16-bit md5 of the token mod `buckets`
    * (engine-neutral, [[Sampling.md5Bucket]]), x = 1/√(distinct buckets
    * in the doc). Unit-norm rows bound the least-squares curvature
    * (λ_max ≤ 1 + the intercept's 1), which is what lets a SMALL fixed
    * round count converge — raw term frequencies have ‖x‖ ≈ 0.1 and
    * would crawl. √ is correctly rounded under IEEE-754, so the oracle
    * reproduces x bit-exactly. */
  def featureRows(docs: DataFrame, idCol: String, textCol: String,
                  buckets: Int = DefaultBuckets): DataFrame = {
    val present = docs
      .select(col(idCol), explode(toks(col(textCol))).as("__tok"))
      .withColumn("b", Sampling.md5Bucket(Seq(col("__tok")), Seed) % buckets)
      .select(col(idCol), col("b")).distinct()
    val nb = present.groupBy(col(idCol)).agg(count(lit(1)).as("__nb"))
    present.join(nb, Seq(idCol))
      .select(col(idCol), col("b"),
        (lit(1.0) / sqrt(col("__nb").cast("double"))).as("x"))
  }

  /** Micro-quantized margin (Σ_b floor(x·w_b·1e6+0.5) + floor(bias·1e6
    * +0.5)) per doc, given a weight table — the one scoring shape both
    * training rounds and [[score]] share. */
  private def marginMicro(feat: DataFrame, idCol: String,
                          model: Model): DataFrame = {
    val spark = feat.sparkSession
    import spark.implicits._
    val wDf = model.weights.zipWithIndex
      .map { case (w, b) => (b.toLong, w) }.toSeq.toDF("b", "w")
    val biasMicro = math.floor(model.bias * 1e6 + 0.5).toLong
    feat.join(broadcast(wDf), Seq("b"), "left")
      .groupBy(col(idCol))
      .agg(sum(floor(col("x") * coalesce(col("w"), lit(0.0)) * 1e6 + 0.5))
        .as("__mm"))
      .select(col(idCol), (col("__mm") + lit(biasMicro)).as("margin_micro"))
  }

  /** Train on a labeled seed set (`labelCol` ∈ {0,1} after cast):
    * `rounds` full-batch gradient rounds, every cross-row sum
    * micro-quantized (see class doc), weight updates on the driver. */
  def train(docs: DataFrame, idCol: String, textCol: String, labelCol: String,
            buckets: Int = DefaultBuckets, rounds: Int = DefaultRounds,
            lr: Double = DefaultLr): Model = {
    val labels = docs.select(col(idCol), col(labelCol).cast("double").as("__y"))
    // the corpus is tokenized ONCE; rounds iterate over the skinny rows
    val feat = featureRows(docs, idCol, textCol, buckets)
      .join(labels, Seq(idCol)).localCheckpoint(false)
    trainOnFeatures(feat, labels, idCol, buckets, rounds, lr)
  }

  /** The gradient rounds over pre-extracted (id, b, x, __y) feature
    * rows — shared by [[train]] and [[trainAndScore]], which differ
    * only in whether the scoring pass reuses the same rows, and by
    * [[continueTraining]], which warm-starts from published weights. */
  private def trainOnFeatures(feat: DataFrame, labels: DataFrame, idCol: String,
                              buckets: Int, rounds: Int, lr: Double,
                              init: Option[Model] = None): Model = {
    val n = labels.count()
    require(n > 0, "cannot train on an empty seed set")
    init.foreach(m => require(m.buckets == buckets,
      s"warm start needs matching bucket counts: model has ${m.buckets}, asked $buckets"))
    val w = init.fold(Array.fill(buckets)(0.0))(_.weights.clone())
    var bias = init.fold(0.0)(_.bias)
    (1 to rounds).foreach { _ =>
      val err = marginMicro(feat, idCol, Model(w, bias))
        .join(labels, Seq(idCol))
        .select(col(idCol),
          (col("margin_micro").cast("double") / 1e6 - col("__y")).as("__e"))
      val g = feat.join(err, Seq(idCol))
        .groupBy("b")
        .agg(sum(floor(col("__e") * col("x") * 1e6 + 0.5)).as("g"))
        .collect()
      val gBias = err
        .agg(sum(floor(col("__e") * 1e6 + 0.5))).head().getLong(0)
      g.foreach { r =>
        val b = r.getLong(0).toInt
        w(b) = w(b) - lr * r.getLong(1) / (1e6 * n)
      }
      bias = bias - lr * gBias / (1e6 * n)
    }
    Model(w, bias)
  }

  /** Score every document: (id, margin_micro, hq) where hq ⇔ the
    * linear probability exceeds `threshold` (micro units compare as
    * integers — no float threshold wobble). */
  def score(docs: DataFrame, idCol: String, textCol: String, model: Model,
            threshold: Double = 0.5): DataFrame = {
    val thrMicro = math.floor(threshold * 1e6 + 0.5).toLong
    marginMicro(featureRows(docs, idCol, textCol, model.buckets), idCol, model)
      .select(col(idCol), col("margin_micro"),
        (col("margin_micro") > lit(thrMicro)).as("hq"))
  }

  /** CONTINUED training — the online-refresh half of the production
    * loop (drift detected → continue training on the grown/corrected
    * seed → [[ModelStore.publish]] → the versioned gate hot-swaps at
    * its next tick): run `rounds` more full-batch gradient rounds over
    * `docs`, warm-started from `model`'s weights instead of zero. The
    * arithmetic is identical to [[train]]'s rounds — same
    * micro-quantized sums, same driver-side update association — so a
    * continued model is exactly what a longer cold training WOULD have
    * produced had its first rounds seen the old corpus: bit-replayable
    * by the oracle, like everything else in this family. A new corpus
    * slice naturally carries fresh hash buckets; those start from the
    * warm model's zeros and learn in these rounds. */
  def continueTraining(model: Model, docs: DataFrame, idCol: String,
                       textCol: String, labelCol: String,
                       rounds: Int = 1, lr: Double = DefaultLr): Model = {
    val labels = docs.select(col(idCol), col(labelCol).cast("double").as("__y"))
    val feat = featureRows(docs, idCol, textCol, model.buckets)
      .join(labels, Seq(idCol)).localCheckpoint(false)
    trainOnFeatures(feat, labels, idCol, model.buckets, rounds, lr, Some(model))
  }

  /** Confusion counts of a model against labeled docs at `threshold`:
    * one row (tp, fp, fn, tn) — the shared audit aggregate behind
    * [[evaluate]] and [[trainWithFloor]]. The sums coalesce to 0 so an
    * EMPTY audit set yields an all-zero row (precision/recall then read
    * as undefined/0 downstream) instead of a NULL row that would NPE
    * the floor check. */
  private def confusion(model: Model, docs: DataFrame, idCol: String,
                        textCol: String, labelCol: String,
                        threshold: Double): DataFrame =
    score(docs, idCol, textCol, model, threshold)
      .join(docs.select(col(idCol), col(labelCol).cast("int").as("__y")), Seq(idCol))
      .agg(
        coalesce(sum(when(col("hq") && col("__y") === 1, 1L).otherwise(0L)), lit(0L)).as("tp"),
        coalesce(sum(when(col("hq") && col("__y") === 0, 1L).otherwise(0L)), lit(0L)).as("fp"),
        coalesce(sum(when(!col("hq") && col("__y") === 1, 1L).otherwise(0L)), lit(0L)).as("fn"),
        coalesce(sum(when(!col("hq") && col("__y") === 0, 1L).otherwise(0L)), lit(0L)).as("tn"))

  /** HELD-OUT evaluation of the trained gate — the classifier family's
    * `ann_recall` equivalent: train on `train`, audit on disjoint
    * `test`, return one row of confusion counts plus precision/recall
    * (NULL when undefined). The quality audit every score-gated
    * pipeline owes its downstream consumers: `sample_quality_weighted`
    * and the streaming admission gate both trust these scores, so the
    * model's held-out error rate must be a measured, replayable number
    * — not an assumption. Scale shape: two training-sized passes (the
    * gradient rounds on `train`, one scoring aggregate on `test`);
    * the output is a single row. */
  def evaluate(train: DataFrame, test: DataFrame, idCol: String,
               textCol: String, labelCol: String,
               buckets: Int = DefaultBuckets, rounds: Int = DefaultRounds,
               lr: Double = DefaultLr, threshold: Double = 0.5): DataFrame = {
    val model = this.train(train, idCol, textCol, labelCol, buckets, rounds, lr)
    confusion(model, test, idCol, textCol, labelCol, threshold)
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") > 0,
          round(col("tp").cast("double") / (col("tp") + col("fp")), 6)).as("prec"),
        when(col("tp") + col("fn") > 0,
          round(col("tp").cast("double") / (col("tp") + col("fn")), 6)).as("rec"))
  }

  /** Train with a held-out quality FLOOR — the refusal guard: a model
    * whose held-out precision or recall falls below the floor throws
    * instead of returning, so a degraded classifier can never silently
    * start gating admission or sampling. Precision/recall of an empty
    * positive set count as 0 (maximally conservative). */
  def trainWithFloor(train: DataFrame, heldOut: DataFrame, idCol: String,
                     textCol: String, labelCol: String,
                     minPrecision: Double, minRecall: Double,
                     buckets: Int = DefaultBuckets, rounds: Int = DefaultRounds,
                     lr: Double = DefaultLr, threshold: Double = 0.5): Model = {
    val model = this.train(train, idCol, textCol, labelCol, buckets, rounds, lr)
    val r = confusion(model, heldOut, idCol, textCol, labelCol, threshold).head()
    val (tp, fp, fn) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val prec = if (tp + fp > 0) tp.toDouble / (tp + fp) else 0.0
    val rec = if (tp + fn > 0) tp.toDouble / (tp + fn) else 0.0
    require(prec >= minPrecision && rec >= minRecall,
      f"trained model fails its held-out floor: precision $prec%.4f " +
        f"(floor $minPrecision%.4f), recall $rec%.4f (floor $minRecall%.4f) " +
        f"on tp=$tp fp=$fp fn=$fn — refusing to gate with a degraded model")
    model
  }

  /** Versioned on-disk model store — the hot-swap primitive for
    * streaming gates: training publishes a new version, a running
    * drain re-opens the latest one per micro-batch, so a retrained
    * classifier takes effect at the next tick without restarting the
    * stream ([[graft.streaming.StreamOps.qualityGateDrainVersioned]]).
    *
    * Format: one immutable text file `v=N` per version — a header line
    * `qlr1 <nWeights> <crc32>` (crc over the payload bytes), then the
    * bias line, then one weight per line (`java.lang.Double.toString`
    * round-trips every double bit-exactly, so a published model
    * re-reads IDENTICAL, which the determinism contract requires: a
    * replayed micro-batch must re-score under byte-equal weights).
    * [[read]] verifies the header's count and checksum, so a torn or
    * bit-rotted file is detected instead of silently gating with
    * garbage weights (headerless pre-checksum files still read, for
    * stores published before the header existed). Writes are staged +
    * atomically renamed, so `latest` never sees a half-written file,
    * and publish REFUSES an already-existing target version (on
    * RawLocalFileSystem rename() silently replaces, so the existence
    * check is what upholds the versions-are-immutable invariant under
    * a racing second publisher — the same guard MorStore's manifest
    * commit carries). The store is tiny by construction (buckets+1
    * doubles per version) — this is driver-side state, like the model
    * itself; [[prune]] bounds the version count. */
  final class ModelStore(spark: org.apache.spark.sql.SparkSession, root: String) {
    private def rootP = new org.apache.hadoop.fs.Path(root)
    private def fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def versions: Seq[Int] =
      if (!fs.exists(rootP)) Seq.empty
      else fs.listStatus(rootP).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toInt).sorted

    private def crcOf(payload: String): Long = {
      val c = new java.util.zip.CRC32()
      c.update(payload.getBytes("UTF-8"))
      c.getValue
    }

    /** Publish as the next version; returns the version number. Throws
      * if the allocated version already exists (two concurrent
      * publishers raced — versions are never overwritten). */
    def publish(model: Model): Int =
      publishAs(model, versions.lastOption.getOrElse(0) + 1)

    /** The collision guard's test seam: publish under an EXPLICIT
      * version number (the spec passes an already-taken one to exercise
      * exactly the two-racing-publishers path). */
    private[llm] def publishAs(model: Model, n: Int): Int = {
      fs.mkdirs(rootP)
      val payload = (model.bias.toString +: model.weights.map(_.toString))
        .mkString("\n")
      // UUID-suffixed staging (the MorStore.writeSegmentObserved
      // discipline): two publishers racing the SAME version must never
      // share a tmp path — a shared name lets the loser's create()
      // truncate the winner's in-flight bytes, and the torn file would
      // only surface at read time via the CRC instead of here
      val tmp = new org.apache.hadoop.fs.Path(rootP,
        s".tmp_v=$n.${java.util.UUID.randomUUID().toString.take(8)}")
      val out = fs.create(tmp, true)
      try out.write(s"qlr1 ${model.buckets} ${crcOf(payload)}\n$payload".getBytes("UTF-8"))
      finally out.close()
      val dst = new org.apache.hadoop.fs.Path(rootP, s"v=$n")
      // exists-then-rename still has a window on local FS; on HDFS the
      // rename itself fails on an existing target, closing it fully
      if (fs.exists(dst)) {
        fs.delete(tmp, false)
        throw new java.util.ConcurrentModificationException(
          s"model v=$n already exists at $root — a concurrent publisher won the " +
            "version; re-read latest and republish (versions are immutable)")
      }
      if (!fs.rename(tmp, dst))
        throw new java.io.IOException(s"failed to publish model v=$n at $root")
      n
    }

    /** Accept headerless (pre-checksum) files from this store. The
      * legacy fallback is gated on this EXPLICIT adoption: without it,
      * a torn qlr1 file that lost exactly its header line (the payload
      * is all parseable doubles) would silently read as a legacy model
      * and gate with unverified weights — the checksum bypassed by
      * precisely the corruption class it exists to catch. One marker
      * per store, written by the operator who knows the store predates
      * the header. */
    def adoptLegacy(): Unit = {
      fs.mkdirs(rootP)
      val out = fs.create(new org.apache.hadoop.fs.Path(rootP, "_legacy"), true)
      try out.write("headerless-ok".getBytes("UTF-8")) finally out.close()
    }

    private def legacyAdopted: Boolean =
      fs.exists(new org.apache.hadoop.fs.Path(rootP, "_legacy"))

    def read(version: Int): Model = {
      val in = fs.open(new org.apache.hadoop.fs.Path(rootP, s"v=$version"))
      val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      val lines = text.linesIterator.toSeq
      val body =
        if (lines.headOption.exists(_.startsWith("qlr1 "))) {
          val Array(_, nStr, crcStr) = lines.head.split(" ", 3)
          val payload = lines.tail.mkString("\n")
          if (crcOf(payload) != crcStr.toLong)
            throw new java.io.IOException(
              s"model v=$version at $root fails its checksum — torn or corrupted " +
                "publish; refusing to gate with unverifiable weights")
          if (lines.tail.size != nStr.toInt + 1)
            throw new java.io.IOException(
              s"model v=$version at $root has ${lines.tail.size - 1} weight lines " +
                s"but the header claims $nStr — truncated publish")
          lines.tail
        } else if (legacyAdopted) lines // adopted pre-checksum store
        else throw new java.io.IOException(
          s"model v=$version at $root has no 'qlr1' header — a torn publish " +
            "that lost its header line reads exactly like the pre-checksum " +
            "format, so headerless files are refused unless the store was " +
            "explicitly marked legacy (call adoptLegacy() once for stores " +
            "published before the header existed)")
      Model(body.tail.map(_.toDouble).toArray, body.head.toDouble)
    }

    def latest: Option[(Int, Model)] =
      versions.lastOption.map(n => n -> read(n))

    /** Retention: delete all but the newest `keepLast` versions.
      * Version numbers keep ascending past a prune (allocation reads
      * the surviving tail), so `model_v` stamps on already-admitted
      * rows stay unambiguous — pruning only forfeits the ability to
      * RE-SCORE under those old weights, which is the operator's
      * retention call, same as [[graft.pipeline.MorStore.vacuum]]. */
    def prune(keepLast: Int): Unit = {
      require(keepLast >= 1, "prune must keep at least the latest version")
      versions.dropRight(keepLast)
        .foreach(v => fs.delete(new org.apache.hadoop.fs.Path(rootP, s"v=$v"), false))
    }
  }

  /** Train-on-seed + score-the-corpus in one call — the curation-gate
    * composition: returns the input docs with `margin_micro`/`hq`
    * attached, ready to `.filter(col("hq"))` in front of dedup and
    * sampling exactly like the heuristic gates. The corpus is
    * tokenized ONCE: the checkpointed feature rows feed both the
    * gradient rounds and the final scoring aggregate (a second
    * [[featureRows]] pass would recompute identical rows — the
    * micro-quantized sums make the reuse bit-identical by
    * construction). */
  def trainAndScore(docs: DataFrame, idCol: String, textCol: String,
                    labelCol: String, buckets: Int = DefaultBuckets,
                    rounds: Int = DefaultRounds, lr: Double = DefaultLr,
                    threshold: Double = 0.5): DataFrame = {
    val labels = docs.select(col(idCol), col(labelCol).cast("double").as("__y"))
    val feat = featureRows(docs, idCol, textCol, buckets).localCheckpoint(false)
    val model = trainOnFeatures(feat.join(labels, Seq(idCol)), labels,
      idCol, buckets, rounds, lr)
    val thrMicro = math.floor(threshold * 1e6 + 0.5).toLong
    val scored = marginMicro(feat, idCol, model)
      .select(col(idCol), col("margin_micro"),
        (col("margin_micro") > lit(thrMicro)).as("hq"))
    docs.join(scored, Seq(idCol))
  }
}
