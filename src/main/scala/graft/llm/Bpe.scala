package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge-rule training (Sennrich, Haddow & Birch,
  * ACL'16) — the tokenizer-building step of an LLM data pipeline,
  * expressed as iterative vocabulary-sized aggregation.
  *
  * The corpus is touched ONCE: a whitespace tokenize + count collapses
  * it to the distinct-word frequency table, and every merge iteration
  * after that runs over that vocabulary alone — pair counting is an
  * explode + hash agg weighted by word frequency, the winning pair is
  * one driver-side row, and the merge applies as a string rewrite over
  * the same table. At 100 TB the corpus pass dominates and the k
  * iterations cost O(k · vocab), with one single-row collect per
  * iteration (the argmax — bounded by construction).
  *
  * Merge application convention: each symbol sequence is stored
  * space-joined and the winning pair rewrites via two sequential
  * non-overlapping padded `replace` passes. One pass alone misses
  * adjacent occurrences that share a separator space ("x y x y"
  * matches once, not twice); the second pass picks those up, and on
  * alternating runs the two-pass result equals Sennrich's greedy
  * left-to-right merge. The one remaining deviation is a run of the
  * SAME symbol repeated ≥ 4 times ("a a a a" → "aa a a" after pass
  * one, "aa aa" after pass two — canonical — but longer odd runs can
  * group differently than the reference implementation). The rewrite
  * is deterministic and byte-identical across engines (sequential
  * `replace` scan semantics are shared by Spark and DuckDB, probed in
  * BpeSpec), which is what the oracle contract needs.
  *
  * Ties in the pair argmax break lexicographically on the pair string
  * — deterministic across engines, unlike hash order.
  */
object Bpe {

  /** Distinct-word frequency table with the initial symbol sequence.
    *
    * Character level (`byteLevel = false`): "low" → "l o w </w>" —
    * compact merges, but a codepoint unseen at train time is
    * unsegmentable (OOV by construction).
    *
    * Byte level (`byteLevel = true`): each word's UTF-8 bytes as
    * two-hex-digit symbols — "low" → "6c 6f 77 </w>", "日" →
    * "e6 97 a5 </w>". The base alphabet is ≤256 symbols, so EVERY
    * string segments (OOV-free by construction) — the standard answer
    * for multilingual corpora where a char-level vocabulary shreds
    * CJK/emoji into rare singleton tokens. The hex rendering keeps the
    * whole merge algebra in plain strings (space-joined sequences, the
    * same two-pass rewrite) and is replayed verbatim by the SQL oracle
    * via hex(encode(word)). */
  private[llm] def wordVocab(docs: DataFrame, textCol: String,
                             byteLevel: Boolean = false): DataFrame = {
    val seed =
      if (byteLevel)
        concat(regexp_replace(lower(hex(encode(col("word"), "UTF-8"))),
          "(..)", "$1 "), lit("</w>"))
      else concat(concat_ws(" ", split(col("word"), "")), lit(" </w>"))
    docs.select(explode(split(lower(trim(coalesce(col(textCol), lit("")))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("seq", seed)
  }

  /** Adjacent-symbol pair counts over the current vocabulary, weighted
    * by word frequency. */
  private[llm] def pairCounts(vocab: DataFrame): DataFrame = {
    val syms = split(col("seq"), " ")
    vocab.select(col("freq"), explode(
        when(size(syms) >= 2,
          transform(sequence(lit(0), size(syms) - 2),
            i => concat(element_at(syms, i + 1), lit(" "), element_at(syms, i + 2))))
          .otherwise(array().cast("array<string>"))).as("pair"))
      .groupBy("pair").agg(sum(col("freq")).as("n"))
  }

  /** The two-pass padded rewrite of `pair` → its concatenation. */
  private[llm] def applyMerge(seq: Column, pair: String): Column = {
    val merged = pair.replace(" ", "")
    def pass(c: Column) =
      replace(c, lit(s" $pair "), lit(s" $merged "))
    trim(pass(pass(concat(lit(" "), seq, lit(" ")))))
  }

  /** EXACT-greedy training of `k` merge rules — the ORACLE/SPEC path:
    * one sequential Spark job per merge makes it the bit-exact replay
    * target for the SQL oracle and the m=1 equivalence proof, but puts
    * k driver round-trips on the critical path. Production training
    * goes through [[trainMergesBatched]] (⌈k/m⌉ round-trips, default
    * m = 64) — at k ≈ 30k–100k the sequential form is not viable.
    *
    * Returns one row per learned rule: (step, pair, merged, n) —
    * `pair` the space-separated symbol pair, `merged` its
    * concatenation, `n` the weighted occurrence count that won the
    * step. Stops early if no pair remains (every word fused to a
    * single symbol). */
  def trainMerges(docs: DataFrame, textCol: String, k: Int,
                  byteLevel: Boolean = false): DataFrame = {
    require(k >= 1, "k must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = Dedup.parallelize(wordVocab(docs, textCol, byteLevel)).localCheckpoint(false)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= k && !exhausted) {
      val best = pairCounts(vocab)
        .orderBy(col("n").desc, col("pair").asc).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val pair = best(0).getString(0)
        val n = best(0).getLong(1)
        merges += ((step, pair, pair.replace(" ", ""), n))
        // checkpoint per iteration: the rewrite chain would otherwise
        // re-derive every prior step's plan each time
        vocab = vocab.withColumn("seq", applyMerge(col("seq"), pair))
          .localCheckpoint(false)
        step += 1
      }
    }
    merges.toSeq.toDF("step", "pair", "merged", "n")
  }

  /** Candidate-window size for one batched round: both engines scan the
    * SAME top-C ranked pairs when choosing a round's batch, so the
    * selection is a deterministic function of the pair-count table on
    * either side of the oracle. 8·m leaves room to skip conflicting
    * candidates; the floor keeps tiny batches from starving on skewed
    * fixtures. */
  private[graft] def candidateWindow(m: Int): Int = math.max(16, 8 * m)

  /** Greedy prefix-of-ranked selection of mutually INDEPENDENT pairs:
    * walk the ranked candidates in (count desc, pair asc) order and take
    * a pair unless either of its symbols OR its merged output collides
    * with a symbol or merged output of an already-taken pair. Under that
    * disjointness the round's rewrites commute, no selected pair's
    * occurrence count is disturbed by the others, and applying them in
    * one pass is well-defined — the independence condition of batched
    * ("multi-merge") BPE. Once nothing in the window is admissible the
    * round closes early (the used set only grows). */
  private[llm] def selectIndependent(ranked: Seq[(String, Long)],
                                     want: Int): Seq[(String, Long)] = {
    val used = scala.collection.mutable.Set.empty[String]
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    ranked.iterator.takeWhile(_ => out.size < want).foreach { case (pair, n) =>
      val Array(a, b) = pair.split(" ", 2)
      val parts = Seq(a, b, a + b)
      if (parts.forall(!used.contains(_))) {
        out += ((pair, n)); used ++= parts
      }
    }
    out.toSeq
  }

  /** Batched multi-merge training — the scale path [[trainMerges]]'
    * exact-greedy loop cannot reach: a production tokenizer needs
    * k ≈ 30k–100k merges, and one sequential Spark job per merge puts
    * the DRIVER ROUND-TRIP COUNT, not the corpus, on the critical path.
    * Each round here counts pairs ONCE, selects up to `m` mutually
    * independent pairs from the top-[[candidateWindow]] ranked
    * candidates ([[selectIndependent]]), and applies them in ONE rewrite
    * pass — ⌈k/m⌉ driver round-trips instead of k, with per-round cost
    * unchanged (one vocabulary-sized job + one ≤C-row collect).
    *
    * Semantics: with `m = 1` the selection degenerates to the exact
    * greedy argmax and the result EQUALS [[trainMerges]] row for row
    * (BpeSpec proves it on the fixture). With `m > 1` the rule is the
    * standard batched-BPE approximation: the top-m independent pairs are
    * taken with counts measured at ROUND start, so a later selection's
    * count ignores this round's earlier merges — independence makes the
    * rewrites commute, and the fixture shows the resulting vocabulary is
    * fertility-equivalent to exact greedy. `k` is a merge BUDGET: a
    * round whose candidate window holds fewer than `m` admissible pairs
    * under-fills rather than borrowing from later rounds (the round
    * structure — ⌈k/m⌉ rounds of up to `min(m, k − m·(r−1))` picks — is
    * FIXED, which is what lets a second engine replay the selection).
    *
    * Returns (step, round, pair, merged, n): `step` numbers selections
    * globally in pick order, `n` is the round-start weighted count. */
  def trainMergesBatched(docs: DataFrame, textCol: String, k: Int, m: Int = 64,
                         byteLevel: Boolean = false): DataFrame = {
    require(k >= 1, "k must be positive")
    require(m >= 1, "m must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = Dedup.parallelize(wordVocab(docs, textCol, byteLevel)).localCheckpoint(false)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String, String, Long)]
    val rounds = (k + m - 1) / m
    var step = 1
    var exhausted = false
    for (r <- 1 to rounds if !exhausted) {
      val want = math.min(m, k - m * (r - 1))
      val ranked = pairCounts(vocab)
        .orderBy(col("n").desc, col("pair").asc).limit(candidateWindow(m))
        .collect().map(row => (row.getString(0), row.getLong(1))).toSeq
      val chosen = selectIndependent(ranked, want)
      if (chosen.isEmpty) exhausted = true
      else {
        chosen.foreach { case (pair, n) =>
          merges += ((step, r, pair, pair.replace(" ", ""), n))
          step += 1
        }
        vocab = vocab.withColumn("seq",
            chosen.foldLeft(col("seq")) { case (c, (pair, _)) => applyMerge(c, pair) })
          .localCheckpoint(false)
      }
    }
    merges.toSeq.toDF("step", "round", "pair", "merged", "n")
  }

  /** Segment the vocabulary with an already-trained merge table:
    * re-applies the rules in step order and returns (word, freq,
    * tokens array) — the "tokenize with this tokenizer" half of the
    * pair, same rewrite convention. `mergesLocal` is the collected
    * rule list (it is k rows by construction — driver-sized). */
  def segmentWords(docs: DataFrame, textCol: String,
                   mergesLocal: Seq[(Int, String)],
                   byteLevel: Boolean = false): DataFrame = {
    var vocab = wordVocab(docs, textCol, byteLevel)
    mergesLocal.sortBy(_._1).foreach { case (_, pair) =>
      vocab = vocab.withColumn("seq", applyMerge(col("seq"), pair))
    }
    vocab.select(col("word"), col("freq"), split(col("seq"), " ").as("tokens"))
  }

  /** Encode `target` documents to token ids with an already-trained
    * merge table — the corpus→ids step that feeds sequence packing.
    *
    * The id table derives from `corpus`: segment its vocabulary, then
    * number distinct tokens by (corpus occurrence frequency desc, token
    * asc) — the conventional frequency-ordered tokenizer vocabulary,
    * deterministic across engines. Each target word expands to its
    * token sequence; output is one row per (doc, word position, token
    * position) with the token and its id.
    *
    * Scale shape: the corpus collapses to its distinct-word vocabulary
    * once (the same one pass `trainMerges` already makes); the
    * frequency-ordered numbering is a window over the TOKEN vocabulary
    * — bounded at tens of thousands of rows for any corpus, the same
    * driver-bounded trade-off as the training argmax — and the id table
    * broadcasts to the per-word expansion join, so encoding a 100 TB
    * target is one shuffle on `word` plus a broadcast probe. */
  def encodeCorpus(corpus: DataFrame, target: DataFrame, idCol: String,
                   textCol: String, mergesLocal: Seq[(Int, String)],
                   byteLevel: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seg = segmentWords(corpus, textCol, mergesLocal, byteLevel)
    val tokenFreq = seg
      .select(explode(col("tokens")).as("token"), col("freq"))
      .groupBy("token").agg(sum(col("freq")).as("tf"))
    val ids = tokenFreq.withColumn("token_id",
      row_number().over(Window.orderBy(col("tf").desc, col("token").asc)))
    val docWords = target.select(col(idCol),
        posexplode(array_remove(
          split(lower(trim(coalesce(col(textCol), lit("")))), "\\s+"), ""))
          .as(Seq("wpos", "word")))
    docWords.join(seg.select("word", "tokens"), "word")
      .select(col(idCol), col("wpos"),
        posexplode(col("tokens")).as(Seq("tpos", "token")))
      .join(broadcast(ids.select("token", "token_id")), "token")
      .select(col(idCol), col("wpos").cast("long").as("wpos"),
        col("tpos").cast("long").as("tpos"), col("token"),
        col("token_id").cast("long").as("token_id"))
  }

  /** Tokenizer QA per source: fertility (tokens emitted per word — the
    * standard "is this tokenizer a fit for this corpus slice" number)
    * and the OOV fraction under a top-`vocabSize` id budget. A slice
    * whose fertility or OOV rate runs hot is being shredded into rare
    * tokens — retrain or re-weight before it burns sequence length.
    * One [[encodeCorpus]] pass plus a per-source hash aggregate. */
  def sourceFertility(docs: DataFrame, idCol: String, textCol: String,
                      groupCol: String, mergesLocal: Seq[(Int, String)],
                      vocabSize: Int, byteLevel: Boolean = false): DataFrame = {
    val enc = encodeCorpus(docs, docs, idCol, textCol, mergesLocal, byteLevel)
    enc.join(docs.select(col(idCol), col(groupCol)), Seq(idCol))
      .groupBy(col(groupCol))
      .agg(
        countDistinct(col(idCol), col("wpos")).as("n_words"),
        count(lit(1)).as("n_tokens"),
        sum(when(col("token_id") > vocabSize, 1L).otherwise(0L)).as("n_oov"))
      .select(col(groupCol),
        col("n_words"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("n_words"), 6).as("fertility"),
        round(col("n_oov").cast("double") / col("n_tokens"), 6).as("oov_frac"))
  }
}
