package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo, ACL'18 — the SentencePiece
  * default), the second tokenizer family next to [[Bpe]]: a piece
  * vocabulary with unigram costs, Viterbi (min-cost) segmentation of
  * each word, and hard-EM re-estimation of the costs from the chosen
  * segmentations.
  *
  * Everything is expressed so a SQL engine can replay it exactly:
  *   - piece costs are INTEGER micro-nats (`round(ln(total/n)·1e6)`),
  *     the same quantization the NLL/classifier family established —
  *     path costs are exact integer sums, order-independent;
  *   - the Viterbi tie-break is GLOBAL, not implementation-local: among
  *     equal-cost segmentations prefer fewer pieces, then the
  *     lexicographically smallest space-joined piece string. Because
  *     competing prefixes at char position i always cover the same
  *     characters, equal (cost, n) implies equal string length, and
  *     appending a common suffix preserves lexicographic order — so the
  *     per-position DP minimum composes to the global minimum, and an
  *     oracle that enumerates EVERY segmentation and sorts by the same
  *     triple must land on the identical answer (UnigramSpec proves the
  *     equivalence exhaustively on small words);
  *   - the DP itself is one `aggregate` fold over char positions — a
  *     narrow codegen-friendly expression per distinct WORD, no UDF, no
  *     iteration driver-side.
  *
  * Scale shape: the corpus collapses once to its distinct-word table
  * (the same pass BPE makes); seeding, segmentation, and EM recounting
  * all run over that vocabulary — O(words · maxWordLen · maxPieceLen)
  * work, independent of corpus size beyond the first pass. The piece
  * vocab rides a broadcast join into the per-word candidate expansion.
  */
object Unigram {

  /** Distinct words with corpus frequency (whitespace tokenize, lower). */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(trim(coalesce(col(textCol), lit("")))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Substring seed vocabulary: every substring of length <= maxPieceLen
    * counted with multiplicity, weighted by word frequency; ALL single
    * characters kept (full coverage — every word stays segmentable),
    * plus the top (vocabSize − #chars) multi-char pieces by
    * (count desc, piece asc). Costs in integer micro-nats, normalized
    * over the KEPT vocabulary. */
  def seedVocab(docs: DataFrame, textCol: String, vocabSize: Int,
                maxPieceLen: Int = 6): DataFrame = {
    require(vocabSize >= 1 && maxPieceLen >= 1, "vocabSize and maxPieceLen must be positive")
    val words = wordTable(docs, textCol)
    val L = length(col("word"))
    val pieces = words.select(col("freq"), explode(
        flatten(transform(sequence(lit(1), L), i =>
          transform(sequence(lit(1), least(lit(maxPieceLen), L - i + 1)), len =>
            col("word").substr(i, len))))).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("n"))
    val isChar = length(col("piece")) === 1
    val chars = pieces.filter(isChar)
    val nChars = chars.count().toInt
    val multi = pieces.filter(!isChar)
      .orderBy(col("n").desc, col("piece").asc)
      .limit(math.max(0, vocabSize - nChars))
    val kept = chars.unionByName(multi)
    val total = kept.agg(sum(col("n"))).head().getLong(0)
    kept.withColumn("cost",
      round(log(lit(total.toDouble) / col("n")) * 1e6).cast("long"))
  }

  private val Inf = 1000000000000000L // unreachable sentinel, far above any path sum

  /** Viterbi (min-cost) segmentation of each word in `words` against
    * `vocab` (piece, cost). Words longer than `maxWordLen` are skipped
    * (the rare-word bucket a production tokenizer handles byte-level —
    * and the bound that keeps the oracle's exhaustive replay finite).
    * Words with an unreachable position (vocab without full char
    * coverage) are skipped too. Returns (word, freq, pieces, cost, n_pieces). */
  def viterbiSegment(words: DataFrame, vocab: DataFrame,
                     maxPieceLen: Int = 6, maxWordLen: Int = 16): DataFrame = {
    val L = length(col("word"))
    val cands = words.filter(L <= maxWordLen)
      .select(col("word"), col("freq"), explode(
        flatten(transform(sequence(lit(0), L - 1), i =>
          transform(sequence(i + 1, least(L, i + lit(maxPieceLen))), j =>
            struct(i.as("i"), j.as("j"),
              col("word").substr(i + 1, j - i).as("piece")))))).as("e"))
    val edges = cands
      .join(broadcast(vocab.select(col("piece"), col("cost"))), col("e.piece") === col("piece"))
      .select(col("word"), col("freq"),
        struct(col("e.i").as("i"), col("e.j").as("j"), col("cost"),
          col("e.piece").as("piece")).as("edge"))
      .groupBy("word", "freq").agg(collect_list(col("edge")).as("edges"))
    // DP fold over positions 1..L: state[j] = min (cost, n, path) over
    // edges ending at j — array_min's struct ordering IS the global
    // tie-break (see class doc for why prefix-min composes)
    val dp = aggregate(
      sequence(lit(1), length(col("word"))),
      array(struct(lit(0L).as("cost"), lit(0).as("n"), lit("").as("path"))),
      (acc, j) => concat(acc, array(coalesce(
        array_min(transform(
          filter(col("edges"), e => e("j") === j && element_at(acc, e("i") + 1)("cost") < Inf),
          e => struct(
            (element_at(acc, e("i") + 1)("cost") + e("cost")).as("cost"),
            (element_at(acc, e("i") + 1)("n") + 1).as("n"),
            concat(
              when(e("i") === 0, lit("")).otherwise(
                concat(element_at(acc, e("i") + 1)("path"), lit(" "))),
              e("piece")).as("path")))),
        struct(lit(Inf).as("cost"), lit(0).as("n"), lit("").as("path"))))),
      acc => element_at(acc, length(col("word")) + 1))
    edges.withColumn("best", dp)
      .filter(col("best.cost") < Inf)
      .select(col("word"), col("freq"),
        split(col("best.path"), " ").as("pieces"),
        col("best.cost").as("cost"),
        col("best.n").cast("long").as("n_pieces"))
  }

  /** One hard-EM round: re-count each piece's usage across the corpus's
    * Viterbi segmentations (weighted by word frequency), drop pieces no
    * segmentation chose, and re-derive micro-nat costs over the
    * surviving vocabulary — the prune+re-estimate step that turns the
    * permissive substring seed into a peaked tokenizer vocabulary. */
  def emRound(words: DataFrame, vocab: DataFrame,
              maxPieceLen: Int = 6, maxWordLen: Int = 16): DataFrame = {
    val seg = viterbiSegment(words, vocab, maxPieceLen, maxWordLen)
    val counts = seg.select(col("freq"), explode(col("pieces")).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("n"))
    val total = counts.agg(sum(col("n"))).head().getLong(0)
    counts.withColumn("cost",
      round(log(lit(total.toDouble) / col("n")) * 1e6).cast("long"))
  }

  /** Document-level LM quality score — the CCNet-style signal: rank
    * documents by their likelihood under the trained unigram LM
    * (Wenzek et al. LREC'20 filter crawled text by LM perplexity;
    * gibberish and boilerplate score high-cost, fluent prose low).
    * Per document: Σ(min Viterbi path cost of each word occurrence)
    * in exact micro-nats, the piece count, the word count, and the
    * OOV count (words the vocabulary cannot segment — absent from the
    * Viterbi table: over `maxWordLen`, or no full-cover path). The
    * headline `avg_piece_cost_micro` = total/pieces is the mean
    * per-token negative log-likelihood, i.e. log-perplexity in
    * micro-nats.
    *
    * Scale shape: the DP runs once per DISTINCT word (word-vocabulary
    * sized, never corpus sized) and broadcasts into the per-occurrence
    * join; the only corpus-sized pass is the word explode + one
    * doc_id-keyed hash aggregate. Exact long arithmetic end to end —
    * the oracle replays it bit-for-bit from the same vocabulary CTEs. */
  def docPerplexity(docs: DataFrame, textCol: String, idCol: String,
                    vocab: DataFrame,
                    maxPieceLen: Int = 6, maxWordLen: Int = 16): DataFrame = {
    val seg = viterbiSegment(wordTable(docs, textCol), vocab, maxPieceLen, maxWordLen)
      .select(col("word"), col("cost"), col("n_pieces"))
    val dw = docs.select(col(idCol),
      explode(array_remove(
        split(lower(trim(coalesce(col(textCol), lit("")))), "\\s+"), "")).as("word"))
    dw.join(broadcast(seg), Seq("word"), "left")
      .groupBy(idCol)
      .agg(sum(col("cost")).as("total_cost_micro"),
           sum(col("n_pieces")).as("n_pieces"),
           sum(when(col("cost").isNull, 1L).otherwise(0L)).as("oov_words"),
           count(lit(1)).as("n_words"))
      .withColumn("avg_piece_cost_micro",
        round(col("total_cost_micro") / col("n_pieces"), 6))
  }
}
