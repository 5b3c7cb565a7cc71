package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece tokenizer (Schuster & Nakajima '12; the BERT tokenizer's
  * greedy longest-match-first inference, Devlin '19 §4.1 / Song '21
  * "Fast WordPiece") — the third production tokenizer family alongside
  * [[Bpe]] (merge-rule replay, char or byte level) and [[Unigram]]
  * (min-cost Viterbi): pieces carry a word-initial vs continuation
  * ROLE (continuations render `##piece`), and segmentation repeatedly
  * takes the LONGEST vocabulary piece matching at the cursor — a word
  * with no match at some cursor is `[UNK]` as a whole, never partially
  * segmented.
  *
  * Scale shape mirrors the Unigram family: one word table, substring
  * edges probe a BROADCAST vocabulary, and the greedy walk is a single
  * aggregate-fold expression per DISTINCT word (≤ maxWordLen steps,
  * each consuming ≥ 1 char) — no UDFs, no per-row Scala, fully
  * codegen-friendly, and the corpus is touched exactly once however
  * large it is.
  */
object WordPiece {

  /** Weighted symbol frequencies over the current merge state — the
    * denominator of the WordPiece likelihood score. */
  private[llm] def symbolCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("freq"), explode(split(col("seq"), " ")).as("sym"))
      .groupBy("sym").agg(sum(col("freq")).as("cnt"))

  /** LIKELIHOOD-trained merge rules — the real WordPiece training
    * criterion (Schuster & Nakajima '12 §III: pick the merge that most
    * increases corpus likelihood under a unigram LM, which reduces to
    * argmax freq(ab) / (freq(a)·freq(b)) — pointwise mutual information
    * rather than BPE's raw pair count). [[vocabFromCorpus]] remains the
    * frequency-seeded fallback for when no trained vocabulary exists.
    *
    * The round machinery is [[Bpe.trainMergesBatched]]'s, reused
    * verbatim: one corpus pass collapses to the distinct-word table,
    * then each of ⌈k/m⌉ rounds runs one pair count + one symbol count
    * over the vocabulary, ranks the top-[[Bpe.candidateWindow]]
    * candidates by (score desc, pair asc), greedily selects up to `m`
    * mutually independent pairs ([[Bpe.selectIndependent]] — the same
    * commuting-rewrite condition), and applies them in one two-pass
    * padded rewrite. Scores compare as IEEE doubles: counts are
    * corpus-bounded longs, fa·fb stays below 2^53, and one division is
    * bit-identical across engines — which is what lets the SQL oracle
    * replay the selection exactly.
    *
    * Returns (step, round, pair, merged, n, fa, fb): the winning pair's
    * round-start weighted count and both symbols' round-start
    * frequencies — all exact longs, so the score is derivable without
    * shipping a float. */
  def trainMerges(docs: DataFrame, textCol: String, k: Int, m: Int = 16): DataFrame = {
    require(k >= 1, "k must be positive")
    require(m >= 1, "m must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = Dedup.parallelize(Bpe.wordVocab(docs, textCol)).localCheckpoint(false)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String, String, Long, Long, Long)]
    val rounds = (k + m - 1) / m
    var step = 1
    var exhausted = false
    for (r <- 1 to rounds if !exhausted) {
      val want = math.min(m, k - m * (r - 1))
      val sc = symbolCounts(vocab)
      val ranked = Bpe.pairCounts(vocab)
        .withColumn("la", split(col("pair"), " ").getItem(0))
        .withColumn("rb", split(col("pair"), " ").getItem(1))
        .join(broadcast(sc.select(col("sym").as("la"), col("cnt").as("fa"))), Seq("la"))
        .join(broadcast(sc.select(col("sym").as("rb"), col("cnt").as("fb"))), Seq("rb"))
        .withColumn("score", col("n") / (col("fa") * col("fb")))
        .orderBy(col("score").desc, col("pair").asc)
        .limit(Bpe.candidateWindow(m))
        .select("pair", "n", "fa", "fb")
        .collect().map(row => (row.getString(0), row.getLong(1), row.getLong(2), row.getLong(3))).toSeq
      val byPair = ranked.map(t => t._1 -> t).toMap
      val chosen = Bpe.selectIndependent(ranked.map(t => (t._1, t._2)), want)
      if (chosen.isEmpty) exhausted = true
      else {
        chosen.foreach { case (pair, n) =>
          val (_, _, fa, fb) = byPair(pair)
          merges += ((step, r, pair, pair.replace(" ", ""), n, fa, fb))
          step += 1
        }
        vocab = vocab.withColumn("seq",
            chosen.foldLeft(col("seq")) { case (c, (pair, _)) => Bpe.applyMerge(c, pair) })
          .localCheckpoint(false)
      }
    }
    merges.toSeq.toDF("step", "round", "pair", "merged", "n", "fa", "fb")
  }

  /** Frequency-seeded vocabulary: every substring of length ≤
    * `maxPieceLen` counted with word-frequency weight, SEPARATELY per
    * role (word-initial at offset 0 vs continuation elsewhere — the
    * same surface string is two distinct pieces). All single-char
    * entries of both roles are kept (coverage: any word either
    * segments or is honestly [UNK] only through a MISSING single char,
    * which full coverage rules out), plus the top
    * (vocabSize − #chars) multi-char pieces by (n desc, piece asc,
    * initial-role first) — a total order, so the cut is deterministic
    * and an oracle can replay it. */
  def vocabFromCorpus(docs: DataFrame, textCol: String, vocabSize: Int,
                      maxPieceLen: Int = 6): DataFrame = {
    require(vocabSize >= 1 && maxPieceLen >= 1, "vocabSize and maxPieceLen must be positive")
    val words = Unigram.wordTable(docs, textCol)
    val L = length(col("word"))
    val pieces = words.select(col("freq"), explode(
        flatten(transform(sequence(lit(1), L), i =>
          transform(sequence(lit(1), least(lit(maxPieceLen), L - i + 1)), len =>
            struct(col("word").substr(i, len).as("piece"),
              (i > 1).as("cont")))))).as("e"))
      .select(col("freq"), col("e.piece").as("piece"), col("e.cont").as("cont"))
      .groupBy("piece", "cont").agg(sum(col("freq")).as("n"))
    val isChar = length(col("piece")) === 1
    val chars = pieces.filter(isChar)
    val nChars = chars.count().toInt
    val multi = pieces.filter(!isChar)
      .orderBy(col("n").desc, col("piece").asc, col("cont").asc)
      .limit(math.max(0, vocabSize - nChars))
    chars.unionByName(multi)
  }

  /** Greedy longest-match-first segmentation of each word in `words`
    * (word, freq) against `vocab` (piece, cont). Words longer than
    * `maxWordLen` are [UNK] as a whole — BERT's
    * `max_input_chars_per_word` semantics (the bound is also what
    * keeps the oracle's recursive replay finite); they are emitted,
    * never dropped, so token counts and fertility see every word.
    * Returns (word, freq, pieces, n_pieces, is_unk) — continuation
    * pieces rendered `##piece`; an [UNK] word keeps n_pieces = 1. */
  def segmentWords(words: DataFrame, vocab: DataFrame,
                   maxPieceLen: Int = 6, maxWordLen: Int = 16): DataFrame = {
    val L = length(col("word"))
    val overLong = words.filter(L > maxWordLen)
      .select(col("word"), col("freq"), array(lit("[UNK]")).as("pieces"),
        lit(1L).as("n_pieces"), lit(true).as("is_unk"))
    val inRange = words.filter(L <= maxWordLen)
    val cands = inRange
      .select(col("word"), col("freq"), explode(
        flatten(transform(sequence(lit(0), L - 1), i =>
          transform(sequence(i + 1, least(L, i + lit(maxPieceLen))), j =>
            struct(i.as("i"), j.as("j"),
              col("word").substr(i + 1, j - i).as("piece"),
              (i > 0).as("cont")))))).as("e"))
    // LEFT-outer broadcast probe: every substring row survives, so every
    // word keeps a row even when NOTHING matches (collect_list skips the
    // null entries → empty edge set → [UNK]) — no second word-level
    // rejoin, the whole expansion stays on one broadcast join
    val withEdges = cands
      .join(broadcast(vocab.select(col("piece"), col("cont"))),
        col("e.piece") === col("piece") && col("e.cont") === col("cont"), "left")
      .groupBy(col("word"), col("freq"))
      .agg(collect_list(when(col("piece").isNotNull,
        struct(col("e.i").as("i"), col("e.j").as("j"),
          col("e.piece").as("piece"), col("e.cont").as("cont")))).as("edges"))
    // greedy walk: ≤ L steps, each either consumes the longest match at
    // the cursor (array_max orders the struct by j first — j values at
    // one cursor are distinct, so "max j" IS "longest") or goes dead
    val walk = aggregate(
      sequence(lit(1), length(col("word"))),
      struct(lit(0).as("pos"), lit("").as("path"),
        lit(0).as("n"), lit(false).as("dead")),
      (acc, _) => {
        val best = array_max(transform(
          filter(col("edges"), e => e("i") === acc("pos")),
          e => struct(e("j").as("j"), e("piece").as("piece"), e("cont").as("cont"))))
        when(acc("dead") || acc("pos") >= length(col("word")), acc)
          .otherwise(when(best.isNull,
            struct(acc("pos").as("pos"), acc("path").as("path"),
              acc("n").as("n"), lit(true).as("dead")))
          .otherwise(struct(
            best("j").as("pos"),
            concat(acc("path"),
              when(acc("pos") === 0, lit("")).otherwise(lit(" ")),
              when(best("cont"), lit("##")).otherwise(lit("")),
              best("piece")).as("path"),
            (acc("n") + 1).as("n"), lit(false).as("dead"))))
      })
    withEdges.withColumn("w", walk)
      .withColumn("is_unk", col("w.dead") || col("w.pos") < length(col("word")))
      .select(col("word"), col("freq"),
        when(col("is_unk"), array(lit("[UNK]")))
          .otherwise(split(col("w.path"), " ")).as("pieces"),
        when(col("is_unk"), lit(1L)).otherwise(col("w.n").cast("long")).as("n_pieces"),
        col("is_unk"))
      .unionByName(overLong)
  }
}
