package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-curation filters from the two canonical public web-corpus
  * pipelines: C4's line-level cleaning (Raffel et al., JMLR 2020, §2.2)
  * and Gopher's document-level quality rules (Rae et al., 2021,
  * Appendix A1.1). The reference pipeline curates relational CDC rows;
  * an LLM-ingest deployment of the same engine needs these text gates
  * in front of dedup (`Dedup`) and sampling (`Sampling`).
  *
  * Scale shape: both filters are pure `Column` expressions over one
  * corpus pass — no shuffle, no UDFs, no driver state. Line splitting
  * and per-line predicates run inside whole-stage codegen via the
  * higher-order array functions (`filter`/`transform`), so a 100 TB
  * corpus filters at scan speed with full column pruning.
  */
object Curation {

  /** Terminal-punctuation tail: period / bang / question mark /
    * straight or curly closing quote, optionally followed by spaces. */
  private val TerminalRe = "[.!?\"”]\\s*$"

  /** C4's per-line keep rule: terminal punctuation, at least `minWords`
    * whitespace-separated tokens, and no "javascript" mention. */
  def c4LineKeep(line: Column, minWords: Int = 3): Column =
    line.rlike(TerminalRe) &&
      size(regexp_extract_all(line, lit("\\S+"), lit(0))) >= minWords &&
      !lower(line).contains("javascript")

  /** C4 document cleaning: drop lines failing [[c4LineKeep]], then drop
    * whole documents that mention "lorem ipsum", contain a curly brace
    * (code), or retain fewer than `minKeptLines` lines. Returns one row
    * per input doc: `kept`, line counts, and the reassembled
    * `text_clean` (NULL for dropped docs).
    */
  def c4Filter(docs: DataFrame, idCol: String, textCol: String,
               minWords: Int = 3, minKeptLines: Int = 3,
               passthrough: Seq[String] = Nil): DataFrame = {
    val lines = split(col(textCol), "\n")
    val keptLines = filter(lines, l => c4LineKeep(l, minWords))
    val kept = !lower(col(textCol)).contains("lorem ipsum") &&
      !col(textCol).contains("{") &&
      size(keptLines) >= minKeptLines
    docs.select(
      col(idCol) +:
        kept.as("kept") +:
        size(lines).cast("long").as("n_lines") +:
        size(keptLines).cast("long").as("n_kept") +:
        when(kept, concat_ws("\n", keptLines)).as("text_clean") +:
        passthrough.map(col): _*)
  }

  /** The eight Gopher "required stopwords" — a document must contain at
    * least two to pass (rules out word-salad and non-English pages). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher quality metrics per document, each rounded to 6 dp so the
    * pass verdict compares engine-portable values:
    *  - `n_words` in [minWords, maxWords]
    *  - `mean_word_len` in [3, 10]
    *  - `symbol_ratio` ('#' or '…' per word) <= 0.1
    *  - `bullet_frac` (lines starting with a bullet) < 0.9
    *  - `ellipsis_frac` (lines ending with "..." or '…') < 0.3
    *  - `alpha_frac` (words containing a letter) >= 0.8
    *  - `stop_hits` (distinct required stopwords present) >= 2
    */
  def gopherStats(docs: DataFrame, idCol: String, textCol: String,
                  minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val text = col(textCol)
    val words = regexp_extract_all(text, lit("\\S+"), lit(0))
    val lines = split(text, "\n")
    val nWords = size(words).cast("long")
    val nLines = size(lines).cast("double")
    def occurrences(ch: String): Column = // ch must not be regex-special
      (length(text) - length(regexp_replace(text, ch, ""))).cast("double")
    // per-word ratios are explicitly NULL for word-free documents (n=0)
    // rather than riding each engine's divide-by-zero convention — both
    // engines then agree by construction (the oracle carries the same
    // CASE), and `pass` stays false through `0 BETWEEN minWords ...`
    def perWord(c: Column): Column = when(nWords > 0, round(c / nWords, 6))
    val meanLen = perWord(length(regexp_replace(text, "\\s", "")).cast("double"))
    val symbolRatio = perWord(occurrences("#") + occurrences("…"))
    val bulletFrac = round(size(filter(lines, l => ltrim(l).rlike("^[-*•]"))) / nLines, 6)
    val ellipsisFrac = round(size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$"))) / nLines, 6)
    val alphaFrac = perWord(size(filter(words, w => w.rlike("[A-Za-z]"))).cast("double"))
    val stopHits = GopherStopwords
      .map(w => when(lower(text).rlike("\\b" + w + "\\b"), 1).otherwise(0))
      .reduce(_ + _).cast("long")
    val base = docs.select(
      col(idCol), nWords.as("n_words"), meanLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"), bulletFrac.as("bullet_frac"),
      ellipsisFrac.as("ellipsis_frac"), alphaFrac.as("alpha_frac"),
      stopHits.as("stop_hits"))
    base.withColumn("pass",
      col("n_words").between(minWords, maxWords) &&
        col("mean_word_len").between(3.0, 10.0) &&
        col("symbol_ratio") <= 0.1 &&
        col("bullet_frac") < 0.9 &&
        col("ellipsis_frac") < 0.3 &&
        col("alpha_frac") >= 0.8 &&
        col("stop_hits") >= 2)
  }
}
