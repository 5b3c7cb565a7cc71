package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: token counting, language ID,
  * quality scoring, fingerprinting. Pure `Column` expressions — every
  * operator runs inside whole-stage codegen and scales as a narrow map
  * over the corpus (no shuffle at all until the caller aggregates).
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count: word pieces + standalone punctuation, the
    * usual `\w+|[^\w\s]` pre-tokenizer regex. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** Character classes for quality stats. */
  def punctRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, 0.0).otherwise(
      length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double") / n.cast("double"))
  }

  def upperRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, 0.0).otherwise(
      length(regexp_replace(text, "[^A-Z]", "")).cast("double") / n.cast("double"))
  }

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "pour", "une"),
    "es" -> Seq("el", "la", "los", "y", "es", "en", "que", "por"))

  /** Stopword-hit count for one language's list (word-boundary matches on
    * the lowercased text). */
  def stopwordHits(text: Column, lang: String): Column = {
    val pattern = "\\b(" + stopwords(lang).mkString("|") + ")\\b"
    size(regexp_extract_all(lower(text), lit(pattern), lit(0)))
  }

  /** n-gram-heuristic language ID: CJK codepoints → zh; otherwise argmax
    * of per-language stopword hits, 'und' (undetermined) when no list
    * fires. Deterministic ties: language list order. */
  def langId(text: Column): Column = {
    val cjk = length(regexp_replace(text, "[^\\p{IsHan}]", "")) > 0
    val scored = Seq("en", "de", "fr", "es").map(l => (l, stopwordHits(text, l)))
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    // foldRight: earlier languages win ties; CJK short-circuits everything
    val pick = scored.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
    when(cjk, lit("zh")).otherwise(pick)
  }

  /** Composite quality score in [0,1]: reward mid-length docs and healthy
    * word length, penalize punctuation/uppercase excess. The exact blend is
    * this engine's policy (the reference has no equivalent); each component
    * is independently usable. */
  def qualityScore(text: Column): Column = {
    val toks = tokenCount(text).cast("double")
    val meanWordLen = when(toks > 0, length(trim(text)).cast("double") / toks).otherwise(0.0)
    val lenScore = least(toks / lit(100.0), lit(1.0))                 // saturates at 100 tokens
    val wordLenScore = when(meanWordLen.between(3.0, 12.0), 1.0).otherwise(0.5)
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val upperScore = lit(1.0) - least(upperRatio(text) * 5.0, lit(1.0))
    round((lenScore * 0.4 + wordLenScore * 0.2 + punctScore * 0.2 + upperScore * 0.2), 6)
  }

  /** Content fingerprint of the normalized text (lowercase, collapsed
    * whitespace): md5 for a canonical id, xxhash64 for a cheap 64-bit
    * join key. */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  def fingerprintMd5(text: Column): Column = md5(normalized(text))
  def fingerprint64(text: Column): Column = xxhash64(normalized(text))

  /** Mojibake repair — the core fix of ftfy (Speer,
    * github.com/rspeer/python-ftfy): web text whose UTF-8 bytes were
    * mis-decoded as Latin-1 once ("cafÃ©", "â€œquotedâ€") is
    * restored by reversing the damage — re-encode as Latin-1, decode
    * as UTF-8. Applied only when BOTH hold: the text carries a
    * double-encoding signature (Ã/Â/â followed by chars in the
    * Latin-1 continuation range U+0080–U+00BF — exactly what UTF-8
    * multi-byte sequences decode to) and every char fits in Latin-1
    * (so the re-encode is lossless). Clean text — including genuine
    * single-encoded accents like "São" — passes through untouched.
    * One pass fixes one layer of damage; doubly-mojibaked text needs
    * a second application. Pure Column expression, codegen-friendly. */
  def fixMojibake(text: Column): Column = {
    val signature = "[\\u00c2\\u00c3][\\u0080-\\u00bf]|\\u00e2[\\u0080-\\u00bf]{2}"
    val latin1Only = "^[\\u0000-\\u00ff]*$"
    when(text.rlike(signature) && text.rlike(latin1Only),
      decode(encode(text, "ISO-8859-1"), "UTF-8")).otherwise(text)
  }

  /** Character-level Shannon entropy (bits/char) — the standard cheap
    * gibberish detector: natural language sits ~3.5–4.5 bits, repeated
    * padding near 0, random base64 near 6. Pure Column expression: one
    * pass builds the distinct-char array, a fold accumulates
    * −Σ p·log₂p; O(distinct·len) per row, no shuffle. Rounded to 4
    * decimals so the double fold order never shows. */
  def charEntropy(text: Column): Column = {
    val chars = split(text, "")
    val n = size(chars).cast("double")
    val h = aggregate(array_distinct(chars), lit(0.0), (acc, ch) => {
      val p = size(filter(chars, c => c === ch)).cast("double") / n
      acc - p * log(2.0, p)
    })
    when(text.isNull, lit(null).cast("double"))
      .when(length(text) === 0, 0.0)
      .otherwise(round(h, 4))
  }

  // ── repetition filters (the Gopher-rules family) ─────────────────────
  // Machine-generated and boilerplate text repeats itself; the standard
  // filters threshold on the duplicate fraction of lines and of word
  // n-grams. Pure Column expressions — still a narrow codegen map.

  /** Fraction of non-blank lines that are duplicates of an earlier line
    * (0 for docs with ≤1 line). */
  def dupLineFraction(text: Column): Column = {
    val lines = filter(transform(split(text, "\n"), l => trim(l)), l => length(l) > 0)
    val n = size(lines)
    when(n <= 1, 0.0)
      .otherwise((n - size(array_distinct(lines))).cast("double") / n.cast("double"))
  }

  /** Fraction of word n-grams that are duplicates of an earlier n-gram
    * (0 for docs shorter than n words). */
  def dupNgramFraction(text: Column, n: Int): Column = {
    val words = split(lower(trim(text)), "\\s+")
    val total = size(words) - (n - 1)
    val grams = transform(sequence(lit(0), size(words) - n),
      i => concat_ws(" ", slice(words, i + 1, lit(n))))
    when(total <= 0, 0.0)
      .otherwise((total - size(array_distinct(grams))).cast("double") / total.cast("double"))
  }

  // ── script mix ───────────────────────────────────────────────────────

  /** Script classes and their codepoint ranges (BMP only — each listed
    * char is one codepoint in both engines' length()). Order is the
    * deterministic dominance tie-break: earlier wins on equal counts. */
  val Scripts: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z]",
    "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
    "cjk" -> "[\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}]", // han + kana
    "arabic" -> "[\\x{0600}-\\x{06FF}]",
    "greek" -> "[\\x{0370}-\\x{03FF}]",
    "digit" -> "[0-9]")

  /** Per-document Unicode script profile — the triage step of a
    * multilingual pipeline (route by script before n-gram language ID,
    * catch mojibake and binary-junk pages as `other`). One narrow
    * codegen map: per-class counts are length deltas under
    * `regexp_replace`, fractions are over non-whitespace codepoints,
    * `dominant` is the count argmax with the [[Scripts]] order breaking
    * ties, `other` covering punctuation and unlisted scripts. */
  def scriptMix(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    val nonSpace = length(regexp_replace(text, "\\s", "")).cast("long")
    def count(re: String): Column =
      (length(text) - length(regexp_replace(text, re, ""))).cast("long")
    val counts = Scripts.map { case (name, re) => name -> count(re) }
    val listed = counts.map(_._2).reduce(_ + _)
    val withOther = counts :+ ("other" -> (nonSpace - listed))
    // argmax with list-order tie-break: name_i wins iff its count is
    // >= every later count and > every earlier one (earlier already lost)
    val dominant = withOther.zipWithIndex.foldRight(lit("none")) {
      case (((name, c), i), els) =>
        val beatsRest = withOther.drop(i + 1).map(_._2 <= c).foldLeft(lit(true))(_ && _)
        when(c > 0 && beatsRest, lit(name)).otherwise(els)
    }
    docs.select(
      col(idCol) +:
        nonSpace.as("n_chars") +:
        withOther.map { case (name, c) =>
          // NULL, not an engine-specific 0/0, for all-whitespace docs
          when(nonSpace > 0,
            round(c.cast("double") / nonSpace.cast("double"), 6)).as(s"${name}_frac")
        } :+
        dominant.as("dominant"): _*)
  }
}
