package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction for web-corpus ingestion — the stage between
  * a raw crawl payload and every text operator in this package
  * (dedup, quality, language ID all assume extracted text).
  *
  * Pure `Column` regex pipelines (codegen'd narrow maps, no UDF, no
  * shuffle): strip non-content blocks, drop tags, decode the five
  * predefined XML entities plus numeric escapes' common cases, and
  * collapse whitespace. Patterns stay inside the dialect-portable
  * subset shared by Java regex and RE2 (non-greedy `.*?`, `(?is)`
  * flags, no backreferences, no lookaround) — the same contract as
  * [[Pii]] and [[Links]] — so a second engine replays extraction
  * byte-for-byte. This is deliberately the deterministic-regex tier of
  * extraction (WET-style), not a DOM-fidelity parser: block-level
  * text-density heuristics (boilerpipe/trafilatura-class) would build
  * on [[htmlToText]]'s output per block rather than replace it. */
object Html {

  /** `<script>`/`<style>`/comment blocks vanish WITH their content;
    * every remaining tag drops; entities decode; whitespace collapses
    * to single spaces, trimmed. NULL in → NULL out. */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]+>", " ")
    val decoded = decodeEntities(noTags)
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** The five predefined XML entities + the numeric forms of the same
    * characters. `&amp;` decodes LAST so markup like `&amp;lt;` yields
    * the literal `&lt;` (one decoding pass, never two). */
  def decodeEntities(text: Column): Column = {
    val lt = regexp_replace(text, "&(lt|#60);", "<")
    val gt = regexp_replace(lt, "&(gt|#62);", ">")
    val quot = regexp_replace(gt, "&(quot|#34);", "\"")
    val apos = regexp_replace(quot, "&(apos|#39);", "'")
    regexp_replace(apos, "&(amp|#38);", "&")
  }

  /** Content of the first `<title>` element ('' when absent —
    * regexp_extract's no-match contract), entity-decoded and
    * whitespace-collapsed. */
  def htmlTitle(html: Column): Column =
    trim(regexp_replace(decodeEntities(
      regexp_extract(html, "(?is)<title\\b[^>]*>(.*?)</title>", 1)), "\\s+", " "))

  /** All href targets of `<a>` tags, document order (both quote
    * styles). */
  def htmlLinks(html: Column): Column =
    regexp_extract_all(html,
      lit("(?is)<a\\b[^>]*\\bhref\\s*=\\s*[\"']([^\"']*)[\"']"), lit(1))

  def htmlLinkCount(html: Column): Column = size(htmlLinks(html)).cast("long")
}
