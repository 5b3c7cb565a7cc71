package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL and domain operators for web-corpus curation.
  *
  * Web-scraped training data is filtered by source domain (blocklists,
  * allowlists, per-domain caps) and analyzed by link density. These are
  * pure `Column` regex expressions — codegen'd narrow maps; the only
  * shuffle anywhere is the caller's own `groupBy(domain)`.
  *
  * The URL pattern is the pragmatic `https?://<non-space>+` — scraped
  * text does not delimit URLs any better than whitespace, and the
  * pattern is identical under Java regex and RE2 (dialect-portable, same
  * contract as [[Pii]]).
  */
object Links {

  val urlPattern: String = "(?i)https?://\\S+"

  /** Host-capture pattern: scheme then everything up to the first `/`,
    * `:` (port), or whitespace. Schemes are case-insensitive per RFC
    * 3986 — `(?i)` works identically in Java regex and RE2. */
  val hostPattern: String = "(?i)https?://([^/\\s:]+)"

  /** All URLs in the text, document order. */
  def urls(text: Column): Column =
    regexp_extract_all(text, lit(urlPattern), lit(0))

  def urlCount(text: Column): Column = size(urls(text)).cast("long")

  /** Host of one URL ('' when the URL is malformed — regexp_extract's
    * no-match contract, identical across engines). */
  def host(url: Column): Column = regexp_extract(url, hostPattern, 1)

  /** Host of the first URL, NULL when the text has none (`get` is the
    * out-of-bounds-safe element access under ANSI mode). */
  def firstHost(text: Column): Column = host(get(urls(text), lit(0)))

  /** Two-label public suffixes (a curated snippet of the Mozilla Public
    * Suffix List — the high-traffic ccTLD second-level registries; the
    * full PSL would load the same way as a bigger literal set or a
    * broadcast lookup). Under one of these, the registrable domain is
    * THREE labels (`news.bbc.co.uk` → `bbc.co.uk`), not two. */
  val multiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "me.uk", "ltd.uk", "plc.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp", "lg.jp",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    "co.in", "net.in", "org.in", "ac.in", "edu.in", "res.in", "gov.in", "nic.in",
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za",
    "co.kr", "or.kr", "go.kr", "ac.kr", "ne.kr", "re.kr",
    "co.id", "or.id", "web.id", "ac.id", "sch.id", "go.id", "my.id",
    // the reference platform is Vietnamese — .vn second-level registries
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "ac.vn", "info.vn",
    "pro.vn", "health.vn", "int.vn", "name.vn", "biz.vn",
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "com.hk", "edu.hk", "gov.hk", "net.hk", "org.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "com.eg", "com.sa", "com.pk", "com.bd", "com.np", "com.kh", "com.lk")

  /** Registrable domain under REAL Public Suffix List semantics —
    * longest-match with wildcard (`*.ck`) and exception (`!www.ck`)
    * rules, including private-section suffixes (`user.github.io` stays
    * `user.github.io`, it does not mis-group to `github.io`). One hash
    * probe per host label via a codegen'd native expression
    * ([[PslApex]]); pass `PslRuleSet.fromFile("public_suffix_list.dat")`
    * to run the full Mozilla list — [[PslRuleSet.embedded]] is a
    * curated snippet with identical semantics. */
  def apexDomainPsl(hostCol: Column, rules: PslRuleSet = PslRuleSet.embedded): Column =
    Psl.apexDomain(hostCol, rules)

  /** Registrable-domain heuristic: last two dot-labels of the host —
    * unless those two labels are themselves a public suffix
    * ([[multiLabelSuffixes]]), where the apex is three labels
    * (`news.bbc.co.uk` → `bbc.co.uk`, not the wrong `co.uk`). The suffix
    * test is a codegen'd literal IN — no lookup table shuffles. Hosts
    * with ≤ 2 labels (including a bare public suffix) pass through.
    * Zero-dependency fallback; [[apexDomainPsl]] is the full-semantics
    * path (wildcards, exceptions, private suffixes). */
  def apexDomain(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val lastTwo = lower(concat_ws(".", element_at(labels, -2), element_at(labels, -1)))
    when(size(labels) <= 2, hostCol)
      .when(lastTwo.isin(multiLabelSuffixes: _*),
        concat_ws(".", element_at(labels, -3), element_at(labels, -2), element_at(labels, -1)))
      .otherwise(concat_ws(".", element_at(labels, -2), element_at(labels, -1)))
  }

  /** Canonical URL for dedup keying: lowercase the scheme+host, strip
    * the fragment, drop known tracking query parameters (utm_*, gclid,
    * fbclid, ref), drop a then-empty `?`, and trim one trailing slash
    * from a non-root path. Two scrapes of the same page differing only
    * in campaign noise collapse to one key — the standard first pass of
    * web-corpus URL dedup. Pure regex chain: codegen'd, shuffle-free,
    * dialect-portable (no lookbehind). */
  def canonicalUrl(url: Column): Column = {
    val noFragment = regexp_replace(url, "#.*$", "")
    // lowercase scheme://host; path and query keep their case
    val schemeHost = lower(regexp_extract(noFragment, "^((?i)https?://[^/\\s?]*)", 1))
    val rest = regexp_replace(noFragment, "^(?i)https?://[^/\\s?]*", "")
    val full = concat(schemeHost, rest)
    // each tracking param is removed WITH its preceding separator; if the
    // first surviving param then dangles after the path on a '&', promote
    // that first '&' to '?' ([^?&]* cannot cross an existing '?', so a
    // well-formed query is left alone)
    val noTrack = regexp_replace(full,
      "(?i)[?&](?:utm_[a-z]+|gclid|fbclid|ref)=[^&#\\s]*", "")
    val fixedQ = regexp_replace(noTrack, "^([^?&]*)&", "$1?")
    // one trailing slash off a non-root PATH — the [^?]* anchor keeps the
    // trim from firing on a URL with a query, whose final '/' belongs to
    // a parameter VALUE (?next=/home/), not the path
    regexp_replace(fixedQ, "^([^?]*[^/?])/$", "$1")
  }

  /** Drop documents containing a link to any blocked host — the
    * blocklist filter. The predicate is a codegen'd `exists` over the
    * extracted URL array; the blocklist broadcasts as a literal set
    * (blocklists are small; a million-entry list would instead
    * `explode` + broadcast anti-join). */
  def dropBlockedHosts(df: DataFrame, textCol: String, blocked: Seq[String]): DataFrame = {
    // hostnames are case-insensitive (RFC 4343): compare lowercased host
    // against a lowercased blocklist so 'Blocked.Example.Com' can't slip
    // past a lowercase entry
    val blockedLower = blocked.map(_.toLowerCase)
    df.filter(!exists(urls(col(textCol)), u => lower(host(u)).isin(blockedLower: _*)))
  }
}
