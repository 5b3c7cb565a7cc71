package graft.llm

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Public Suffix List rule set with the REAL matching semantics
  * (https://publicsuffix.org/list/ — the algorithm is public):
  *
  *   - normal rules (`co.uk`, `github.io`): the rule itself is a public
  *     suffix;
  *   - wildcard rules (`*.ck`): any single label under the parent is a
  *     public suffix (`bar.ck` is, so `foo.bar.ck` is registrable);
  *   - exception rules (`!www.ck`): the named domain is NOT a public
  *     suffix even though a wildcard says it is — its public suffix is
  *     the rule minus its leftmost label;
  *   - no matching rule: the top label alone is the public suffix (the
  *     implicit `*` default rule).
  *
  * The prevailing rule is the exception if one matches, else the longest
  * match. The REGISTRABLE (apex) domain is the public suffix plus one
  * label; a host that IS a public suffix (or shorter) passes through
  * unchanged.
  *
  * Lookups are O(labels) probes of in-memory hash sets — no per-row
  * scan of the rule list, so a full ~9k-rule PSL costs the same per row
  * as the curated default. The set ships to executors inside the
  * expression (a few hundred KB at full size — broadcast-by-closure is
  * the right scale for a static lookup table).
  *
  * [[PslRuleSet.full]] is the production default for web-corpus work:
  * the complete Mozilla `public_suffix_list.dat` ships as an embedded
  * resource (MPL-2.0, license header in-file) and parses once per JVM.
  * [[PslRuleSet.embedded]] remains as a tiny curated subset for tests;
  * [[PslRuleSet.parse]] / [[PslRuleSet.fromFile]] accept any standard
  * list file verbatim, comments and section markers included.
  */
final case class PslRuleSet(
    normal: Set[String],
    wildcard: Set[String],
    exception: Set[String],
    maxRuleLabels: Int) extends Serializable {

  /** Registrable (apex) domain of `host` under these rules. Hosts are
    * matched case-insensitively; a trailing dot (FQDN form) is ignored.
    * IDN contract: no punycode/Unicode conversion happens here — the
    * host must already be in the SAME form as the rules. The standard
    * Mozilla list is punycode (`xn--p1ai`, not `рф`), so feed punycode
    * hosts (the form URLs carry on the wire); a raw-Unicode host will
    * only hit the implicit `*` default rule and fall back to its last
    * two labels. Pre-normalize with `java.net.IDN.toASCII` upstream if
    * a corpus carries Unicode hosts. IPv4/IPv6 literals are not
    * meaningful inputs (same caveat as the PSL itself). */
  def apex(host: String): String = {
    if (host == null || host.isEmpty) return host
    val h = {
      val lower = host.toLowerCase
      if (lower.endsWith(".")) lower.dropRight(1) else lower
    }
    if (h.isEmpty) return host
    val labels = h.split('.')
    val n = labels.length
    if (n <= 1) return h
    // walk candidate suffixes short→long; the longest normal/wildcard
    // match prevails unless an exception matches (exception always wins)
    var psLen = 1 // implicit default rule '*'
    var excLen = -1
    var i = 1
    val maxI = math.min(n, maxRuleLabels + 1)
    val sb = new java.lang.StringBuilder(h.length)
    while (i <= maxI) {
      sb.setLength(0)
      var j = n - i
      while (j < n) {
        if (j > n - i) sb.append('.')
        sb.append(labels(j)); j += 1
      }
      val suffix = sb.toString
      if (exception.contains(suffix)) excLen = i - 1
      if (normal.contains(suffix) && i > psLen) psLen = i
      // '*.y' promotes one label under y to a public suffix; the host
      // must actually HAVE that label (i < n not required — i+1 ≤ n is)
      if (wildcard.contains(suffix) && i + 1 > psLen && i + 1 <= n) psLen = i + 1
      i += 1
    }
    if (excLen >= 0) psLen = excLen
    if (n <= psLen) h // host is itself a public suffix (or the ps exactly)
    else {
      sb.setLength(0)
      var j = n - psLen - 1
      while (j < n) {
        if (j > n - psLen - 1) sb.append('.')
        sb.append(labels(j)); j += 1
      }
      sb.toString
    }
  }

  /** UTF8String-in/out twin for the generated code path. */
  def apexUtf8(host: UTF8String): UTF8String =
    UTF8String.fromString(apex(host.toString))
}

object PslRuleSet {

  /** Parse rules in the standard `public_suffix_list.dat` line format:
    * blank lines and `//` comments skipped, one rule per line (anything
    * after whitespace ignored), `!` = exception, leading `*.` = wildcard
    * (stored by its parent). */
  def parse(lines: IterableOnce[String]): PslRuleSet = {
    val normal = Set.newBuilder[String]
    val wildcard = Set.newBuilder[String]
    val exception = Set.newBuilder[String]
    var maxLabels = 1
    lines.iterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("//")) {
        val rule = line.split("\\s+", 2)(0).toLowerCase
        val labels = rule.count(_ == '.') + 1
        if (labels > maxLabels) maxLabels = labels
        if (rule.startsWith("!")) exception += rule.drop(1)
        else if (rule.startsWith("*.")) wildcard += rule.drop(2)
        else if (rule != "*") normal += rule
      }
    }
    PslRuleSet(normal.result(), wildcard.result(), exception.result(), maxLabels)
  }

  /** Load the real Mozilla list (or any file in its format). */
  def fromFile(path: String): PslRuleSet = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }

  /** The FULL Mozilla list (~9.9k rules), embedded as a classpath
    * resource (`src/main/resources/public_suffix_list.dat`, MPL-2.0 —
    * the license header travels inside the file; the list is public
    * data published at publicsuffix.org). This is the production rule
    * set for web-corpus work; [[embedded]] remains the small
    * deterministic snippet the unit fixtures replay by hand. */
  lazy val full: PslRuleSet = {
    val in = getClass.getResourceAsStream("/public_suffix_list.dat")
    require(in != null, "public_suffix_list.dat missing from the classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }

  /** Curated snippet of the public list in its own file format (so the
    * default exercises the same parser a full file would): the
    * high-traffic ccTLD second-level registries, the known wildcard
    * ccTLDs with their exceptions, and common private-section hosting
    * suffixes. Swap in the full list with [[fromFile]] for production
    * web-corpus work. */
  lazy val embedded: PslRuleSet = parse(embeddedLines)

  private[llm] val embeddedLines: Seq[String] = Seq(
    "// ===BEGIN ICANN DOMAINS===",
    // wildcard ccTLDs (every label under them is a registry)
    "*.bd", "*.ck", "!www.ck", "*.er", "*.fk", "*.jm", "*.kh", "*.mm",
    "*.np", "*.pg", "*.ye",
    // Japanese prefecture-city wildcards with their city exceptions
    "*.kawasaki.jp", "!city.kawasaki.jp",
    "*.kitakyushu.jp", "!city.kitakyushu.jp",
    "*.kobe.jp", "!city.kobe.jp",
    "*.nagoya.jp", "!city.nagoya.jp",
    "*.sapporo.jp", "!city.sapporo.jp",
    "*.sendai.jp", "!city.sendai.jp",
    "*.yokohama.jp", "!city.yokohama.jp") ++
    Links.multiLabelSuffixes ++ Seq(
    "// ===BEGIN PRIVATE DOMAINS===",
    "github.io", "githubusercontent.com", "gitlab.io", "blogspot.com",
    "appspot.com", "herokuapp.com", "firebaseapp.com", "web.app",
    "netlify.app", "vercel.app", "azurewebsites.net", "cloudfront.net",
    "wordpress.com", "wixsite.com", "s3.amazonaws.com", "pages.dev",
    "workers.dev", "readthedocs.io", "surge.sh",
    // next tier: high-traffic hosting/CDN/platform suffixes — a host
    // under any of these is user content, so treating the platform
    // domain as the apex would collapse millions of independent sites
    // into one "domain" in per-domain caps and dedup keys
    "myshopify.com", "tumblr.com", "webflow.io", "ghost.io", "now.sh",
    "glitch.me", "onrender.com", "fly.dev", "repl.co", "amplifyapp.com",
    "elasticbeanstalk.com", "ondigitalocean.app", "trycloudflare.com",
    "r2.dev", "gitbook.io", "bitbucket.io", "codeberg.page", "deno.dev",
    "hf.space", "cloudfunctions.net", "fastlylb.net")
}

/** Registrable-domain resolution as a native unary expression: one hash
  * lookup per host label against the closure-shipped [[PslRuleSet]],
  * inside whole-stage codegen (a literal-IN over 9k rules would be a 9k-
  * way string compare per row; a lookup-table JOIN would shuffle or
  * broadcast per query — a referenced static object does neither). */
case class PslApex(child: Expression, rules: PslRuleSet) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    rules.apexUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rulesRef = ctx.addReferenceObj("pslRules", rules, classOf[PslRuleSet].getName)
    defineCodeGen(ctx, ev, c => s"$rulesRef.apexUtf8($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "psl_apex"
  // the default would print every rule into plan/explain output
  override def toString: String = s"psl_apex($child, rules=${rules.normal.size + rules.wildcard.size + rules.exception.size})"
}

/** Column-API entry point (see [[graft.llm.Links.apexDomainPsl]]). */
object Psl {
  def apexDomain(host: Column, rules: PslRuleSet = PslRuleSet.embedded): Column =
    GraftBridge.column(PslApex(GraftBridge.expression(host), rules))
}
