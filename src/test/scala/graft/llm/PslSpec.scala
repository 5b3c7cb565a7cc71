package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Full PSL semantics: longest match, wildcard, exception, private
  * suffixes — the algorithm publicsuffix.org specifies, verified both on
  * the plain-Scala resolver and through the codegen'd Column path. */
class PslSpec extends SparkSpec {
  import spark.implicits._

  private val r = PslRuleSet.embedded

  test("normal rules: longest match wins; unknown TLDs use the default rule") {
    assert(r.apex("news.bbc.co.uk") == "bbc.co.uk")
    assert(r.apex("a.b.news.bbc.co.uk") == "bbc.co.uk")
    assert(r.apex("shop.example.com.au") == "example.com.au")
    assert(r.apex("www.sample.org") == "sample.org")
    assert(r.apex("x.unknown-tld") == "x.unknown-tld")
    assert(r.apex("deep.x.unknown-tld") == "x.unknown-tld")
  }

  test("private-section suffixes: user.github.io does NOT mis-group to github.io") {
    assert(r.apex("user.github.io") == "user.github.io")
    assert(r.apex("a.user.github.io") == "user.github.io")
    assert(r.apex("github.io") == "github.io") // a public suffix passes through
    assert(r.apex("me.s3.amazonaws.com") == "me.s3.amazonaws.com")
    // next-tier hosting/CDN suffixes: each user site is its own apex
    assert(r.apex("shop.myshopify.com") == "shop.myshopify.com")
    assert(r.apex("cdn.assets.shop.myshopify.com") == "shop.myshopify.com")
    assert(r.apex("app.onrender.com") == "app.onrender.com")
    assert(r.apex("api.my-app.fly.dev") == "my-app.fly.dev")
    assert(r.apex("tunnel.trycloudflare.com") == "tunnel.trycloudflare.com")
    assert(r.apex("space.hf.space") == "space.hf.space")
  }

  test("IDN contract: punycode hosts match punycode rules; raw Unicode does not") {
    // the embedded snippet has no IDN rules — the contract is about form:
    // a punycode host walks the rule sets like any ASCII host, while a
    // raw-Unicode host can only hit the implicit default rule
    val idn = PslRuleSet.parse(Seq("xn--p1ai", "com"))
    assert(idn.apex("site.xn--p1ai") == "site.xn--p1ai")
    assert(idn.apex("a.site.xn--p1ai") == "site.xn--p1ai")
    // same host in Unicode form misses the punycode rule → default rule
    assert(idn.apex("a.site.рф") == "site.рф")
    // java.net.IDN.toASCII is the documented upstream normalizer
    assert(java.net.IDN.toASCII("сайт.рф") == "xn--80aswg.xn--p1ai")
  }

  test("wildcard rules: *.ck promotes one label to a public suffix") {
    assert(r.apex("foo.bar.ck") == "foo.bar.ck")      // ps = bar.ck
    assert(r.apex("deep.foo.bar.ck") == "foo.bar.ck")
    assert(r.apex("bar.ck") == "bar.ck")              // itself a ps: pass through
    assert(r.apex("ck") == "ck")
  }

  test("exception rules: !www.ck carves www.ck out of the wildcard") {
    assert(r.apex("www.ck") == "www.ck")              // registrable despite *.ck
    assert(r.apex("sub.www.ck") == "www.ck")
    // Japanese city wildcards + exceptions
    assert(r.apex("sub.city.kawasaki.jp") == "city.kawasaki.jp")
    assert(r.apex("x.other.kawasaki.jp") == "x.other.kawasaki.jp") // ps = other.kawasaki.jp
  }

  test("case, trailing dot, degenerate hosts") {
    assert(r.apex("News.BBC.CO.UK") == "bbc.co.uk")
    assert(r.apex("news.bbc.co.uk.") == "bbc.co.uk")
    assert(r.apex("localhost") == "localhost")
    assert(r.apex("") == "")
    assert(r.apex(null) == null)
  }

  test("parser: standard file format — comments, sections, whitespace") {
    val parsed = PslRuleSet.parse(Seq(
      "// ===BEGIN ICANN DOMAINS===",
      "  com ",
      "*.custom",
      "!keep.custom",
      "",
      "// comment",
      "three.label.rule"))
    assert(parsed.normal.contains("com") && parsed.normal.contains("three.label.rule"))
    assert(parsed.wildcard.contains("custom"))
    assert(parsed.exception.contains("keep.custom"))
    assert(parsed.maxRuleLabels == 3)
    assert(parsed.apex("a.b.custom") == "a.b.custom")  // ps = b.custom
    assert(parsed.apex("x.keep.custom") == "keep.custom")
  }

  test("Column path matches the resolver and stays codegen'd") {
    val hosts = Seq("news.bbc.co.uk", "user.github.io", "deep.foo.bar.ck",
      "sub.www.ck", "www.sample.org", "x.unknown-tld").toDF("host")
    val got = hosts.select(col("host"), Links.apexDomainPsl(col("host")).as("apex"))
      .collect().map(row => row.getString(0) -> row.getString(1)).toMap
    assert(got == Map(
      "news.bbc.co.uk" -> "bbc.co.uk",
      "user.github.io" -> "user.github.io",
      "deep.foo.bar.ck" -> "foo.bar.ck",
      "sub.www.ck" -> "www.ck",
      "www.sample.org" -> "sample.org",
      "x.unknown-tld" -> "x.unknown-tld"), got.toString)
    // NULL host stays NULL through the native expression
    val nulls = Seq(Option.empty[String]).toDF("host")
      .select(Links.apexDomainPsl(col("host"))).collect()
    assert(nulls.head.isNullAt(0))
    // the expression participates in whole-stage codegen (no fallback) —
    // read from parquet so the plan has a real scan stage (a
    // LocalTableScan of inline rows never enters codegen at all)
    val dir = java.nio.file.Files.createTempDirectory("psl-plan").toString + "/hosts"
    hosts.write.parquet(dir)
    val plan = spark.read.parquet(dir).select(Links.apexDomainPsl(col("host")))
      .queryExecution.executedPlan.toString
    // the '*(n)' stage marker is how WholeStageCodegenExec prints members
    assert(plan.linesIterator.next().startsWith("*("), plan)
  }

  test("the embedded FULL Mozilla list loads and classifies real-world rule classes") {
    val full = PslRuleSet.full
    // ~9.9k rules parse (the exact count tracks the upstream list)
    assert(full.normal.size > 9000, s"only ${full.normal.size} normal rules")
    assert(full.wildcard.nonEmpty && full.exception.nonEmpty)
    // classes the curated snippet does NOT carry:
    assert(full.apex("me.blogspot.com") == "me.blogspot.com")          // private suffix
    assert(full.apex("bucket.a.s3.amazonaws.com") == "a.s3.amazonaws.com")
    assert(full.apex("www.rakuten.co.jp") == "rakuten.co.jp")          // ccTLD registry
    assert(full.apex("x.a.b.kawasaki.jp") == "a.b.kawasaki.jp")        // *.kawasaki.jp
    assert(full.apex("sub.city.kawasaki.jp") == "city.kawasaki.jp")    // !city exception
    // and the snippet's own cases still agree
    assert(full.apex("news.bbc.co.uk") == "bbc.co.uk")
    assert(full.apex("u.pages.github.io") == "pages.github.io")
    assert(full.apex("sub.www.ck") == "www.ck")
    assert(full.apex("deep.foo.bar.ck") == "foo.bar.ck")
  }

  test("loading a full-format file works end to end") {
    val f = java.nio.file.Files.createTempFile("psl", ".dat")
    java.nio.file.Files.writeString(f,
      "// test list\ncom\nco.uk\n*.ck\n!www.ck\ngithub.io\n")
    val fromFile = PslRuleSet.fromFile(f.toString)
    assert(fromFile.apex("news.bbc.co.uk") == "bbc.co.uk")
    assert(fromFile.apex("sub.www.ck") == "www.ck")
  }
}
