package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinksSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "see https://a.example.org/x and http://b.example.com:8080/y?q=1 end"),
    (2L, "bare text, no links at all"),
    (3L, "ref http://blocked.example.com/page then https://ok.example.org done")
  ).toDF("doc_id", "text")

  test("url extraction, counts, first host") {
    val out = docs.select(col("doc_id"),
        Links.urlCount(col("text")).as("n"),
        Links.firstHost(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out(1L) == ((2L, "a.example.org")))
    assert(out(2L)._1 == 0L && out(2L)._2 == null)
    assert(out(3L)._1 == 2L && out(3L)._2 == "blocked.example.com")
  }

  test("host handles ports; apexDomain keeps last two labels") {
    val hosts = Seq("a.b.example.org", "example.org", "localhost")
      .toDF("h").select(Links.apexDomain(col("h")).as("a")).as[String].collect()
    assert(hosts.toSeq == Seq("example.org", "example.org", "localhost"))
    val withPort = Seq("http://b.example.com:8080/y").toDF("u")
      .select(Links.host(col("u"))).as[String].head()
    assert(withPort == "b.example.com")
  }

  test("apexDomain is public-suffix aware: co.uk / com.au / com.vn keep three labels") {
    val cases = Seq(
      "news.bbc.co.uk"        -> "bbc.co.uk",
      "www.shop.example.co.uk" -> "example.co.uk",
      "mail.firm.com.au"      -> "firm.com.au",
      "vnpost.com.vn"         -> "vnpost.com.vn", // already registrable
      "hcm.vnpost.com.vn"     -> "vnpost.com.vn",
      "Sub.BBC.CO.UK"         -> "BBC.CO.UK",     // suffix match is case-blind
      "co.uk"                 -> "co.uk",         // bare suffix passes through
      "deep.a.b.example.org"  -> "example.org")   // non-PSL stays two-label
    val got = cases.map(_._1).toDF("h")
      .select(Links.apexDomain(col("h")).as("a")).as[String].collect()
    assert(got.toSeq == cases.map(_._2))
  }

  test("dropBlockedHosts removes docs linking to a blocked host") {
    val kept = Links.dropBlockedHosts(docs, "text", Seq("blocked.example.com"))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L))
  }

  test("scheme and host matching are case-insensitive (RFC 3986/4343)") {
    val mixed = Seq(
      (1L, "shouty HTTP://Blocked.Example.Com/x link"),
      (2L, "mixed HtTpS://ok.example.org fine")
    ).toDF("doc_id", "text")
    // uppercase scheme still extracts
    val counts = mixed.select(col("doc_id"), Links.urlCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 1L, 2L -> 1L))
    // mixed-case host cannot slip past a lowercase blocklist entry
    val kept = Links.dropBlockedHosts(mixed, "text", Seq("blocked.example.com"))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L))
    // and a mixed-case blocklist entry is normalized too
    val kept2 = Links.dropBlockedHosts(mixed, "text", Seq("BLOCKED.example.COM"))
      .select("doc_id").as[Long].collect().sorted
    assert(kept2.toSeq == Seq(2L))
  }

  test("canonicalUrl: case, fragments, tracking params, trailing slash") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      // scheme+host lowercase; path case preserved; trailing slash off
      ("HTTPS://Site.Example.ORG/Path/?utm_source=x&utm_campaign=y",
       "https://site.example.org/Path"),
      // tracking param removed mid-query; fragment stripped
      ("http://a.example.com/p?a=1&utm_medium=email&b=2#frag",
       "http://a.example.com/p?a=1&b=2"),
      // only-tracking query collapses; root slash trimmed after host
      ("http://b.example.com/?utm_source=t", "http://b.example.com"),
      // leading tracking param: surviving param promoted to '?'
      ("http://c.example.com/x?gclid=abc&q=2", "http://c.example.com/x?q=2"),
      // nothing to do stays identical
      ("http://plain.example.com/x?q=1", "http://plain.example.com/x?q=1"),
      // ref and fbclid are tracking too
      ("http://d.example.com/y?ref=hn&fbclid=z&keep=1", "http://d.example.com/y?keep=1"),
      // a '/' ending a query VALUE is not a trailing path slash
      ("http://x.example.com/login?next=/home/", "http://x.example.com/login?next=/home/"),
      // root '//' is left alone (no non-slash char precedes it)
      ("http://r.example.com//", "http://r.example.com//")
    )
    val got = cases.map(_._1).toDF("url")
      .select(Links.canonicalUrl(col("url")).as("c")).as[String].collect().toSeq
    assert(got == cases.map(_._2),
      got.zip(cases.map(_._2)).filter(p => p._1 != p._2).toString)
  }
}
