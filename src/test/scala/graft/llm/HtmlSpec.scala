package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): (String, String, Long) = {
    val r = Seq(html).toDF("h")
      .select(Html.htmlTitle(col("h")), Html.htmlToText(col("h")),
        Html.htmlLinkCount(col("h")))
      .head()
    (r.getString(0), r.getString(1), r.getLong(2))
  }

  test("script, style, and comment blocks vanish WITH their content") {
    val (_, text, _) = extract(
      """<body><p>keep this</p><script>var x = "<p>lose this</p>";</script>
        |<style>p { color: red }</style><!-- and this --><p>and keep this</p></body>""".stripMargin)
    assert(text == "keep this and keep this")
  }

  test("entities decode once, &amp; last — markup-escaping survives a single pass") {
    val (_, text, _) = extract("<p>&lt;tag&gt; &quot;q&quot; &apos;a&apos; &amp;lt; &#38;#60;</p>")
    // &amp;lt; must yield the literal "&lt;", never "<"
    assert(text == "<tag> \"q\" 'a' &lt; &#60;")
  }

  test("title is extracted from attributes-bearing tags, entity-decoded, collapsed") {
    val (title, _, _) = extract(
      "<html><head><title lang=\"en\">  A &amp; B \n title  </title></head><body>x</body></html>")
    assert(title == "A & B title")
    assert(extract("<body>no title</body>")._1 == "")
  }

  test("links count both quote styles and ignore href-less anchors") {
    val (_, _, n) = extract(
      """<a href="https://a.example/x">a</a><a href='https://b.example/y'>b</a><a name="anchor">c</a>""")
    assert(n == 2L)
  }

  test("whitespace collapses and tag boundaries never glue words together") {
    val (_, text, _) = extract("<div>alpha</div><div>beta\n\n  gamma</div>")
    assert(text == "alpha beta gamma")
  }

  test("NULL propagates") {
    val r = Seq(Option.empty[String]).toDF("h")
      .select(Html.htmlToText(col("h"))).head()
    assert(r.isNullAt(0))
  }
}
