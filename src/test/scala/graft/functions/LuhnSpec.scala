package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[LuhnCheck]] against hand-verified PANs, a pure-Scala re-derivation,
  * and both evaluation paths (codegen project vs interpreted filter). */
class LuhnSpec extends SparkSpec {
  import spark.implicits._

  private def scalaLuhn(s: String): Boolean = {
    val digits = s.filter(_.isDigit).reverse.map(_ - '0')
    if (s.exists(c => !c.isDigit && c != ' ' && c != '-')) false
    else digits.length >= 12 && digits.length <= 19 &&
      digits.zipWithIndex.map { case (d, i) =>
        if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum % 10 == 0
  }

  test("known PANs: valid test numbers pass, corruptions and junk fail") {
    val rows = Seq(
      "4539148803436467" -> true,   // visa test number
      "4539-1488-0343-6467" -> true,
      "4916 3385 0608 2832" -> true,
      "4539148803436468" -> false,  // checksum broken
      "1234-5678-9012-3456" -> false,
      "79927398713" -> false,       // luhn-valid but only 11 digits
      "799273987131" -> false,      // 12 digits, checksum broken
      "0000-0000-0000-0000" -> true, // degenerate but mod-10 clean
      "4539x1488y0343z6467" -> false, // stray separators invalidate
      "" -> false)
    val got = rows.map(_._1).toDF("c")
      .select(col("c"), TextOps.luhnValid(col("c")).as("ok")).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    rows.foreach { case (c, want) => assert(got(c) == want, s"'$c'") }
  }

  test("agrees with an independent scala derivation on random digit runs") {
    val rnd = new scala.util.Random(7)
    val cands = Seq.fill(300)(Seq.fill(10 + rnd.nextInt(12))(rnd.nextInt(10)).mkString)
    val got = cands.toDF("c")
      .select(col("c"), TextOps.luhnValid(col("c")).as("ok")).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cands.foreach(c => assert(got(c) == scalaLuhn(c), c))
  }

  test("null propagates; interpreted filter path agrees with codegen") {
    val df = Seq(Some("4539148803436467"), Some("4539148803436468"), None)
      .toDF("c")
    assert(df.select(TextOps.luhnValid(col("c"))).collect().map(_.isNullAt(0)).toSeq
      == Seq(false, false, true))
    // filter forces the predicate through the non-codegen eval path too
    assert(df.filter(TextOps.luhnValid(col("c"))).count() == 1L)
  }

  test("registered as a SQL function via GraftExtensions") {
    val r = spark.sql(
      "SELECT luhn_check('4539-1488-0343-6467'), luhn_check('1234567890123456')")
      .head()
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }
}
