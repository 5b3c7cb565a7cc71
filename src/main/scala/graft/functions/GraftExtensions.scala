package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering the engine's native SQL functions —
  * `SELECT vector_cosine(embedding, q) FROM …` works from plain SQL once
  * the session is built with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (set by
  * [[graft.GraftSession]], Verify, and Bench).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(cls: Class[_], name: String, usage: String) =
    new ExpressionInfo(cls.getName, null, name, usage,
      "", "", "", "misc_funcs", "1.0.0", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      info(classOf[FloatVectorDot], "vector_dot",
        "vector_dot(a, b) - dot product of two float vectors"),
      (children: Seq[Expression]) => FloatVectorDot(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("vector_cosine"),
      info(classOf[FloatVectorCosine], "vector_cosine",
        "vector_cosine(a, b) - cosine similarity of two float vectors"),
      (children: Seq[Expression]) => FloatVectorCosine(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      info(classOf[NfcNormalize], "nfc_normalize",
        "nfc_normalize(s) - Unicode NFC canonical composition of s"),
      (children: Seq[Expression]) => NfcNormalize(children.head)))
    ext.injectFunction((
      FunctionIdentifier("luhn_check"),
      info(classOf[LuhnCheck], "luhn_check",
        "luhn_check(s) - true iff s is a Luhn-valid card-number candidate"),
      (children: Seq[Expression]) => LuhnCheck(children.head)))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      info(classOf[WordShingles], "word_shingles",
        "word_shingles(s, n) - distinct word n-grams of s (n a literal int)"),
      (children: Seq[Expression]) => WordShingles(children.head,
        shingleWidth(children))))
  }

  /** The shingle width must be a foldable INT — anything else (BIGINT
    * literal, NULL, a column) gets a proper analysis error naming the
    * function instead of a bare ClassCastException/NPE at registration. */
  private def shingleWidth(children: Seq[Expression]): Int = {
    def fail(got: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        "_LEGACY_ERROR_USER_RAISED_EXCEPTION",
        Map("errorMessage" ->
          (s"word_shingles(s, n): the second argument must be a foldable INT " +
            s"literal (the shingle width), got $got")))
    if (children.size != 2) fail(s"${children.size} argument(s)")
    val n = children(1)
    if (!n.foldable) fail(s"non-foldable expression ${n.sql}")
    n.eval() match {
      case i: Int => i
      case null => fail("NULL")
      case other =>
        fail(s"${n.dataType.simpleString} value $other (cast it to INT)")
    }
  }
}
