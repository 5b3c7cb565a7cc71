package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word-shingle computation shared by the interpreted and
  * generated paths of [[WordShingles]]. Static forwarders make it
  * callable from Janino-generated code. */
object ShingleUtil {
  private val Whitespace = Pattern.compile("\\s+")

  /** Distinct word n-grams of `text`, replicating exactly the composable
    * form `when(size(words) >= n, array_distinct(transform(sequence(0,
    * size-n), i => concat_ws(" ", slice(words, i+1, n))))).otherwise(
    * array(concat_ws(" ", words)))` over `words = split(lower(trim(text)),
    * "\\s+")` — including its edges: `trim` strips ASCII spaces only, the
    * split keeps interior/trailing empty tokens exactly like
    * `Pattern.split(s, -1)`, and short/empty input collapses to a single
    * whole-text shingle. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val s = text.trim().toLowerCase().toString
    val words = Whitespace.split(s, -1)
    if (words.length < n)
      return new GenericArrayData(Array[Any](UTF8String.fromString(words.mkString(" "))))
    // LinkedHashSet = array_distinct's keep-first-occurrence order
    val seen = new java.util.LinkedHashSet[String](words.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j)); j += 1
      }
      seen.add(sb.toString); i += 1
    }
    val out = new Array[Any](seen.size)
    var k = 0
    val it = seen.iterator()
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

/** Word n-gram shingle set as a native expression: whitespace-tokenize
  * `lower(trim(text))` and emit the distinct n-grams in one primitive
  * pass. The composable higher-order form ([[ShingleUtil.shingles]] doc)
  * is interpreted per element (ArrayTransform is CodegenFallback) and was
  * the measured hot path of every shingle-based operator; this expression
  * stays inside whole-stage codegen and evaluates each row once.
  *
  * NULL text yields `[""]`, not NULL — the same behavior the composable
  * form has (its `when` guard goes NULL, and the `concat_ws` fallback maps
  * a NULL array to the empty string), which downstream set algebra relies
  * on being consistent across engines. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    ShingleUtil.shingles(
      if (v == null) UTF8String.EMPTY_UTF8 else v.asInstanceOf[UTF8String], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.ShingleUtil.shingles(
            ${c.isNull} ? org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8 : ${c.value},
            $n);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

/** Shared NFC path for the interpreted and generated code of
  * [[NfcNormalize]]; static forwarder keeps it callable from Janino. */
object NfcUtil {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: already-composed text (all-ASCII in particular) skips
    // the normalizer allocation entirely — the overwhelmingly common
    // case, so the expression is ~a no-op on clean corpora
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Unicode NFC canonical composition as a native codegen expression
  * (UAX #15). Visually identical strings arrive from the web in
  * composed (U+00E9) and decomposed (U+0065 U+0301) forms; every
  * hash-based stage downstream — exact dedup, shingling, fingerprints,
  * URL keys — treats them as distinct documents unless text is
  * canonicalized first. Spark ships no normalizer built-in; a UDF
  * would break whole-stage codegen on the hottest per-row path, so
  * this stays a primitive expression with an isNormalized fast path.
  * NULL propagates as NULL (standard unary null semantics). */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = NfcUtil.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcUtil.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

/** Shared Luhn mod-10 path for [[LuhnCheck]]'s interpreted and generated
  * code; static forwarder keeps it callable from Janino. */
object LuhnUtil {
  /** True iff `s` is a Luhn-valid payment-card candidate: 12–19 digits,
    * optionally grouped by spaces or dashes, any other character makes
    * the candidate invalid outright. Right-to-left double-every-second
    * digit, subtract 9 above 9, sum divisible by 10 (ISO/IEC 7812). */
  def valid(s: UTF8String): Boolean = {
    val str = s.toString
    var sum = 0
    var nDigits = 0
    var i = str.length - 1
    while (i >= 0) {
      val c = str.charAt(i)
      if (c >= '0' && c <= '9') {
        var d = c - '0'
        if (nDigits % 2 == 1) { d *= 2; if (d > 9) d -= 9 }
        sum += d
        nDigits += 1
      } else if (c != ' ' && c != '-') return false
      i -= 1
    }
    nDigits >= 12 && nDigits <= 19 && sum % 10 == 0
  }
}

/** Luhn checksum validation as a native codegen expression. The PII
  * regex layer ([[graft.llm.Pii]]) flags 4-4-4-4 digit runs as card
  * CANDIDATES; this is the policy layer's validator that separates real
  * card numbers from random digit runs (phone fragments, order ids)
  * before a redaction decision. A boolean primitive keeps the check
  * inside whole-stage codegen next to the extraction regex. NULL
  * propagates as NULL. */
case class LuhnCheck(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = LuhnUtil.valid(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LuhnUtil.valid($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "luhn_check"
}

/** Column-API entry point. */
object TextOps {
  def wordShingles(text: Column, n: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(text), n))

  def nfcNormalize(text: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(text)))

  def luhnValid(candidate: Column): Column =
    GraftBridge.column(LuhnCheck(GraftBridge.expression(candidate)))
}
