package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0d, _+_)` — builds
  * three higher-order traversals with per-element lambda dispatch; at
  * corpus scale (billions of rows × 64–1024 dims) that overhead dominates.
  * These expressions make one primitive loop per row, participate in
  * whole-stage codegen via `doGenCode` (no boxing, no lambda frames), and
  * match the zip_with composition's NULL semantics exactly: length
  * mismatch OR any NULL element → NULL result. Both float and double
  * element types are accepted (accessors specialize at plan time).
  * Interpreted `nullSafeEval` keeps them correct off the codegen path.
  */
abstract class FloatVectorBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elementOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elementOk(left.dataType) && elementOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT|DOUBLE> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  protected def isDouble(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  protected def elemEval(e: Expression)(a: ArrayData, i: Int): Double =
    if (isDouble(e)) a.getDouble(i) else a.getFloat(i).toDouble

  protected def elemCode(e: Expression, arr: String, i: String): String =
    if (isDouble(e)) s"$arr.getDouble($i)" else s"(double) $arr.getFloat($i)"
}

/** dot(a, b) over two float vectors → double (NULL on length mismatch). */
case class FloatVectorDot(left: Expression, right: Expression) extends FloatVectorBinary {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var acc = 0.0; var i = 0; val n = x.numElements()
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null // zip_with semantics
        acc += elemEval(left)(x, i) * elemEval(right)(y, i); i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${elemCode(left, a, i)} * ${elemCode(right, b, i)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "vector_dot"
}

/** cosine(a, b) in ONE pass (dot, |a|, |b| accumulated together) → double;
  * NULL on length mismatch or zero-norm input. */
case class FloatVectorCosine(left: Expression, right: Expression) extends FloatVectorBinary {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0; val n = x.numElements()
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null // zip_with semantics
        val xi = elemEval(left)(x, i); val yi = elemEval(right)(y, i)
        dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
      }
      if (na == 0.0 || nb == 0.0) null else dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xi = ${elemCode(left, a, i)};
         |    double $yi = ${elemCode(right, b, i)};
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    if ($na == 0.0 || $nb == 0.0) { ${ev.isNull} = true; }
         |    else { ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)); }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "vector_cosine"
}

/** Column-API entry points (no SQL registration required). */
object VectorOps {

  def vectorDot(a: Column, b: Column): Column =
    GraftBridge.column(FloatVectorDot(GraftBridge.expression(a), GraftBridge.expression(b)))
  def vectorCosine(a: Column, b: Column): Column =
    GraftBridge.column(FloatVectorCosine(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** A float-vector literal usable as an argument (e.g. an ANN query). */
  def floatVectorLit(v: Array[Float]): Column =
    GraftBridge.column(
      org.apache.spark.sql.catalyst.expressions.Literal.create(v, ArrayType(FloatType)))
}
