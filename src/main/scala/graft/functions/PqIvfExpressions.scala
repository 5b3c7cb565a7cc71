package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen expressions for the PQ/IVF hot path.
  *
  * The previous, expression-composed forms (`array(k × vector_cosine)`
  * for the IVF cell, `m × ksub × (dot − 2·dot + dot)` literal trees for
  * the PQ code word, `m × element_at(array(ksub literals))` for ADC)
  * inlined O(k·d) literals into ONE generated method. Past k·m·ksub ≈ a
  * few dozen, janino's 64 KB per-method limit trips
  * (`ERROR CodeGenerator: failed to compile … generate_doConsume_0`)
  * and Spark silently falls back to INTERPRETED execution — correct,
  * but exactly the plan you don't want on an index-maintenance path at
  * scale, and the blow-up gets worse as k grows toward the √N a real
  * IVF wants. These expressions keep the codebooks/centroids as a plan
  * REFERENCE OBJECT (`ctx.addReferenceObj`, the broadcast-literal
  * pattern) so the generated code is O(1) in k: one virtual call into
  * a JIT-compiled loop per row, inside whole-stage codegen.
  *
  * Bit-parity contract (the DuckDB oracle hash-checks it): every loop
  * reproduces the composed form's arithmetic EXACTLY — left-to-right
  * double accumulation per dot product, distance composed as
  * `dot(v,v) − 2.0·dot(v,c) + dot(c,c)`, argmin/argmax ties to the
  * lowest index, NaN ordered largest (Spark's array_min/array_max
  * ordering), and the composed forms' NULL semantics (see each class).
  */
object PqIvfOps {

  /** codes(emb): PQ code word as array<int> of length m — the native
    * twin of the composed `array(m × argmin-distance)` form. */
  def pqEncode(emb: Column, books: Array[Array[Array[Float]]]): Column =
    GraftBridge.column(PqEncodeExpr(GraftBridge.expression(emb), books))

  /** cell(emb): nearest-centroid id, −1 for degenerate vectors. */
  def ivfCell(emb: Column, centroids: Array[Array[Float]]): Column =
    GraftBridge.column(IvfCellExpr(GraftBridge.expression(emb), centroids))

  /** ADC micro-distance of a stored code word against a query's
    * precomputed per-subspace table. */
  def adcFromCodes(codes: Column, micro: Array[Array[Long]]): Column =
    GraftBridge.column(AdcMicroFromCodesExpr(GraftBridge.expression(codes), micro))
}

private[functions] trait FloatArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<FLOAT|DOUBLE> argument, got ${other.simpleString}")
  }
  @transient protected lazy val isDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType
  protected def elem(a: ArrayData, i: Int): Double =
    if (isDouble) a.getDouble(i) else a.getFloat(i).toDouble
}

/** PQ code word of a vector: per subspace j, the argmin of
  * `dot(v,v) − 2·dot(v,c) + dot(c,c)` over the ksub centroids, ties to
  * the lowest code. NULL-semantics parity with the composed form: a
  * NULL vector, a subspace sliced past the vector's length, or a NULL
  * element anywhere in the subspace yields a NULL CODE at that
  * position — the result array itself is never NULL. */
case class PqEncodeExpr(child: Expression, books: Array[Array[Array[Float]]])
    extends UnaryExpression with FloatArrayInput {
  require(books.nonEmpty && books.head.nonEmpty && books.head.head.nonEmpty,
    "pq_encode needs non-empty codebooks")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def nullable: Boolean = false

  def encodeRow(a: ArrayData): ArrayData = {
    val m = books.length; val dsub = books(0)(0).length
    val out = new Array[Any](m)
    if (a != null) {
      val n = a.numElements()
      var j = 0
      while (j < m) {
        val base = j * dsub
        var subNull = base + dsub > n
        var i = 0
        while (!subNull && i < dsub) {
          if (a.isNullAt(base + i)) subNull = true
          i += 1
        }
        if (!subNull) {
          // dot(v,v), then per centroid dot(v,c) and dot(c,c), each a
          // separate left-to-right accumulation — the composed form's
          // exact arithmetic
          var vv = 0.0; i = 0
          while (i < dsub) { val x = elem(a, base + i); vv += x * x; i += 1 }
          val bj = books(j)
          var best = -1; var bestD = 0.0
          var c = 0
          while (c < bj.length) {
            val cb = bj(c)
            var vc = 0.0; i = 0
            while (i < dsub) { vc += elem(a, base + i) * cb(i).toDouble; i += 1 }
            var cc = 0.0; i = 0
            while (i < dsub) { val ci = cb(i).toDouble; cc += ci * ci; i += 1 }
            val dist = vv - 2.0 * vc + cc
            // first-minimum tie-break; Double.compare orders NaN largest,
            // matching array_min
            if (best < 0 || java.lang.Double.compare(dist, bestD) < 0) {
              best = c; bestD = dist
            }
            c += 1
          }
          out(j) = best
        }
        j += 1
      }
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any =
    encodeRow(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncodeExpr", this, classOf[PqEncodeExpr].getName)
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $ref.encodeRow(${c.isNull} ? null : ${c.value});
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}

/** Nearest-centroid IVF cell: argmax cosine over the k centroids, ties
  * to the lowest cell, NaN ordered largest (array_max parity). Parity
  * with the composed `coalesce(array_position(...) − 1, −1)` form: any
  * vector whose every cosine is NULL (NULL vector, NULL element,
  * length mismatch, zero norm) lands in cell −1 — indexed, never
  * probed; a zero-norm CENTROID contributes a NULL cosine that is
  * simply skipped. */
case class IvfCellExpr(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression with FloatArrayInput {
  require(centroids.nonEmpty, "ivf_cell needs at least one centroid")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  def cellRow(a: ArrayData): Int = {
    if (a == null) return -1
    val n = a.numElements()
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return -1; i += 1 }
    var best = -1; var bestCos = 0.0
    var c = 0
    while (c < centroids.length) {
      val ct = centroids(c)
      if (ct.length == n) {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        i = 0
        while (i < n) {
          val xi = elem(a, i); val yi = ct(i).toDouble
          dot += xi * yi; na += xi * xi; nb += yi * yi
          i += 1
        }
        if (na != 0.0 && nb != 0.0) {
          val cos = dot / (math.sqrt(na) * math.sqrt(nb))
          // strict > keeps the FIRST maximum (array_position parity);
          // Double.compare orders NaN largest (array_max parity)
          if (best < 0 || java.lang.Double.compare(cos, bestCos) > 0) {
            best = c; bestCos = cos
          }
        }
      }
      c += 1
    }
    best
  }

  override def eval(input: InternalRow): Any =
    cellRow(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCellExpr", this, classOf[IvfCellExpr].getName)
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        int ${ev.value} = $ref.cellRow(${c.isNull} ? null : ${c.value});
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "ivf_cell"
}

/** ADC micro-distance of a stored code word: Σ_j micro(j)(codes(j)).
  * NULL if the code word or any code in it is NULL (element_at-chain
  * parity); an out-of-range code throws, as the composed form does
  * under ANSI. */
case class AdcMicroFromCodesExpr(child: Expression, micro: Array[Array[Long]])
    extends UnaryExpression {
  require(micro.nonEmpty, "adc needs a non-empty micro-distance table")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<INT> argument, got ${other.simpleString}")
  }

  /** Boxed so Janino's generated call site can branch on null. */
  def adcRow(a: ArrayData): java.lang.Long = {
    if (a == null) return null
    if (a.numElements() < micro.length)
      // element_at past the end throws under ANSI; a short code word is
      // store corruption, never a legal row — fail loudly
      throw new ArrayIndexOutOfBoundsException(
        s"code word has ${a.numElements()} codes, ADC table expects ${micro.length}")
    var sum = 0L
    var j = 0
    while (j < micro.length) {
      if (a.isNullAt(j)) return null
      sum += micro(j)(a.getInt(j))
      j += 1
    }
    java.lang.Long.valueOf(sum)
  }

  override def eval(input: InternalRow): Any = {
    val r = adcRow(child.eval(input).asInstanceOf[ArrayData])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcExpr", this, classOf[AdcMicroFromCodesExpr].getName)
    val c = child.genCode(ctx)
    val boxed = ctx.freshName("adcBoxed")
    ev.copy(code =
      code"""
        ${c.code}
        java.lang.Long $boxed = $ref.adcRow(${c.isNull} ? null : ${c.value});
        boolean ${ev.isNull} = ($boxed == null);
        long ${ev.value} = ${ev.isNull} ? 0L : $boxed.longValue();
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "adc_micro_from_codes"
}
