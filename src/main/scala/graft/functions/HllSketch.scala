package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Mergeable HyperLogLog distinct-count sketch (Flajolet et al., AofA
  * 2007) completing the session's sketch suite (Misra–Gries heavy
  * hitters, KLL quantiles, Bloom membership, KMV overlap): COUNT
  * DISTINCT over 100 TB is a full shuffle of every distinct key;
  * this ships `2^p` bytes per group — one hash aggregate, partial+final,
  * streaming-state-compatible (the buffer IS the register array, merge
  * is element-wise max, so micro-batch state composes like any windowed
  * aggregate).
  *
  * Engine-neutral by construction, like the KMV sketch: the hash is the
  * MD5 of the value's UTF-8 bytes — bucket = first 16 bits mod `2^p`,
  * rank = leading-zero count of the next 48 bits + 1 — so a SQL engine
  * can replay the EXACT register array from `md5(k)` hex substrings and
  * the estimate from the same float expression (the oracle does; the
  * APPROXIMATE answer is hash-checkable, not just bounded).
  *
  * Determinism across merge orders and partitionings is structural:
  * registers combine by max (commutative, associative, idempotent) and
  * the estimate reads only the final registers. The register sum is
  * kept in the INTEGER domain (`Σ 2^(49-r)` as a 64-bit sum — exact;
  * `p <= 13` keeps the worst case `2^(p+49)` inside Long) and divided
  * by `2^49` once at the end, because a float `Σ 2^-r` would depend on
  * addition order and break replayability.
  *
  * Standard bias handling: `alpha_m · m² / Σ 2^-M_j` raw estimate with
  * linear counting below `2.5m` when empty registers remain. No 32-bit
  * large-range correction — the 48-bit rank domain doesn't saturate at
  * any cardinality this engine meets. Relative error ≈ `1.04/√m`.
  */
final class HllSketch(val p: Int) extends Serializable {
  require(p >= 4 && p <= 13, s"HLL precision must be in [4,13], got $p")
  private[functions] val registers = new Array[Byte](1 << p)

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  def insert(s: String): Unit = {
    md.reset()
    val h = md.digest(s.getBytes("UTF-8"))
    val m = registers.length
    val bucket = (((h(0) & 0xFF) << 8) | (h(1) & 0xFF)) % m
    var w = 0L
    var i = 2
    while (i < 8) { w = (w << 8) | (h(i) & 0xFF); i += 1 }
    // rank within the 48-bit domain: leading zeros + 1; w == 0 → 49
    val rho = (49 - (64 - java.lang.Long.numberOfLeadingZeros(w))).toByte
    if (rho > registers(bucket)) registers(bucket) = rho
  }

  def merge(other: HllSketch): HllSketch = {
    require(other.p == p, s"cannot merge HLL sketches of precision $p and ${other.p}")
    var i = 0
    while (i < registers.length) {
      if (other.registers(i) > registers(i)) registers(i) = other.registers(i)
      i += 1
    }
    this
  }

  /** Cardinality estimate; bit-replayable in SQL (see class doc). */
  def estimate: Double = {
    val m = registers.length
    var isum = 0L
    var zeros = 0
    var i = 0
    while (i < m) {
      isum += 1L << (49 - registers(i))
      if (registers(i) == 0) zeros += 1
      i += 1
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1 + 1.079 / m)
    }
    val raw = alpha * m * m / (isum.toDouble / HllSketch.Pow49)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }

  def serialize(): Array[Byte] = {
    val out = new Array[Byte](1 + registers.length)
    out(0) = p.toByte
    System.arraycopy(registers, 0, out, 1, registers.length)
    out
  }
}

object HllSketch {
  private[functions] val Pow49: Double = (1L << 49).toDouble

  def deserialize(bytes: Array[Byte]): HllSketch = {
    val s = new HllSketch(bytes(0).toInt)
    System.arraycopy(bytes, 1, s.registers, 0, s.registers.length)
    s
  }
}

/** `hll_distinct(k, p)` — approximate COUNT(DISTINCT k) as DOUBLE via a
  * one-pass mergeable HLL with `2^p` byte registers. NULLs are skipped
  * (COUNT DISTINCT semantics). See [[HllSketch]] for the error and
  * replayability contract. */
case class HllDistinctAgg(child: Expression, p: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HllSketch] {
  require(p >= 4 && p <= 13, s"HLL precision must be in [4,13], got $p")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${other.simpleString} (cast first " +
        "— the hash is over the value's string form so SQL oracles can replay it)")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): HllSketch = new HllSketch(p)

  override def update(buffer: HllSketch, input: InternalRow): HllSketch = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.toString)
    buffer
  }

  override def merge(buffer: HllSketch, other: HllSketch): HllSketch =
    buffer.merge(other)

  override def eval(buffer: HllSketch): Any = buffer.estimate

  override def serialize(buffer: HllSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): HllSketch =
    HllSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "hll_distinct"
}

/** `hll_sketch(k, p)` — like [[HllDistinctAgg]] but emits the SERIALIZED
  * register array (BINARY) instead of the estimate: the mergeable state
  * a maintained rollup stores, so "distinct users per day" can fold
  * incrementally forever ([[HllUnionAgg]] merges stored blobs,
  * [[HllEstimateExpr]] reads the number out). */
case class HllSketchAgg(child: Expression, p: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HllSketch] {
  require(p >= 4 && p <= 13, s"HLL precision must be in [4,13], got $p")
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${other.simpleString} (cast first)")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): HllSketch = new HllSketch(p)
  override def update(buffer: HllSketch, input: InternalRow): HllSketch = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.toString)
    buffer
  }
  override def merge(buffer: HllSketch, other: HllSketch): HllSketch = buffer.merge(other)
  override def eval(buffer: HllSketch): Any = buffer.serialize()
  override def serialize(buffer: HllSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): HllSketch = HllSketch.deserialize(bytes)
  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "hll_sketch"
}

/** `hll_union(blob)` — register-max union of serialized HLL sketches:
  * the GROUP BY-side merge a sketch-valued rollup column needs when an
  * incremental fold combines prior state with a fresh partial
  * ([[graft.marts.Marts.mergeRollup]]'s `mergeWith` hook). NULL blobs
  * are skipped; an all-NULL group yields NULL. Mixing precisions is an
  * error (sketches of different p cannot union). */
case class HllUnionAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Option[HllSketch]] {
  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY hll_sketch argument, got ${other.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def createAggregationBuffer(): Option[HllSketch] = None
  private def fold(acc: Option[HllSketch], s: HllSketch): Option[HllSketch] =
    acc match {
      case None => Some(s)
      case Some(a) => Some(a.merge(s))
    }
  override def update(buffer: Option[HllSketch], input: InternalRow): Option[HllSketch] = {
    val v = child.eval(input)
    if (v == null) buffer
    else fold(buffer, HllSketch.deserialize(v.asInstanceOf[Array[Byte]]))
  }
  override def merge(buffer: Option[HllSketch], other: Option[HllSketch]): Option[HllSketch] =
    other.map(o => fold(buffer, o).get).orElse(buffer)
  override def eval(buffer: Option[HllSketch]): Any = buffer.map(_.serialize()).orNull
  override def serialize(buffer: Option[HllSketch]): Array[Byte] =
    buffer.map(_.serialize()).getOrElse(Array.emptyByteArray)
  override def deserialize(bytes: Array[Byte]): Option[HllSketch] =
    if (bytes.isEmpty) None else Some(HllSketch.deserialize(bytes))
  override def withNewMutableAggBufferOffset(newOffset: Int): HllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "hll_union"
}

/** `hll_estimate(blob)` — cardinality estimate out of a serialized
  * sketch. Evaluated once per GROUP row (rollup reporting), not in any
  * per-input hot path, so interpreted eval is the right trade. */
case class HllEstimateExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY hll_sketch argument, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    HllSketch.deserialize(input.asInstanceOf[Array[Byte]]).estimate
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "hll_estimate"
}

/** Column-API entry point. */
object HllOps {
  def hllDistinct(value: Column, p: Int = 12): Column =
    GraftBridge.column(
      HllDistinctAgg(GraftBridge.expression(value), p).toAggregateExpression())

  def hllSketch(value: Column, p: Int = 12): Column =
    GraftBridge.column(
      HllSketchAgg(GraftBridge.expression(value), p).toAggregateExpression())

  def hllUnion(sketch: Column): Column =
    GraftBridge.column(
      HllUnionAgg(GraftBridge.expression(sketch)).toAggregateExpression())

  def hllEstimate(sketch: Column): Column =
    GraftBridge.column(HllEstimateExpr(GraftBridge.expression(sketch)))
}
