package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable rank/quantile sketch in the KLL family (Karnin, Lang,
  * Liberty, FOCS 2016) with deterministic compaction.
  *
  * Why not `ORDER BY` + offset: an exact percentile over 100 TB is a
  * global sort. This sketch shuffles at most `cap · log2(n/cap)` doubles
  * per group — percentile monitoring (score distributions, length
  * histogram calibration, drift gates) at corpus scale for the cost of
  * one hash aggregate.
  *
  * Structure: level `i` holds sample values of weight `2^i`, each level
  * capped at `cap`. Inserts land in level 0; an overfull level sorts
  * and promotes its odd-indexed half (weight doubles) — the classic KLL
  * compactor, made deterministic by always keeping odd indices instead
  * of flipping a coin. Merging concatenates levels pairwise, then
  * re-compacts.
  *
  * Exactness contract: while total count `n <= cap`, level 0 never
  * compacts, so the sketch IS the full multiset and every quantile is
  * the exact rank-`floor(p·(n-1))` order statistic — independent of
  * partitioning and merge order (the correctness gate runs here).
  * Beyond `cap`, answers carry bounded rank error (≈ #levels/cap of
  * n per the KLL analysis; the deterministic compactor trades the
  * randomized bound's constants for replayability within one layout)
  * and may vary with partial-merge order, like every production sketch.
  */
final class QuantileSketch(val cap: Int) extends Serializable {
  private[functions] var levels: ArrayBuffer[ArrayBuffer[Double]] =
    ArrayBuffer(ArrayBuffer.empty[Double])

  def insert(v: Double): Unit = {
    levels(0) += v
    if (levels(0).length > cap) compact(0)
  }

  private def compact(i: Int): Unit = {
    if (i + 1 >= levels.length) levels += ArrayBuffer.empty[Double]
    val sorted = levels(i).sorted
    val up = levels(i + 1)
    var j = 1
    while (j < sorted.length) { up += sorted(j); j += 2 }
    levels(i).clear()
    // odd length: one item has no pair — it stays at this level so no
    // weight is ever lost (totalWeight is an invariant of compaction)
    if (sorted.length % 2 == 1) levels(i) += sorted(0)
    if (up.length > cap) compact(i + 1)
  }

  def merge(other: QuantileSketch): QuantileSketch = {
    while (levels.length < other.levels.length) levels += ArrayBuffer.empty[Double]
    var i = 0
    while (i < other.levels.length) {
      levels(i) ++= other.levels(i)
      i += 1
    }
    i = 0
    while (i < levels.length) { // cascade after append, lowest level first
      if (levels(i).length > cap) compact(i)
      i += 1
    }
    this
  }

  def totalWeight: Long = {
    var w = 0L; var i = 0
    while (i < levels.length) { w += levels(i).length.toLong << i; i += 1 }
    w
  }

  /** Value at weighted rank `floor(p · (W-1))` — with all weights 1
    * (exact mode) precisely the `floor(p·(n-1))` order statistic. */
  def quantiles(ps: Seq[Double]): Array[Double] = {
    val n = levels.map(_.length).sum
    val flat = new Array[(Double, Long)](n)
    var k = 0; var i = 0
    while (i < levels.length) {
      val w = 1L << i
      levels(i).foreach { v => flat(k) = (v, w); k += 1 }
      i += 1
    }
    val sorted = flat.sortBy(_._1)
    val total = totalWeight
    ps.toArray.map { p =>
      val target = math.floor(p * (total - 1)).toLong
      var cum = 0L; var j = 0; var res = Double.NaN
      while (j < sorted.length && res.isNaN) {
        cum += sorted(j)._2
        if (cum > target) res = sorted(j)._1
        j += 1
      }
      res
    }
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(cap)
    out.writeInt(levels.length)
    levels.foreach { l =>
      out.writeInt(l.length)
      l.foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }
}

object QuantileSketch {
  def deserialize(bytes: Array[Byte]): QuantileSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new QuantileSketch(in.readInt())
    val nLevels = in.readInt()
    s.levels = ArrayBuffer.fill(nLevels)(ArrayBuffer.empty[Double])
    var i = 0
    while (i < nLevels) {
      val sz = in.readInt()
      var j = 0
      while (j < sz) { s.levels(i) += in.readDouble(); j += 1 }
      i += 1
    }
    s
  }
}

/** `quantile_sketch(x, ps, cap)` — one pass, partial-aggregated,
  * returns the `ps` quantiles as `ARRAY<DOUBLE>`. NULLs are skipped.
  * See [[QuantileSketch]] for the exactness/error contract. */
case class QuantileSketchAgg(child: Expression, ps: Seq[Double], cap: Int,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSketch] {
  require(cap >= 8, s"capacity must be >= 8, got $cap")
  require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
    s"quantile probabilities must be in [0,1], got $ps")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a DOUBLE argument, got ${other.simpleString} (cast first)")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): QuantileSketch = new QuantileSketch(cap)

  override def update(buffer: QuantileSketch, input: InternalRow): QuantileSketch = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: QuantileSketch, other: QuantileSketch): QuantileSketch =
    buffer.merge(other)

  override def eval(buffer: QuantileSketch): Any =
    new GenericArrayData(buffer.quantiles(ps))

  override def serialize(buffer: QuantileSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): QuantileSketch =
    QuantileSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "quantile_sketch"
}

/** Column-API entry point. */
object SketchOps {
  def quantileSketch(value: Column, ps: Seq[Double], cap: Int = 1 << 16): Column =
    GraftBridge.column(
      QuantileSketchAgg(GraftBridge.expression(value), ps, cap).toAggregateExpression())
}
