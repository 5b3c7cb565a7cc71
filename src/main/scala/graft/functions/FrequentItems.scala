package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary (Misra & Gries 1982; merge rule
  * from Agarwal et al., PODS'12).
  *
  * Why not `GROUP BY token ORDER BY count LIMIT k`: on a 100 TB corpus
  * that is a full-vocabulary shuffle to answer a top-20 question. The
  * MG summary holds at most `cap` counters per partial, merges by
  * count-sum + subtract-the-(cap+1)-th, and ships O(cap) per partition.
  *
  * Exactness contract (same shape as [[QuantileSketch]]): while the
  * DISTINCT key count stays ≤ `cap`, no decrement ever fires, counts
  * are exact, and the result is independent of partitioning and merge
  * order — the correctness gate runs there. Beyond `cap`, every
  * reported count undercounts by at most n/cap (the classic MG bound)
  * and heavy hitters above that threshold are guaranteed present.
  */
final class FreqSketch(val cap: Int) extends Serializable {
  private[functions] val counts = mutable.HashMap.empty[String, Long]

  def insert(v: String): Unit = {
    counts.get(v) match {
      case Some(c) => counts.update(v, c + 1)
      case None =>
        if (counts.size < cap) counts.update(v, 1L)
        else { // MG decrement step: all counters down 1, drop zeros
          val dead = mutable.ArrayBuffer.empty[String]
          counts.mapValuesInPlace { (_, c) => c - 1 }
          counts.foreach { case (k, c) => if (c <= 0) dead += k }
          dead.foreach(counts.remove)
        }
    }
  }

  def merge(other: FreqSketch): FreqSketch = {
    other.counts.foreach { case (k, c) =>
      counts.update(k, counts.getOrElse(k, 0L) + c)
    }
    if (counts.size > cap) {
      // subtract the (cap+1)-th largest count, drop non-positives —
      // deterministic in the merged multiset (a VALUE, not a choice)
      val pivot = counts.values.toArray.sorted(Ordering[Long].reverse).apply(cap)
      val dead = mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace { (_, c) => c - pivot }
      counts.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(counts.remove)
    }
    this
  }

  /** Top `k` surviving counters by (count desc, key asc). */
  def topK(k: Int): Seq[(String, Long)] =
    counts.toSeq.sortBy { case (key, c) => (-c, key) }.take(k)

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(cap)
    out.writeInt(counts.size)
    counts.foreach { case (k, c) => out.writeUTF(k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }
}

object FreqSketch {
  def deserialize(bytes: Array[Byte]): FreqSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new FreqSketch(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { s.counts.update(in.readUTF(), in.readLong()); i += 1 }
    s
  }
}

/** `freq_topk(token, k, cap)` — returns the top-k (item, count) structs.
  * NULLs are skipped. See [[FreqSketch]] for the exactness contract. */
case class FreqTopKAgg(child: Expression, k: Int, cap: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FreqSketch] {
  require(k >= 1 && cap >= k, s"need cap >= k >= 1, got k=$k cap=$cap")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("est_count", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): FreqSketch = new FreqSketch(cap)

  override def update(buffer: FreqSketch, input: InternalRow): FreqSketch = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: FreqSketch, other: FreqSketch): FreqSketch =
    buffer.merge(other)

  override def eval(buffer: FreqSketch): Any =
    new GenericArrayData(buffer.topK(k).map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    })

  override def serialize(buffer: FreqSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): FreqSketch =
    FreqSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "freq_topk"
}

object FreqOps {
  def freqTopK(value: Column, k: Int, cap: Int = 1 << 16): Column =
    GraftBridge.column(
      FreqTopKAgg(GraftBridge.expression(value), k, cap).toAggregateExpression())
}
