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
  *
  * The decrement is LAZY (the standard offset trick): "all live
  * counters down 1" is one `base += 1`; a counter's reported count is
  * `stored − base`, a counter dies when `stored` falls to `base`
  * (tracked through a stored-value histogram, so detecting deaths is
  * O(deaths·log cap), not an O(cap) sweep per uncovered insert), and
  * dead entries are physically evicted in bulk only when the backing
  * map doubles past `cap` — ≥ cap evictions per O(cap) sweep, O(1)
  * amortized. Observable behavior (live set + reported counts after
  * every operation) is EXACTLY eager Misra–Gries, differentially
  * tested in FrequentItemsSpec.
  */
final class FreqSketch(val cap: Int) extends Serializable {
  // stored counts; an entry is LIVE iff stored > base. Dead entries may
  // linger physically until the next compaction but are never reported.
  private val stored = mutable.HashMap.empty[String, Long]
  private var base = 0L
  private var live = 0
  // histogram of stored values over LIVE entries: stored value -> #keys
  private val hist = new java.util.TreeMap[Long, Int]()

  private def histInc(v: Long): Unit =
    hist.merge(v, 1, (a, b) => a + b)
  private def histDec(v: Long): Unit = {
    val n = hist.get(v) - 1
    if (n == 0) hist.remove(v) else hist.put(v, n)
  }

  def insert(v: String): Unit = {
    val s = stored.getOrElse(v, Long.MinValue)
    if (s > base) { // live covered key: count up
      histDec(s); histInc(s + 1)
      stored.update(v, s + 1)
    } else if (live < cap) { // new (or dead ⇒ forgotten) key with room
      stored.update(v, base + 1) // a dead entry's hist slot was already drained
      histInc(base + 1)
      live += 1
      if (stored.size > 2 * cap) compact()
    } else { // MG decrement: every live counter −1, zeros die
      base += 1
      var f = hist.firstEntry()
      while (f != null && f.getKey <= base) {
        live -= f.getValue; hist.remove(f.getKey); f = hist.firstEntry()
      }
    }
  }

  /** Live (key, reported count) pairs — the logical summary. */
  private[functions] def liveCounts: Iterator[(String, Long)] =
    stored.iterator.collect { case (k, s) if s > base => (k, s - base) }

  private def compact(): Unit = {
    val dead = stored.iterator.collect { case (k, s) if s <= base => k }.toArray
    dead.foreach(stored.remove)
  }

  /** Install one wire entry into a fresh (base = 0) sketch. */
  private[functions] def reviveFromWire(k: String, c: Long): Unit = {
    stored.update(k, c); histInc(c); live += 1
  }

  /** Reset state to exactly `entries` (effective counts, base 0). */
  private def reset(entries: Iterator[(String, Long)]): Unit = {
    stored.clear(); hist.clear(); base = 0L; live = 0
    entries.foreach { case (k, c) =>
      stored.update(k, c); histInc(c); live += 1
    }
  }

  def merge(other: FreqSketch): FreqSketch = {
    val sum = mutable.HashMap.empty[String, Long]
    liveCounts.foreach { case (k, c) => sum.update(k, c) }
    other.liveCounts.foreach { case (k, c) =>
      sum.update(k, sum.getOrElse(k, 0L) + c)
    }
    if (sum.size > cap) {
      // subtract the (cap+1)-th largest count, drop non-positives —
      // deterministic in the merged multiset (a VALUE, not a choice)
      val pivot = sum.values.toArray.sorted(Ordering[Long].reverse).apply(cap)
      val dead = sum.iterator.collect { case (k, c) if c <= pivot => k }.toArray
      dead.foreach(sum.remove)
      sum.mapValuesInPlace { (_, c) => c - pivot }
    }
    reset(sum.iterator)
    this
  }

  /** Top `k` surviving counters by (count desc, key asc). */
  def topK(k: Int): Seq[(String, Long)] =
    liveCounts.toSeq.sortBy { case (key, c) => (-c, key) }.take(k)

  /** Length-prefixed raw UTF-8 framing (writeUTF would throw on keys
    * whose encoding exceeds 64 KiB — base64 blobs, boundary-free CJK
    * lines), mirroring QuantileSketch's explicit framing. Only live
    * effective counts ship — the offset is a process-local detail. */
  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(cap)
    out.writeInt(live)
    liveCounts.foreach { case (k, c) =>
      val b = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
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
    while (i < n) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      val key = new String(buf, java.nio.charset.StandardCharsets.UTF_8)
      s.reviveFromWire(key, in.readLong())
      i += 1
    }
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
