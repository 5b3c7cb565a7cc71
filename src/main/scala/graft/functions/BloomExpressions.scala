package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Portable Bloom filter: distributed bitmap build (a
  * TypedImperativeAggregate whose buffer IS the bitmap, merged by
  * bitwise OR) and a codegen'd membership probe.
  *
  * The use case is the 100 TB incremental-dedup pre-filter: instead of
  * equi-joining every incoming batch against a corpus-sized fingerprint
  * table, the corpus compresses once into an m-bit filter (32 KiB at
  * m=2^18) that ships to every probe site as a plain binary value; the
  * expensive verification join then runs only on rows the filter flags.
  * Spark's own runtime-filter machinery (`BloomFilterAggregate`) is
  * internal and engine-specific; this one's hash family is
  * ENGINE-NEUTRAL so a second engine can replay membership — including
  * the false positives — bit for bit.
  *
  * Hash family (k positions over m bits, m a power of two):
  * {{{ pos_i(v) = parse_hex_60bit(md5(i || "||" || v)) mod m,  i = 0..k-1 }}}
  * i.e. the top 15 hex digits of the md5 of the index-salted value —
  * exactly `CAST('0x'||substr(md5(CAST(i AS VARCHAR)||'||'||v),1,15) AS
  * BIGINT) % m` in an ANSI engine, the same salted-md5 derivation as
  * [[graft.llm.Sampling.md5Bucket]]. Independence comes from the salt;
  * determinism from md5; portability from hex-prefix parsing.
  */
object BloomUtil {

  /** 60-bit value of the first 15 hex digits of md5(i || "||" || v) —
    * the first 8 digest bytes as a big-endian long, low nibble dropped. */
  def position(value: UTF8String, i: Int, mBits: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(String.valueOf(i).getBytes("UTF-8"))
    md.update("||".getBytes("UTF-8"))
    md.update(value.getBytes)
    val d = md.digest()
    var top = 0L
    var b = 0
    while (b < 8) { top = (top << 8) | (d(b) & 0xffL); b += 1 }
    ((top >>> 4) % mBits).toInt
  }

  def setBit(bits: Array[Byte], pos: Int): Unit =
    bits(pos >>> 3) = (bits(pos >>> 3) | (1 << (pos & 7))).toByte

  def getBit(bits: Array[Byte], pos: Int): Boolean =
    (bits(pos >>> 3) & (1 << (pos & 7))) != 0

  def add(bits: Array[Byte], value: UTF8String, k: Int, mBits: Int): Unit = {
    var i = 0
    while (i < k) { setBit(bits, position(value, i, mBits)); i += 1 }
  }

  /** Probe helper — also the codegen entry point. */
  def mightContain(bits: Array[Byte], value: UTF8String, k: Int, mBits: Int): Boolean = {
    var i = 0
    while (i < k) {
      if (!getBit(bits, position(value, i, mBits))) return false
      i += 1
    }
    true
  }
}

/** Aggregate building the m-bit filter over a STRING column. The buffer
  * is the bitmap itself (m/8 bytes), updates set k bits per row, merges
  * bitwise-OR — associative and commutative, so partial aggregation and
  * any merge order produce the identical filter. NULL values are
  * skipped (a NULL fingerprint is "nothing to remember", matching the
  * SQL replay where NULL never equals a position). */
case class BloomBuild(child: Expression, mBits: Int, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {
  require(mBits > 0 && (mBits & (mBits - 1)) == 0, s"mBits must be a power of two, got $mBits")
  require(mBits % 8 == 0, s"mBits must be byte-aligned, got $mBits")
  require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](mBits / 8)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) BloomUtil.add(buffer, v.asInstanceOf[UTF8String], k, mBits)
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buffer.length) { buffer(i) = (buffer(i) | other(i)).toByte; i += 1 }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = buffer
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storageFormat: Array[Byte]): Array[Byte] = storageFormat

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "bloom_build"
}

/** `bloom_might_contain(filter, value)` — true iff all k salted-md5 bit
  * positions of `value` are set in `filter`. NULL value or NULL filter
  * → NULL (standard binary-expression null propagation); false
  * positives are a deterministic function of the hash family, so a
  * second engine replays them exactly. Codegen emits one static call —
  * the md5 work dominates, so inlining the loop would buy nothing. */
case class BloomMightContain(left: Expression, right: Expression, mBits: Int, k: Int)
    extends BinaryExpression {
  require(mBits > 0 && (mBits & (mBits - 1)) == 0 && mBits % 8 == 0,
    s"mBits must be a byte-aligned power of two, got $mBits")
  require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY, STRING), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullSafeEval(filter: Any, value: Any): Any =
    BloomUtil.mightContain(filter.asInstanceOf[Array[Byte]],
      value.asInstanceOf[UTF8String], k, mBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, v) =>
      s"${ev.value} = graft.functions.BloomUtil.mightContain($f, $v, $k, $mBits);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "bloom_might_contain"
}

/** [[BloomMightContain]] with the bit width carried BY the filter
  * (mBits = 8 · bytes) rather than baked into the plan — the probe form
  * for STATS TABLES, where the filter column is data whose size is a
  * write-time decision ([[graft.pipeline.Layout.buildZoneMaps]] lets
  * each table pick its own `bloomBits`). Same hash family, same null
  * propagation, same codegen shape. */
case class BloomSelfSizedProbe(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY, STRING), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullSafeEval(filter: Any, value: Any): Any = {
    val bits = filter.asInstanceOf[Array[Byte]]
    BloomUtil.mightContain(bits, value.asInstanceOf[UTF8String], k, bits.length * 8)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (f, v) =>
      s"${ev.value} = graft.functions.BloomUtil.mightContain($f, $v, $k, $f.length * 8);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "bloom_probe_self_sized"
}

/** Column-API entry points. */
object BloomOps {
  def bloomBuild(value: Column, mBits: Int = 1 << 18, k: Int = 4): Column =
    GraftBridge.column(
      BloomBuild(GraftBridge.expression(value), mBits, k).toAggregateExpression())

  def bloomMightContain(filter: Column, value: Column,
                        mBits: Int = 1 << 18, k: Int = 4): Column =
    GraftBridge.column(BloomMightContain(
      GraftBridge.expression(filter), GraftBridge.expression(value), mBits, k))

  /** Probe a filter column whose bit width is its own byte length × 8 —
    * for stats-table filters of write-time-chosen size. */
  def bloomProbeSelfSized(filter: Column, value: Column, k: Int = 4): Column =
    GraftBridge.column(BloomSelfSizedProbe(
      GraftBridge.expression(filter), GraftBridge.expression(value), k))
}
