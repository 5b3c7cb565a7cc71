package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class BloomExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val M = 1 << 12 // small filter so collisions are reachable in tests
  private val K = 4

  private def buildFilter(values: Seq[String], m: Int = M): Array[Byte] =
    values.toDF("v").agg(BloomOps.bloomBuild(col("v"), m, K).as("f"))
      .head().getAs[Array[Byte]](0)

  test("no false negatives: every inserted value probes true") {
    val vals = (1 to 500).map(i => s"value-$i")
    val f = buildFilter(vals)
    val probes = vals.toDF("v")
      .select(BloomOps.bloomMightContain(lit(f), col("v"), M, K).as("hit"))
      .collect().map(_.getBoolean(0))
    assert(probes.forall(identity))
  }

  test("probe agrees with the scalar hash-family replay, false positives included") {
    val inserted = (1 to 300).map(i => s"in-$i")
    val f = buildFilter(inserted)
    val candidates = (1 to 2000).map(i => s"out-$i")
    val viaExpr = candidates.toDF("v")
      .select(col("v"), BloomOps.bloomMightContain(lit(f), col("v"), M, K).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // independent replay: same salted-md5 position arithmetic
    val bits = new Array[Byte](M / 8)
    inserted.foreach(v => BloomUtil.add(bits, UTF8String.fromString(v), K, M))
    val viaScalar = candidates.map(v =>
      v -> BloomUtil.mightContain(bits, UTF8String.fromString(v), K, M)).toMap
    assert(viaExpr == viaScalar)
    // with 300*4 bits in 4096 the FP rate is ~0.5%^4-ish but nonzero by
    // construction at this density; the point is agreement, not rate —
    // still, SOME candidate must probe false or the filter is degenerate
    assert(viaExpr.values.exists(h => !h))
  }

  test("partial aggregation and merge order do not change the filter") {
    val vals = (1 to 400).map(i => s"merge-$i")
    val a = buildFilter(vals)
    val b = vals.toDF("v").repartition(13)
      .agg(BloomOps.bloomBuild(col("v"), M, K).as("f"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
  }

  test("NULL values are skipped on build and propagate NULL on probe") {
    val f = Seq(Some("x"), None, Some("y")).toDF("v")
      .agg(BloomOps.bloomBuild(col("v"), M, K).as("f"))
      .head().getAs[Array[Byte]](0)
    val expected = {
      val bits = new Array[Byte](M / 8)
      Seq("x", "y").foreach(v => BloomUtil.add(bits, UTF8String.fromString(v), K, M))
      bits
    }
    assert(java.util.Arrays.equals(f, expected))
    val probed = Seq(Some("x"), None).toDF("v")
      .select(BloomOps.bloomMightContain(lit(f), col("v"), M, K).as("hit"))
      .collect()
    assert(probed(0).getBoolean(0) && probed(1).isNullAt(0))
  }

  test("position arithmetic matches the SQL replay formula") {
    // CAST('0x'||substr(md5(i||'||'||v),1,15) AS BIGINT) % m, computed
    // via the engine's own md5/conv functions vs BloomUtil.position
    val v = "portability-check"
    for (i <- 0 until K) {
      val viaSql = spark.range(1).select(
        pmod(conv(substring(md5(lit(s"$i||$v")), 1, 15), 16, 10).cast("long"), lit(M.toLong)))
        .head().getLong(0)
      assert(viaSql == BloomUtil.position(UTF8String.fromString(v), i, M),
        s"hash index $i diverges from the SQL formula")
    }
  }
}
