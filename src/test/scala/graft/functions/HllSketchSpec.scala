package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  /** Scala-side reference registers from the documented hash contract:
    * md5 hex → bucket = first 16 bits mod m, rho = 49 − bitlength of
    * the next 48 bits. Independent of the sketch's byte-level path. */
  private def refRegisters(values: Seq[String], p: Int): Array[Int] = {
    val m = 1 << p
    val regs = new Array[Int](m)
    values.foreach { v =>
      val hx = java.security.MessageDigest.getInstance("MD5")
        .digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val bucket = Integer.parseInt(hx.substring(0, 4), 16) % m
      val w = java.lang.Long.parseLong(hx.substring(4, 16), 16)
      val rho = if (w == 0) 49 else 49 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > regs(bucket)) regs(bucket) = rho
    }
    regs
  }

  private def refEstimate(regs: Array[Int]): Double = {
    val m = regs.length
    val isum = regs.map(r => 1L << (49 - r)).sum
    val zeros = regs.count(_ == 0)
    val alpha = m match {
      case 16 => 0.673; case 32 => 0.697; case 64 => 0.709
      case _  => 0.7213 / (1 + 1.079 / m)
    }
    val raw = alpha * m * m / (isum.toDouble / HllSketch.Pow49)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }

  test("registers and estimate match the hex-replay reference formula") {
    val values = (1 to 5000).map(i => s"key-$i")
    val s = new HllSketch(8)
    values.foreach(s.insert)
    assert(s.registers.map(_.toInt).toSeq == refRegisters(values, 8).toSeq)
    assert(s.estimate == refEstimate(refRegisters(values, 8)))
  }

  test("estimate error is within the HLL envelope at m=256") {
    val n = 5000
    val s = new HllSketch(8)
    (1 to n).foreach(i => s.insert(s"key-$i"))
    // 1.04/sqrt(256) = 6.5% expected; allow 4 sigma
    assert(math.abs(s.estimate - n) / n < 0.26, s"estimate ${s.estimate} for $n")
  }

  test("insert is idempotent; merge is commutative, associative, idempotent") {
    val a = new HllSketch(6); val b = new HllSketch(6); val c = new HllSketch(6)
    (1 to 300).foreach(i => a.insert(s"a$i"))
    (200 to 500).foreach(i => { b.insert(s"a$i"); b.insert(s"a$i") })
    (400 to 700).foreach(i => c.insert(s"a$i"))
    def est(parts: Seq[HllSketch]): Double = {
      val m = new HllSketch(6)
      parts.foreach(m.merge)
      m.estimate
    }
    val e1 = est(Seq(a, b, c))
    val e2 = est(Seq(c, a, b, b))
    val all = new HllSketch(6)
    (1 to 700).foreach(i => all.insert(s"a$i"))
    assert(e1 == e2)
    assert(e1 == all.estimate)
  }

  test("linear-counting branch engages for small cardinalities") {
    val s = new HllSketch(8)
    (1 to 40).foreach(i => s.insert(s"v$i"))
    val zeros = s.registers.count(_ == 0)
    assert(zeros > 0)
    assert(s.estimate == 256 * math.log(256.0 / zeros))
    // linear counting is near-exact this far below m
    assert(math.abs(s.estimate - 40) < 6)
  }

  test("serialization round-trips registers exactly") {
    val s = new HllSketch(10)
    (1 to 1000).foreach(i => s.insert(s"x$i"))
    val back = HllSketch.deserialize(s.serialize())
    assert(back.p == 10)
    assert(back.registers.toSeq == s.registers.toSeq)
    assert(back.estimate == s.estimate)
  }

  test("aggregate is partitioning-invariant and matches the direct sketch") {
    val values = (1 to 4000).map(i => s"order-${i % 2500}") // dups collapse
    val direct = new HllSketch(8)
    values.distinct.foreach(direct.insert)
    def run(parts: Int): Double =
      values.toDF("k").repartition(parts)
        .agg(HllOps.hllDistinct(col("k"), 8).as("est"))
        .head().getDouble(0)
    assert(run(1) == direct.estimate)
    assert(run(7) == direct.estimate)
    assert(run(32) == direct.estimate)
  }

  test("grouped aggregate: per-group sketches are independent; NULLs skipped") {
    val df = Seq(
      ("g1", Some("a")), ("g1", Some("b")), ("g1", Some("a")), ("g1", None),
      ("g2", Some("z"))).toDF("g", "k")
    val out = df.groupBy("g").agg(HllOps.hllDistinct(col("k"), 8).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val g1 = new HllSketch(8); g1.insert("a"); g1.insert("b")
    val g2 = new HllSketch(8); g2.insert("z")
    assert(out("g1") == g1.estimate)
    assert(out("g2") == g2.estimate)
  }

  test("hll_sketch → hll_union → hll_estimate: incremental fold equals one-shot") {
    val all = (1 to 3000).map(i => s"u${i % 1800}")
    val (part1, part2) = all.splitAt(1100)
    // fold two partial sketches via the union aggregate
    val partials = Seq(part1, part2).zipWithIndex.flatMap { case (p, i) =>
      p.map(v => (i, v))
    }.toDF("part", "v")
      .groupBy("part").agg(HllOps.hllSketch(col("v"), 8).as("sk"))
    val folded = partials.agg(HllOps.hllUnion(col("sk")).as("sk"))
      .select(HllOps.hllEstimate(col("sk"))).head().getDouble(0)
    val oneShot = all.toDF("v")
      .agg(HllOps.hllDistinct(col("v"), 8)).head().getDouble(0)
    assert(folded == oneShot) // max-merge is exact over unions
  }

  test("hll_union skips NULL blobs; an all-NULL group yields NULL") {
    val df = Seq(("g1", Option.empty[Array[Byte]]), ("g2", None))
      .toDF("g", "sk")
    val withReal = Seq(("g1", "x"), ("g1", "y")).toDF("g", "v")
      .groupBy("g").agg(HllOps.hllSketch(col("v"), 8).as("sk"))
      .unionByName(df.filter(col("g") === "g1"))
    val est = withReal.groupBy("g")
      .agg(HllOps.hllEstimate(HllOps.hllUnion(col("sk"))).as("e"))
      .head()
    val two = new HllSketch(8); two.insert("x"); two.insert("y")
    assert(est.getDouble(1) == two.estimate)
    val allNull = df.filter(col("g") === "g2").groupBy("g")
      .agg(HllOps.hllUnion(col("sk")).as("sk")).head()
    assert(allNull.isNullAt(1))
  }

  test("non-string input is an analysis-time type error") {
    val e = intercept[Exception] {
      Seq(1, 2, 3).toDF("k").agg(HllOps.hllDistinct(col("k"), 8)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }
}
