package graft.functions

import graft.SparkSpec
import graft.llm.{IvfMorIndexStore, Pq, Similarity}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The PQ/IVF hot path must COMPILE under whole-stage codegen — no
  * silent interpreted fallback. r14's suite logged 4×
  * `ERROR CodeGenerator … generate_doConsume_0(ArrayData …)` from the
  * literal-tree encode/cell forms blowing janino's 64 KB method limit;
  * the index-build stage then ran interpreted, correct but exactly the
  * plan you don't want at scale. With `spark.sql.codegen.fallback=false`
  * a compile failure THROWS instead — so these tests are machine
  * assertions that the fallback is gone, at sizes (k=64 cells × dim 64,
  * m=8 × ksub=64 codebooks, both in ONE projection) well past where the
  * old forms died. */
class PqIvfCodegenSpec extends SparkSpec {
  import spark.implicits._

  private def noFallback[T](body: => T): T = {
    val keys = Seq("spark.sql.codegen.fallback", "spark.sql.codegen.factoryMode")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try body
    finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  private val r = new scala.util.Random(7)
  private val dim = 64
  private val pts = (0L until 300L).map { i =>
    i -> Array.fill(dim)((r.nextGaussian() * 0.3 + (i % 4).toDouble).toFloat)
  }

  test("MOR-IVF/PQ build + ADC probe compile with codegen fallback DISABLED") {
    noFallback {
      val full = pts.toDF("vec_id", "embedding")
      val centroids = Array.fill(64)(Array.fill(dim)(r.nextGaussian().toFloat))
      val books = Pq.trainCodebooks(full, "embedding", "vec_id", m = 8, ksub = 64)
      val root = Files.createTempDirectory("pq-cg").toString + "/idx"
      val ivf = new IvfMorIndexStore(spark, root, "embedding", "vec_id",
        centroids, Some(books))
      // the killer shape: cellOf + pq encode in ONE projection
      pts.grouped(150).foreach(g => ivf.upsert(g.toDF("vec_id", "embedding")))
      val q = pts(5L.toInt)._2
      assert(ivf.topKAdc(q, 5, nprobe = 8).count() == 5)
      assert(ivf.topKAdc(q, 5, nprobe = 8, rerank = 20).count() == 5)
      // the from-vectors ADC form too (adcTopK over raw embeddings)
      assert(Pq.adcTopK(full, "embedding", "vec_id", q, 5, books).count() == 5)
    }
  }

  test("native encode/cell/adc edge semantics match the composed forms' contract") {
    noFallback {
      val books = Pq.Codebooks(Array.tabulate(2, 3)((j, c) =>
        Array.fill(2)((j + c + 1).toFloat)))
      val cents = Array(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f))
      val rows = Seq(
        (1L, Some(Seq(Some(1f), Some(2f), Some(3f), Some(4f)))), // clean
        (2L, None), // NULL vector
        (3L, Some(Seq(Some(1f), Some(2f), Some(3f)))), // short: subspace 2 unsliceable
        (4L, Some(Seq(Some(1f), None, Some(3f), Some(4f)))), // NULL element in subspace 1
        (5L, Some(Seq(Some(0f), Some(0f), Some(0f), Some(0f)))) // zero norm
      ).toDF("id", "emb")
      val out = rows.select(col("id"),
          Pq.encode(col("emb"), books).as("codes"),
          Similarity.cellOf(col("emb"), cents).as("cell"))
        .orderBy("id").collect()
      def codes(i: Int): Seq[Any] = out(i).getSeq[Any](1)
      // clean row: real codes, real cell
      assert(codes(0).forall(_ != null) && out(0).getInt(2) >= 0)
      // NULL vector → array of NULL codes (never a NULL array), cell −1
      assert(out(1).getSeq[Any](1) == Seq(null, null) && out(1).getInt(2) == -1)
      // short vector → subspace 0 codes, subspace 1 NULL; cell −1 (len mismatch)
      assert(codes(2).head != null && codes(2)(1) == null && out(2).getInt(2) == -1)
      // NULL element (index 1 ⇒ subspace 0) only poisons its subspace; cell −1
      assert(codes(3).head == null && codes(3)(1) != null && out(3).getInt(2) == -1)
      // zero vector codes fine (L2 argmin defined), cell −1 (cosine undefined)
      assert(codes(4).forall(_ != null) && out(4).getInt(2) == -1)
      // ADC: NULL code word and NULL code both give NULL score
      val q = Array(1f, 1f, 1f, 1f)
      val adc = rows.select(col("id"),
          Pq.adcMicroScore(col("emb"), books, q).as("s"))
        .orderBy("id").collect()
      assert(!adc(0).isNullAt(1) && adc(1).isNullAt(1) && adc(2).isNullAt(1) &&
        adc(3).isNullAt(1) && !adc(4).isNullAt(1))
    }
  }

  test("interpreted eval matches codegen (Expression.eval path)") {
    val books = Pq.Codebooks(Array.tabulate(2, 4)((j, c) =>
      Array.tabulate(2)(i => (j * 4 + c + i).toFloat / 3f)))
    val cents = Array.tabulate(4)(c => Array.tabulate(4)(i => (c + i + 1).toFloat))
    val vecs = (0 until 50).map(i => Array.fill(4)(r.nextGaussian().toFloat))
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    vecs.foreach { v =>
      val le = Literal.create(v, ArrayType(FloatType))
      val enc = PqEncodeExpr(le, books.cb).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray().toSeq
      val cell = IvfCellExpr(le, cents).eval(null)
      // recompute on the driver with plain double arithmetic
      val wantCodes = (0 until 2).map { j =>
        val sub = v.slice(j * 2, j * 2 + 2).map(_.toDouble)
        (0 until 4).minBy { c =>
          val cb = books.cb(j)(c).map(_.toDouble)
          val vv = sub.map(x => x * x).sum
          val vc = sub.zip(cb).map { case (a, b) => a * b }.sum
          val cc = cb.map(x => x * x).sum
          vv - 2.0 * vc + cc
        }
      }
      def cos(a: Array[Float], b: Array[Float]): Double = {
        val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
        val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
        val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
        dot / (na * nb)
      }
      val wantCell = (0 until 4).maxBy(c => cos(v, cents(c)))
      assert(enc == wantCodes, s"encode mismatch for ${v.toSeq}")
      assert(cell == wantCell, s"cell mismatch for ${v.toSeq}")
    }
  }
}
