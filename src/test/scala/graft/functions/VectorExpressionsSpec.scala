package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native vector expressions: interpreted eval vs codegen vs the
  * composable zip_with form, SQL registration, null semantics. */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(1.0f, 0.0f), Array(0.0f, 1.0f))
  ).toDF("id", "a", "b")

  test("vectorDot matches hand computation and the zip_with composition") {
    val out = df.filter(col("id") === 1)
      .select(VectorOps.vectorDot(col("a"), col("b")).as("d"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, x) => acc + x).as("ref"))
      .head()
    assert(out.getDouble(0) == 32.0 && out.getDouble(1) == 32.0)
  }

  test("vectorCosine: orthogonal = 0, self = 1, length mismatch = NULL") {
    val r = df.select(col("id"),
      VectorOps.vectorCosine(col("a"), col("b")).as("c"),
      VectorOps.vectorCosine(col("a"), col("a")).as("self")).collect()
      .map(x => x.getLong(0) -> ((x.getDouble(1), x.getDouble(2)))).toMap
    assert(math.abs(r(2L)._1 - 0.0) < 1e-12)
    assert(math.abs(r(1L)._2 - 1.0) < 1e-12)
    val mismatch = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
      .select(VectorOps.vectorCosine(col("a"), col("b")).as("c")).head()
    assert(mismatch.isNullAt(0))
  }

  test("null elements propagate NULL (zip_with parity); double arrays accepted") {
    val withNull = Seq((Array[java.lang.Float](1.0f, null, 2.0f), Array[java.lang.Float](1.0f, 1.0f, 1.0f)))
      .toDF("a", "b")
    assert(withNull.select(VectorOps.vectorDot(col("a"), col("b")).as("d")).head().isNullAt(0))
    val doubles = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    assert(doubles.select(VectorOps.vectorDot(col("a"), col("b")).as("d")).head().getDouble(0) == 11.0)
    // mixed float/double sides also work
    val mixed = Seq((Array(1.0f, 2.0f), Array(3.0, 4.0))).toDF("a", "b")
    assert(mixed.select(VectorOps.vectorDot(col("a"), col("b")).as("d")).head().getDouble(0) == 11.0)
  }

  test("codegen and interpreted paths agree") {
    val q = Seq((Array.tabulate(64)(i => i.toFloat), Array.tabulate(64)(i => (63 - i).toFloat)))
      .toDF("a", "b").select(VectorOps.vectorDot(col("a"), col("b")).as("d"))
    val codegen = q.head().getDouble(0)
    val interpreted = {
      val prev = spark.conf.get("spark.sql.codegen.wholeStage")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      try q.head().getDouble(0)
      finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    }
    assert(codegen == interpreted)
  }

  test("SQL registration: vector_dot/vector_cosine callable from spark.sql") {
    df.createOrReplaceTempView("vecs")
    val out = spark.sql(
      "SELECT id, vector_dot(a, b) AS d, round(vector_cosine(a, a), 6) AS self FROM vecs ORDER BY id")
      .collect()
    assert(out(0).getDouble(1) == 32.0 && out(0).getDouble(2) == 1.0)
  }

  test("expression participates in whole-stage codegen (plan check)") {
    // a local relation folds into LocalTableScan (evaluated at plan time);
    // a file-backed scan shows the real codegen pipeline
    val embs = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val plan = embs.select(VectorOps.vectorDot(col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a WholeStageCodegen span; the project with
    // vector_dot must sit inside one (a codegen fallback would drop it)
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("vector_dot")), plan)
  }
}
