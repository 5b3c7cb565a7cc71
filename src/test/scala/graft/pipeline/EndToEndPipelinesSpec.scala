package graft.pipeline

import graft.SparkSpec
import graft.schema.{SchemaRegistry, TableConfig}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.sql.DriverManager
import java.time.LocalDate

/** E2 (file → partition overwrite → guarded rollup) and E3 (mart →
  * reverse-ETL merge publish) driven end to end. */
class EndToEndPipelinesSpec extends SparkSpec {
  import spark.implicits._

  test("E2: land T-1 file, parse, overwrite partition, rollup; rerun is idempotent") {
    val t = Files.createTempDirectory("e2").toString
    val remote = s"$t/remote"; Files.createDirectories(Paths.get(remote))
    Files.writeString(Paths.get(remote, "del_20240114.csv"), Seq(
      "lading,day,qty",
      "L1,2024-01-14,5",
      "L2,2024-01-14,7",
      ",2024-01-14,9"          // missing key → dropped
    ).mkString("\n"))
    val cfg = TableConfig("pns.delivery",
      SchemaRegistry.structOf("lading" -> "string", "day" -> "string", "qty" -> "Int64"),
      keys = Seq("lading"), cursorField = Some("day"))
    def run() = FilePipeline.runDaily(spark, cfg, "day", remote, s"$t/landing",
      s"$t/table", s"$t/mart", s"$t/meta", LocalDate.of(2024, 1, 15),
      requiredKeys = Seq("lading"),
      rollupAggs = Seq(count(lit(1)).as("n"), sum("qty").as("total_qty")))

    val r1 = run()
    assert(r1.landed == Seq("del_20240114.csv") && r1.loaded == 2 && r1.rolledUp)
    val table = new PartitionedStore(spark, s"$t/table", "day").read.get
    assert(canon(table.select("lading", "qty")) == Seq(Seq("L1", "5"), Seq("L2", "7")))
    val mart = new TableStore(spark, s"$t/mart").read.get
    assert(canon(mart) == Seq(Seq("2024-01-14", "2", "12")))

    // rerun the same day (reference backfills do this): converged state
    val r2 = run()
    assert(r2.loaded == 2 && !r2.rolledUp) // freshness guard: nothing newer
    assert(new PartitionedStore(spark, s"$t/table", "day").read.get.count() == 2)
  }

  test("E3: mart merges into the downstream JDBC table across runs") {
    val t = Files.createTempDirectory("e3").toString
    val url = s"jdbc:derby:$t/llb;create=true"
    DriverManager.getConnection(url).close() // create db
    val cfg = TableConfig("llb.revenue", null, Seq("grp"), nullSafeKeys = true)
    def facts(rows: (String, Double)*) = rows.toSeq.toDF("grp", "amt")
    def publish(df: org.apache.spark.sql.DataFrame) =
      ReverseEtl.publishMart(spark, df, dims = Nil, flags = lit(true),
        groupKeys = Seq("grp"), aggs = Seq(sum(col("amt").cast("decimal(18,2)")).cast("double").as("revenue")),
        cfg = cfg, url = url, table = "revenue_by_grp",
        metaPath = s"$t/meta", runDay = "2024-01-15")

    val r1 = publish(facts(("a", 1.0), ("a", 2.0), ("b", 5.0)))
    assert(r1.martRows == 2 && r1.published == 2)
    // second run: 'a' updated, 'c' new, 'b' absent from batch but kept downstream
    val r2 = publish(facts(("a", 10.0), ("c", 7.0)))
    assert(r2.published == 3)
    val back = spark.read.jdbc(url, "revenue_by_grp", new java.util.Properties)
    val got = back.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("a" -> 10.0, "b" -> 5.0, "c" -> 7.0))
  }

  test("E3 aborts on downstream schema drift; history survives") {
    val t = Files.createTempDirectory("e3drift").toString
    val url = s"jdbc:derby:$t/llb;create=true"
    val c = DriverManager.getConnection(url); val st = c.createStatement()
    st.execute("CREATE TABLE rev (grp VARCHAR(10), revenue DOUBLE)")
    st.execute("INSERT INTO rev VALUES ('history', 99.0)")
    st.execute("CREATE TABLE drifted (wrong_col VARCHAR(10))")
    st.close(); c.close()
    intercept[Exception] {
      ReverseEtl.publishMart(spark, Seq(("a", 1.0)).toDF("grp", "amt"), Nil, lit(true),
        Seq("grp"), Seq(sum("amt").as("revenue")),
        TableConfig("x", null, Seq("grp")), url, "drifted", s"$t/meta", "d")
    }
    // neither table was destroyed by the failed run
    assert(spark.read.jdbc(url, "rev", new java.util.Properties).count() == 1)
  }

  test("E3 refuses to publish on failed connectivity probe") {
    val e = intercept[IllegalArgumentException] {
      ReverseEtl.publishMart(spark, Seq(("a", 1.0)).toDF("grp", "amt"), Nil, lit(true),
        Seq("grp"), Seq(sum("amt").as("revenue")),
        TableConfig("x", null, Seq("grp")), "jdbc:derby:/nope/db", "t",
        Files.createTempDirectory("e3b").toString + "/meta", "2024-01-01")
    }
    assert(e.getMessage.contains("connectivity probe"))
  }
}
