package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import java.sql.DriverManager

/** S1–S4/S13/V4 against an embedded Derby database — a real JDBC
  * round-trip: window pushdown, count probe, reverse-ETL publish. */
class JdbcSpec extends SparkSpec {

  private lazy val url: String = {
    val dir = Files.createTempDirectory("derby").toString
    val u = s"jdbc:derby:$dir/db;create=true"
    val conn = DriverManager.getConnection(u)
    val st = conn.createStatement()
    st.execute("CREATE TABLE src (id BIGINT, cur TIMESTAMP, v VARCHAR(20))")
    st.execute("INSERT INTO src VALUES " +
      "(1, TIMESTAMP('2024-01-09 23:59:59'), 'before')," +
      "(2, TIMESTAMP('2024-01-10 00:00:00'), 'at-start')," +
      "(3, TIMESTAMP('2024-01-15 12:00:00'), 'inside')," +
      "(4, TIMESTAMP('2024-01-20 00:00:00'), 'at-end')," +
      "(5, TIMESTAMP('2024-01-21 00:00:00'), 'after')")
    st.close(); conn.close()
    u
  }

  test("S1 windowRead: half-open window, start row in, end row out") {
    val out = Jdbc.windowRead(spark, url, "src", "CUR",
      "2024-01-10 00:00:00", "2024-01-20 00:00:00")
    assert(out.select("ID").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
  }

  test("S1 window predicate pushes down to the JDBC source") {
    val out = Jdbc.windowRead(spark, url, "src", "CUR",
      "2024-01-10 00:00:00", "2024-01-20 00:00:00")
    val scan = out.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("CUR"))
  }

  test("S1 partitioned windowRead fans out and returns the same rows") {
    val out = Jdbc.windowRead(spark, url, "src", "CUR",
      "2024-01-10 00:00:00", "2024-01-20 00:00:00", numPartitions = 3)
    assert(out.rdd.getNumPartitions == 3)
    assert(out.select("ID").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
  }

  test("S4 countProbe matches windowRead count") {
    assert(Jdbc.countProbe(spark, url, "src", "CUR",
      "2024-01-10 00:00:00", "2024-01-20 00:00:00") == 2L)
  }

  test("P1 column projection at the source") {
    val out = Jdbc.table(spark, url, "src", columns = Seq("ID", "V"))
    assert(out.columns.toSeq == Seq("ID", "V"))
  }

  test("S13 publish: reverse-ETL write then read back") {
    import spark.implicits._
    val mart = Seq((1L, "a", 10.5), (2L, "b", 20.0)).toDF("id", "k", "amt")
    Jdbc.publish(mart, url, "mart_out", mode = "overwrite")
    val back = spark.read.jdbc(url, "mart_out", new java.util.Properties)
    assert(back.count() == 2)
    assert(back.columns.map(_.toLowerCase).sorted.toSeq == Seq("amt", "id", "k"))
  }

  test("V4 probe: live url true, bogus url false") {
    assert(Jdbc.probe(url))
    assert(!Jdbc.probe("jdbc:derby:/nonexistent/nope"))
  }
}
