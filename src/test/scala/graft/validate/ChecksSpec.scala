package graft.validate

import graft.SparkSpec
import graft.schema.SchemaRegistry

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  test("V1 schemaMatches: missing column and wrong type are caught") {
    val df = Seq((1L, "x")).toDF("a", "b")
    assert(Checks.schemaMatches(df, SchemaRegistry.structOf("a" -> "Int64", "b" -> "string")).passed)
    val miss = Checks.schemaMatches(df, SchemaRegistry.structOf("a" -> "Int64", "zz" -> "string"))
    assert(!miss.passed && miss.detail.contains("zz"))
    val wrong = Checks.schemaMatches(df, SchemaRegistry.structOf("a" -> "string", "b" -> "string"))
    assert(!wrong.passed && wrong.detail.contains("expected string"))
  }

  test("V2 notNull / unique / nonEmpty") {
    val df = Seq((Some(1L), "a"), (None, "a"), (Some(3L), "b")).toDF("k", "v")
    assert(!Checks.notNull(df, Seq("k")).passed)
    assert(Checks.notNull(df, Seq("v")).passed)
    assert(!Checks.unique(df, Seq("v")).passed)
    assert(Checks.unique(df, Seq("k")).passed) // NULL groups: one null row only
    assert(Checks.nonEmpty(df).passed)
    assert(!Checks.nonEmpty(df.limit(0)).passed)
    assert(canon(Checks.duplicateKeys(df, Seq("v"))) == Seq(Seq("a", "2")))
  }

  test("fkOrphans: dangling references surface, NULL keys never do") {
    import spark.implicits._
    val child = Seq((Some(1L), "a"), (Some(2L), "b"), (None, "c"), (Some(2L), "d"))
      .toDF("fk", "payload")
    val parent = Seq(1L).toDF("pk")
    val orphans = Checks.fkOrphans(child, Seq("fk"), parent, Seq("pk"))
    // both fk=2 rows are orphans; the NULL-key row is not
    assert(canon(orphans.select("fk", "payload")) ==
      Seq(Seq("2", "b"), Seq("2", "d")))
    assert(!Checks.referentialIntegrity(child, Seq("fk"), parent, Seq("pk")).passed)
    val ok = Seq((Some(1L), "a"), (None, "b")).toDF("fk", "payload")
    assert(Checks.referentialIntegrity(ok, Seq("fk"), parent, Seq("pk")).passed)
  }

  test("fkOrphans: composite keys align positionally across differing names") {
    import spark.implicits._
    val child = Seq((1L, "x", 10), (1L, "y", 20)).toDF("a", "b", "v")
    val parent = Seq((1L, "x")).toDF("pa", "pb")
    val orphans = Checks.fkOrphans(child, Seq("a", "b"), parent, Seq("pa", "pb"))
    assert(canon(orphans.select("a", "b")) == Seq(Seq("1", "y")))
  }

  test("acceptedValues: out-of-domain rows surface; NULLs are not violations") {
    import spark.implicits._
    val df = Seq(Some("view"), Some("click"), Some("weird"), None).toDF("t")
    val v = Checks.acceptedValuesViolations(df, "t", Seq("view", "click"))
    assert(canon(v) == Seq(Seq("weird")))
    assert(!Checks.acceptedValues(df, "t", Seq("view", "click")).passed)
    assert(Checks.acceptedValues(df, "t", Seq("view", "click", "weird")).passed)
  }

  test("A3 rowCountReconciles + enforce throws on failure") {
    assert(Checks.rowCountReconciles(5, 5).passed)
    assert(!Checks.rowCountReconciles(5, 4).passed)
    val e = intercept[IllegalStateException] {
      Checks.enforce(Seq(CheckResult("x", passed = false, "boom")))
    }
    assert(e.getMessage.contains("boom"))
  }
}
