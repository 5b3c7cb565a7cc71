package graft.validate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** One validation outcome — the engine's version of a Soda check result /
  * dbt test result (pass/fail + a human detail). */
final case class CheckResult(name: String, passed: Boolean, detail: String)

/** Validation operators (SURVEY.md §2.10 V1/V2, §2.4 A3).
  *
  * V1 reproduces the Soda contract executed per batch in
  * casreport_to_ods.py:362-394 ("when required column missing", "when wrong
  * column type" — soda/check/casreport/v_prd_srv.yml:1-12). V2 reproduces
  * the dbt source/model tests (not_null / unique / non-empty —
  * dbt/models/sources.yml:18-24, schema.yml:24-52). All checks are single
  * aggregations — one pass over the data, no collect of row-level detail.
  */
object Checks {

  /** V1 — schema assertion against the registry-declared StructType:
    * every required column present with the declared type. Extra columns
    * are allowed (the reference only checks required ones). */
  def schemaMatches(df: DataFrame, expected: StructType): CheckResult = {
    val actual = df.schema.map(f => f.name -> f.dataType).toMap
    val missing = expected.fields.filter(f => !actual.contains(f.name)).map(_.name)
    val wrongType = expected.fields.filter(f =>
      actual.get(f.name).exists(_ != f.dataType))
      .map(f => s"${f.name}: expected ${f.dataType.simpleString}, got ${actual(f.name).simpleString}")
    val ok = missing.isEmpty && wrongType.isEmpty
    CheckResult("schema", ok,
      if (ok) "schema matches"
      else s"missing=[${missing.mkString(",")}] wrongType=[${wrongType.mkString("; ")}]")
  }

  /** V2 — not_null test: zero NULLs in each listed column. One aggregate
    * row regardless of table size. */
  def notNull(df: DataFrame, cols: Seq[String]): CheckResult = {
    // coalesce: sum over ZERO rows is SQL NULL — an empty incremental
    // batch must pass the check, not NPE on getLong
    val counts = df.agg(
      count(lit(1)).as("__n"),
      cols.map(c => coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(c)): _*).head()
    val bad = cols.zipWithIndex.collect { case (c, i) if counts.getLong(i + 1) > 0 =>
      s"$c=${counts.getLong(i + 1)}" }
    CheckResult("not_null", bad.isEmpty,
      if (bad.isEmpty) "no nulls" else s"null counts: ${bad.mkString(",")}")
  }

  /** V2 — unique test on a (composite) key. */
  def unique(df: DataFrame, keys: Seq[String]): CheckResult = {
    val dups = duplicateKeys(df, keys).count()
    CheckResult("unique", dups == 0,
      if (dups == 0) "key unique" else s"$dups duplicated key values")
  }

  /** The violating key values (the dbt `unique` test's failing-rows query —
    * also an oracle-checkable operator in its own right). */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col).toSeq: _*).agg(count(lit(1)).as("cnt")).filter(col("cnt") > 1)

  /** V2 — dbt_utils.expression_is_true(count(*) > 0). */
  def nonEmpty(df: DataFrame): CheckResult = {
    val n = df.limit(1).count()
    CheckResult("non_empty", n > 0, if (n > 0) "has rows" else "empty relation")
  }

  /** A3/S10 — row-count reconciliation: source count probe vs rows loaded
    * (casreport_to_ods.py:413-416). */
  def rowCountReconciles(expected: Long, actual: Long): CheckResult =
    CheckResult("row_count", expected == actual, s"expected=$expected actual=$actual")

  /** Referential-integrity violations (the dbt `relationships` test's
    * failing-rows query): child rows whose foreign key resolves to no
    * parent. NULL foreign keys are NOT orphans (SQL FK semantics — a
    * NULL reference is "unknown", not "dangling"). One left-anti join
    * on the key; with a dimension-sized parent it broadcasts, with a
    * fact-sized parent it is the same single key shuffle as the merge
    * path. */
  def fkOrphans(child: DataFrame, childKeys: Seq[String],
                parent: DataFrame, parentKeys: Seq[String]): DataFrame = {
    require(childKeys.nonEmpty && childKeys.size == parentKeys.size,
      s"childKeys/parentKeys must be non-empty and aligned, got $childKeys vs $parentKeys")
    val p = parent.select(parentKeys.map(col): _*).toDF(childKeys: _*).distinct()
    child.filter(childKeys.map(col(_).isNotNull).reduce(_ && _))
      .join(p, childKeys, "left_anti")
  }

  /** dbt's `accepted_values` test: rows whose column value falls
    * outside the declared domain (NULLs are not violations — dbt pairs
    * this with `not_null` when both are wanted). One filter, no
    * shuffle; the failing rows, like every dbt test's compiled query. */
  def acceptedValuesViolations(df: DataFrame, column: String,
                               values: Seq[String]): DataFrame = {
    require(values.nonEmpty, "accepted_values needs at least one value")
    df.filter(col(column).isNotNull &&
      !col(column).cast("string").isin(values: _*))
  }

  /** Verdict wrapper over [[acceptedValuesViolations]]. */
  def acceptedValues(df: DataFrame, column: String,
                     values: Seq[String]): CheckResult = {
    val n = acceptedValuesViolations(df, column, values).count()
    CheckResult(s"accepted_values($column)", n == 0,
      if (n == 0) "all values in domain"
      else s"$n rows outside ${values.mkString("[", ", ", "]")}")
  }

  /** The pass/fail wrapper over [[fkOrphans]] — the dbt
    * `relationships` test verdict. */
  def referentialIntegrity(child: DataFrame, childKeys: Seq[String],
                           parent: DataFrame, parentKeys: Seq[String]): CheckResult = {
    val n = fkOrphans(child, childKeys, parent, parentKeys).count()
    CheckResult("relationships", n == 0,
      if (n == 0) "all references resolve" else s"$n orphaned child rows")
  }

  /** Run a batch of checks, failing fast like the reference's in-operator
    * Soda scan (raise on first failed batch). */
  def enforce(checks: Seq[CheckResult]): Unit = {
    val failed = checks.filterNot(_.passed)
    if (failed.nonEmpty)
      throw new IllegalStateException(
        "validation failed: " + failed.map(c => s"${c.name} (${c.detail})").mkString("; "))
  }
}
