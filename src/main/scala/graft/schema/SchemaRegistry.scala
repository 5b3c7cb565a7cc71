package graft.schema

import org.apache.spark.sql.types._

/** Declarative per-table pipeline configuration.
  *
  * The reference drives every pipeline from JSON parameter files mapping
  * column name → pandas dtype plus cursor/key metadata
  * (reference pipeline_params JSON files, applied via `astype` at
  * plugins/operators/bccp_to_ods.py:240). We keep the same
  * "schema is config, not code" decision (SURVEY.md §1.2) but express it as
  * Spark `StructType` plus merge metadata, so one [[TableConfig]] fully
  * determines extraction, normalization, and merge behavior for a table.
  *
  * @param name        fully-qualified table name, e.g. "bccp.item"
  * @param schema      declared column types (applied with try_cast semantics)
  * @param keys        business primary key (1..9 columns in the reference —
  *                    e.g. 9-col null-safe key at
  *                    dags/sql/ods_to_llb/update_des_table/staging_revenue_by_employee.sql:3-12)
  * @param cursorField CDC cursor column (half-open window `[start, end)`)
  * @param guard       late-update guard for MERGE (SURVEY.md §2.6 M1)
  * @param nullSafeKeys whether key equality is null-safe (`ISNULL(a,'')=ISNULL(b,'')`)
  * @param renameMap   src→des column renames (reference pipeline_params/hrm.json)
  * @param partitionCol time-partition column for overwrite semantics (M4)
  */
final case class TableConfig(
    name: String,
    schema: StructType,
    keys: Seq[String],
    cursorField: Option[String] = None,
    guard: MergeGuard = MergeGuard.None,
    nullSafeKeys: Boolean = false,
    renameMap: Map[String, String] = Map.empty,
    partitionCol: Option[String] = None)

/** Comparator guarding WHEN MATCHED updates — the reference uses `<`, `>`,
  * and `>=` variants plus guard-less merges (SURVEY.md §2.6 M1/M2;
  * guard example: dags/sql/bccp/update_des_table/bccp_item.sql:169).
  */
sealed trait MergeGuard
object MergeGuard {
  /** Unconditioned upsert (M2). */
  case object None extends MergeGuard
  /** Update only when `target.col < source.col` (strictly newer wins). */
  final case class TargetOlder(col: String) extends MergeGuard
  /** Update only when `source.col >= target.col` (ties also win). */
  final case class SourceNotOlder(col: String) extends MergeGuard
}

/** Registry of table configs — the Spark-side port of pipeline_params/.
  *
  * Configs register at startup (or parse from JSON lines); lookups are by
  * qualified name. Pure metadata — no Spark session needed.
  */
final class SchemaRegistry(initial: Seq[TableConfig] = Seq.empty) {
  private val tables = scala.collection.mutable.LinkedHashMap[String, TableConfig](
    initial.map(c => c.name -> c): _*)

  def register(c: TableConfig): this.type = { tables(c.name) = c; this }
  def apply(name: String): TableConfig = tables.getOrElse(
    name, throw new NoSuchElementException(s"no table config registered for '$name'"))
  def get(name: String): Option[TableConfig] = tables.get(name)
  def names: Seq[String] = tables.keys.toSeq
}

object SchemaRegistry {

  /** Map the reference's declared pandas dtypes to Spark types
    * (SURVEY.md §1.3). `object` is the escape hatch → string.
    */
  def sparkType(pandasDtype: String): DataType = pandasDtype match {
    case "string" | "str" | "object" => StringType
    case "Int64" | "int" | "int64"   => LongType
    case "Int32" | "int32"           => IntegerType
    case "float64" | "float"         => DoubleType
    case "bool" | "boolean"          => BooleanType
    case "datetime64[ns]" | "datetime" | "timestamp" => TimestampType
    case "date"                      => DateType
    case other => throw new IllegalArgumentException(s"unmapped dtype '$other'")
  }

  /** Build a StructType from (name, pandasDtype) pairs — the literal shape
    * of a pipeline_params entry. All columns nullable (sources are dirty).
    */
  def structOf(cols: (String, String)*): StructType =
    StructType(cols.map { case (n, t) => StructField(n, sparkType(t), nullable = true) })
}
