package graft.ops

import graft.schema.TableConfig
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level normalization operators (SURVEY.md §2.2 P1–P16).
  *
  * Everything here is pure `Column` expression composition — no UDFs — so
  * every transform stays inside whole-stage codegen and is visible to
  * Catalyst for pushdown/pruning. Each function cites the reference
  * behavior it reproduces.
  */
object Normalize {

  /** P1 — explicit projection. The reference never SELECT *'s a source
    * (dags/sql/bccp/extract/bccp_item.sql:4-160). */
  def project(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col).toSeq: _*)

  /** P2 — blank out PII-ish columns at extract
    * (dags/sql/bccp/extract/bccp_item.sql:7,9-10,67-74). */
  def blankColumns(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, lit("")))

  /** P3 — force columns to NULL before load
    * (plugins/operators/hrm_to_ods.py:199-201). */
  def nullColumns(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, lit(null).cast(d.schema(c).dataType)))

  /** P7 — scrub control characters from every string column: the reference
    * strips `\r` and `\x00` cell-by-cell in pandas
    * (plugins/operators/casreport_to_ods.py:343) and via
    * `TRIM(REGEXP_REPLACE(col,'\r|\n|\x00','','g'))` in dbt
    * (dbt/macros/transformations.sql:4-6).
    */
  def scrubStrings(df: DataFrame, alsoTrim: Boolean = false): DataFrame = {
    val stringCols = df.schema.fields.collect { case StructField(n, StringType, _, _) => n }.toSet
    if (stringCols.isEmpty) df
    else df.select(df.columns.map { c =>
      if (stringCols(c)) {
        val cleaned = regexp_replace(col(c), "[\\r\\x00]", "")
        (if (alsoTrim) trim(cleaned) else cleaned).as(c)
      } else col(c)
    }.toSeq: _*)
  }

  /** P8 — CamelCase → snake_case rename, same regex intent as
    * plugins/operators/bccp_to_ods.py:219-223. */
  def snakeCase(name: String): String =
    name
      .replaceAll("([A-Z]+)([A-Z][a-z])", "$1_$2")
      .replaceAll("([a-z0-9])([A-Z])", "$1_$2")
      .toLowerCase
  def snakeCaseColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(snakeCase).toSeq: _*)

  /** P9 — null-defaulting: fillna(0) on numeric columns
    * (plugins/operators/casreport_to_ods.py:324-328). */
  def fillNumericDefaults(df: DataFrame): DataFrame = {
    val numeric = df.schema.fields.collect {
      case StructField(n, _: NumericType, _, _) => n
    }
    df.na.fill(0, numeric)
  }

  /** P11 — sentinel-date preservation. The reference round-trips year 9999
    * through 2261 purely because pandas Timestamp.max is 2262
    * (casreport_to_ods.py:331-335; casreport_d_service_product.sql:11-18).
    * Spark timestamps cover year 9999, so we only normalize any residual
    * 2261 sentinel back to the canonical open-ended validity marker.
    */
  val SentinelEnd = "9999-12-31 00:00:00"
  def restoreSentinelDates(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c,
        when(year(col(c)) === 2261, to_timestamp(lit(SentinelEnd)))
          .otherwise(col(c))))

  /** P12 — null out impossible-early dates: `year < 1000` → NULL
    * (dags/sql/cms/extract/customers.sql:8-9) and `< 1700-01-01` → NULL
    * (khl_to_ods_backdate.py:225-239). */
  def nullEarlyDates(df: DataFrame, cols: Seq[String], minYear: Int = 1700): DataFrame =
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, when(year(col(c)) < minYear, lit(null)).otherwise(col(c))))

  /** P13 — repair thousands-dot numerics:
    * `CAST(REGEXP_REPLACE(WEIGHT,'\.','','g') AS BIGINT)`
    * (dags/sql/khl/update_des_table/khl_portal_item_dtl.sql:17). */
  def repairDottedNumber(c: Column): Column =
    regexp_replace(c, "\\.", "").cast(LongType)

  /** P15 — int-encoded `yyyymmdd` date helpers
    * (dags/sql/pns/update_des_table/update_datamart.sql:24-26). */
  def yyyymmddToDate(c: Column): Column = to_date(c.cast(StringType), "yyyyMMdd")
  def yyyymmToMonth(c: Column): Column = (c / 100).cast(IntegerType)

  /** P16 — surrogate key, the Spark equivalent of
    * dbt_utils.generate_surrogate_key (dbt/macros/transformations.sql:22-24). */
  def surrogateKey(cols: Seq[String]): Column =
    sha2(concat_ws("||", cols.map(c => coalesce(col(c).cast(StringType), lit("__null__"))): _*), 256)

  /** Empty-string → NULL scrub on listed columns
    * (pns_to_ods_optimize.py:325-327). */
  def emptyToNull(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, when(trim(col(c)) === "", lit(null)).otherwise(col(c))))

  /** S7-style coercion — apply a declared schema with `try_cast` semantics:
    * malformed values become NULL instead of failing the job (the reference
    * coerces per-cell with range guards, pns_to_ods_optimize.py:142-165;
    * out-of-int-range values → null at 148-163).
    * Columns absent from the input are added as typed NULLs; extra input
    * columns are dropped (projection is part of the contract, P1).
    */
  def coerce(df: DataFrame, target: StructType): DataFrame = {
    // case-insensitive source lookup, matching Spark's default resolver —
    // a JDBC source that upper-cases identifiers (Derby/Oracle style) must
    // not silently coerce every declared column to NULL
    val byLower = df.columns.map(c => c.toLowerCase -> c).toMap
    df.select(target.fields.map { f =>
      byLower.get(f.name.toLowerCase) match {
        case Some(src) => try_cast_col(col(src), f.dataType).as(f.name)
        case None      => lit(null).cast(f.dataType).as(f.name)
      }
    }.toSeq: _*)
  }

  private def try_cast_col(c: Column, dt: DataType): Column = dt match {
    // Integral targets: try the exact integral cast first (keeps bigint
    // surrogate keys above 2^53 exact — a double detour would round them),
    // and only route fractional strings like "12.7" through DECIMAL, which
    // truncates toward zero and turns overflow into NULL — the same
    // null-on-out-of-range the reference's per-cell int guards apply
    // (pns_to_ods_optimize.py:148-163).
    case LongType | IntegerType =>
      val s = c.cast(StringType)
      coalesce(s.try_cast(dt.sql), s.try_cast("decimal(38,9)").try_cast(dt.sql))
    case _ => c.try_cast(dt.sql)
  }

  /** Apply a table's renameMap (reference pipeline_params/hrm.json, applied
    * at hrm_to_ods.py:140-142). */
  def rename(df: DataFrame, renames: Map[String, String]): DataFrame =
    df.withColumnsRenamed(renames)

  /** The standard ingest normalization chain for a configured table:
    * rename → scrub → coerce to declared schema. This is the Spark
    * restatement of the reference's extract-side pandas pipeline
    * (astype + snake_case + scrub, bccp_to_ods.py:212-263).
    */
  def ingest(df: DataFrame, cfg: TableConfig): DataFrame = {
    val renamed = rename(df, cfg.renameMap)
    coerce(scrubStrings(renamed), cfg.schema)
  }
}
