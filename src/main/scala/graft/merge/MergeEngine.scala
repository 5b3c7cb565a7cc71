package graft.merge

import graft.schema.{MergeGuard, TableConfig}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed upsert / snapshot / partition-overwrite semantics — the heart of
  * the reference (SURVEY.md §2.6 M1–M5): 18 Jinja MERGE files, 10 snapshot
  * files, 4 delete-window+insert files, all re-expressed as one
  * DataFrame-level merge algorithm.
  *
  * Without Delta Lake on the classpath the merge is a job-level algorithm
  * (SURVEY.md §7.3): dedup the source to one row per key (latest-wins),
  * then a single full-outer join keyed on the business PK resolves each row
  * to target / source / guarded-target. One shuffle on the key; with a
  * small source the join broadcasts. At 100 TB the same code runs
  * unchanged: the key join is the only wide dependency, AQE handles skewed
  * keys, and a bucketed target table makes the join shuffle-free on the
  * target side.
  *
  * Idempotence property (the reference's backdate DAGs re-merge whole days
  * on top of 5-minute increments — SURVEY.md §2.8): `upsert(upsert(t, s), s)
  * == upsert(t, s)` for every guard variant. Tested in MergeEngineSpec.
  */
object MergeEngine {

  /** Deterministic latest-wins dedup of the source batch before merging.
    *
    * Postgres MERGE errors on duplicate source keys; the reference either
    * pre-dedups with ROW_NUMBER (hrm_employee.sql:1-26) or relies on
    * upstream PK uniqueness. The engine always resolves: keep the row with
    * the greatest cursor value per key (SURVEY.md §7.4 "duplicate keys in
    * source batches"). A content hash over all columns breaks cursor ties,
    * so replayed batches pick the same winner every run (true ties are
    * byte-identical rows, where any pick is the same row).
    */
  def latestPerKey(src: DataFrame, keys: Seq[String], orderBy: Seq[Column]): DataFrame = {
    // xxhash64 rejects MapType — tiebreak only over hashable columns (a
    // frame that is ALL maps beyond its keys degrades to an arbitrary-but-
    // single pick, same as dropDuplicates)
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case _ => true
    }
    val hashCols = src.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    val tiebreak = if (hashCols.isEmpty) lit(0L) else xxhash64(hashCols.toSeq: _*)
    val w = Window.partitionBy(keys.map(col).toSeq: _*).orderBy(orderBy :+ tiebreak.asc: _*)
    src.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** M1/M2 — keyed upsert with optional late-update guard.
    *
    * Semantics of `MERGE INTO target USING source ON key
    *   WHEN MATCHED [AND guard] THEN UPDATE SET *
    *   WHEN NOT MATCHED THEN INSERT *`
    * (M1 guard at dags/sql/bccp/update_des_table/bccp_item.sql:169;
    * M2 guard-less at e.g. casreport_settlements.sql).
    *
    * Target rows with no source match pass through; matched rows take the
    * source version iff the guard admits it; unmatched source rows insert.
    * Output column set = target's.
    */
  def upsert(target: DataFrame, source: DataFrame, cfg: TableConfig): DataFrame =
    merge(target, source, cfg, target.columns.toSet)

  /** Shared merge core. `updateCols` is the set of columns the source is
    * allowed to overwrite on a guard-admitted match — standard MERGE
    * `UPDATE SET` semantics update only the columns the source statement
    * names. [[upsert]] passes every target column (source was projected to
    * the target schema); [[upsertEvolving]] passes only the ORIGINAL source
    * columns, so target-only columns keep their target-side value on
    * matched rows instead of being nulled by the widened NULL source. */
  private def merge(target: DataFrame, source: DataFrame, cfg: TableConfig,
                    updateCols: Set[String]): DataFrame = {
    require(cfg.keys.nonEmpty, s"${cfg.name}: merge requires keys")
    val cursorOrder = cfg.cursorField.map(c => col(c).desc_nulls_last).toSeq
    val src = latestPerKey(source, cfg.keys, cursorOrder)
      .select(target.columns.map(col).toSeq: _*)

    // Prefix-rename BOTH sides before the join. toDF allocates fresh
    // attribute ids and the disjoint names let every downstream reference
    // resolve by name — which is what makes replay (`upsert(upsert(t,s),s)`,
    // the backdate-DAG shape, SURVEY.md §2.8) legal: the first output shares
    // lineage with `source`, and df("col")-style references on a re-merge
    // trip Spark's ambiguous-self-join detection.
    val t_ = (c: String) => s"__t_$c"
    val s_ = (c: String) => s"__s_$c"
    // presence markers make "matched" detection key-null-proof (keys can be
    // NULL under null-safe equality, so key.isNotNull is not a valid probe)
    val tm = target.toDF(target.columns.map(t_).toSeq: _*).withColumn("__tp", lit(1))
    val sm = src.toDF(target.columns.map(s_).toSeq: _*).withColumn("__sp", lit(1))
    // Null-safe (`<=>`) or plain key equality: the reference uses
    // `ISNULL(a,'')=ISNULL(b,'')` on nullable composite keys
    // (dags/sql/ods_to_llb/update_des_table/staging_revenue_by_employee.sql:3-12).
    val cond = cfg.keys.map { k =>
      if (cfg.nullSafeKeys) col(t_(k)) <=> col(s_(k)) else col(t_(k)) === col(s_(k))
    }.reduce(_ && _)
    val j = tm.join(sm, cond, "full_outer")

    val guardAdmits: Column = cfg.guard match {
      case MergeGuard.None => lit(true)
      // NULL guard comparisons: SQL `des.x < src.x` is NULL→no update,
      // matching the reference MERGE's WHEN MATCHED AND semantics.
      case MergeGuard.TargetOlder(c)    => col(t_(c)) < col(s_(c))
      case MergeGuard.SourceNotOlder(c) => col(s_(c)) >= col(t_(c))
    }
    val takeSource =
      (col("__tp").isNull && col("__sp").isNotNull) ||            // INSERT
      (col("__tp").isNotNull && col("__sp").isNotNull && guardAdmits) // guarded UPDATE

    j.select(target.columns.map { c =>
      // non-updatable (target-only) columns always carry the target value:
      // on INSERT rows the target side of the full outer is NULL anyway,
      // and on matched rows the downstream-added value survives the update
      if (updateCols(c)) when(takeSource, col(s_(c))).otherwise(col(t_(c))).as(c)
      else col(t_(c)).as(c)
    }.toSeq: _*)
  }

  /** M1/M2 with schema evolution — the ODS schema-drift story the
    * reference handles by manual ALTER TABLE before deploys. Source
    * columns absent from the target are added (NULL for pre-existing
    * target rows); target columns absent from the source KEEP their
    * target-side value on matched updates (UPDATE sets only source
    * columns — Delta/standard MERGE evolution semantics) and are NULL on
    * inserted rows; columns present on both sides keep the TARGET's type,
    * with the source try_cast into it. Same single-shuffle plan as
    * [[upsert]].
    */
  def upsertEvolving(target: DataFrame, source: DataFrame, cfg: TableConfig): DataFrame = {
    val tTypes = target.schema.map(f => f.name -> f.dataType).toMap
    val sTypes = source.schema.map(f => f.name -> f.dataType).toMap
    val allCols = target.columns ++ source.columns.filterNot(target.columns.contains)
    def widen(df: DataFrame): DataFrame = {
      val have = df.columns.toSet
      df.select(allCols.map { c =>
        val t = tTypes.getOrElse(c, sTypes(c))
        if (!have(c)) lit(null).cast(t).as(c)
        else if (df.schema(c).dataType == t) col(c)
        else col(c).try_cast(t.sql).as(c)
      }.toSeq: _*)
    }
    merge(widen(target), widen(source), cfg, source.columns.toSet)
  }

  /** M3 — snapshot replace: `TRUNCATE des; INSERT SELECT FROM staging`
    * (casadmin_*.sql:1-2). Trivial by design: the new frame IS the table.
    * Kept as an operator so pipelines state intent (and so a sink can map
    * it to `write.mode("overwrite")`).
    */
  def snapshot(source: DataFrame): DataFrame = source

  /** M4 — partition overwrite: `DELETE FROM des WHERE p IN [start,end);
    * INSERT … WHERE same-window` (casreport_rpt_full_item.sql:300-304,
    * dags/pns_dag.py:88-105). Idempotent time-partition replacement.
    * On a partitioned parquet/Delta table this is `replaceWhere` /
    * dynamic-partition overwrite; as an algebraic operator it is:
    * keep target rows outside the window ∪ source rows inside the window.
    */
  def partitionOverwrite(target: DataFrame, source: DataFrame,
                         partitionCol: String, lo: Column, hi: Column): DataFrame = {
    val inWindow  = (c: DataFrame) => c(partitionCol) >= lo && c(partitionCol) < hi
    target.filter(!inWindow(target) || target(partitionCol).isNull)
      .unionByName(source.filter(inWindow(source)).select(target.columns.map(col).toSeq: _*))
  }

  /** Columns [[scd2Merge]] adds to the tracked attributes. */
  val Scd2Cols: Seq[String] = Seq("valid_from", "valid_to", "is_current")

  /** SCD2 history merge — dbt's `snapshot` (timestamp strategy), the
    * slowly-changing-dimension type-2 operator: every change to a key's
    * attributes opens a new history row stamped `[valid_from, valid_to)`,
    * with the current version carrying `valid_to IS NULL` /
    * `is_current = true`.
    *
    * Contract (what the oracle query proves): building the history
    * incrementally over any forward-moving sequence of batches is
    * INDISTINGUISHABLE from one window-function recompute over the full
    * deduped event set — `valid_to = lead(valid_from) over (key order by
    * valid_from)`. Two rules make that hold under replays and ties:
    *
    *   - batches dedup per (key, cursor) with a deterministic winner
    *     (caller's `tieBreak` order, then [[latestPerKey]]'s content-hash
    *     tiebreak), so a replayed batch picks the same row every run;
    *   - a batch row at-or-before its key's OPEN `valid_from` is dropped
    *     (snapshots only move forward — dbt's rule): an exact replay is
    *     a no-op, and late out-of-order history is rejected rather than
    *     silently interleaved into already-closed spans.
    *
    * Scale shape: one dedup shuffle on (keys, cursor), one key-shuffle
    * window over OPEN rows ∪ fresh batch only — closed history is
    * untouched (union'd back verbatim), so per-run cost is O(batch +
    * open rows), not O(history). */
  def scd2Merge(history: Option[DataFrame], batch: DataFrame, keys: Seq[String],
                cursorCol: String, tieBreak: Seq[Column] = Nil): DataFrame = {
    require(keys.nonEmpty, "scd2Merge requires keys")
    require(!batch.columns.exists(Scd2Cols.contains),
      s"batch columns collide with SCD2 bookkeeping (${Scd2Cols.mkString(", ")})")
    val deduped = latestPerKey(batch.filter(col(cursorCol).isNotNull),
      keys :+ cursorCol, tieBreak)
    val attrs = deduped.columns.filterNot(c => keys.contains(c) || c == cursorCol).toSeq
    def rebuild(rows: DataFrame): DataFrame = {
      val w = Window.partitionBy(keys.map(col): _*).orderBy(col(cursorCol).asc)
      rows.withColumn("valid_to", lead(col(cursorCol), 1).over(w))
        .withColumnRenamed(cursorCol, "valid_from")
        .withColumn("is_current", col("valid_to").isNull)
    }
    history match {
      case None => rebuild(deduped)
      case Some(h) =>
        val open = h.filter(col("valid_to").isNull)
        val closed = h.filter(col("valid_to").isNotNull)
        val openFrom = open.select(keys.map(col) :+ col("valid_from").as("__open_from"): _*)
        val fresh = deduped.join(openFrom, keys, "left")
          .filter(col("__open_from").isNull || col(cursorCol) > col("__open_from"))
          .drop("__open_from")
        val openAsRows = open.select(
          (keys ++ attrs).map(col) :+ col("valid_from").as(cursorCol): _*)
        closed.unionByName(rebuild(openAsRows.unionByName(
          fresh.select((keys ++ attrs).map(col) :+ col(cursorCol): _*))))
    }
  }

  /** SCD2 `check` strategy — dbt's alternative for sources with no
    * reliable `updated_at`: a key opens a new version whenever any of
    * `checkCols` CHANGED versus its open row (null-safe comparison), all
    * stamped with the caller-supplied `asOf` batch time. dbt stamps
    * `current_timestamp()`; taking `asOf` explicitly keeps the operator
    * deterministic and replayable — same batch + same asOf is a strict
    * no-op (every key compares unchanged), so crash-rerun is free.
    * Caller contract: one logical state per key per batch (extra rows
    * resolve by content-hash dedup), `asOf` strictly increasing across
    * runs. One key-shuffle full-outer join of OPEN rows × batch; closed
    * history unions back untouched — O(batch + open rows) per run. */
  def scd2CheckMerge(history: Option[DataFrame], batch: DataFrame, keys: Seq[String],
                     checkCols: Seq[String], asOf: Column): DataFrame = {
    require(keys.nonEmpty, "scd2CheckMerge requires keys")
    require(checkCols.nonEmpty, "scd2CheckMerge needs checkCols to detect change")
    require(!batch.columns.exists(Scd2Cols.contains),
      s"batch columns collide with SCD2 bookkeeping (${Scd2Cols.mkString(", ")})")
    val b = latestPerKey(batch, keys, Nil)
    val attrs = b.columns.filterNot(keys.contains).toSeq
    val nullTo = when(lit(false), asOf) // typed NULL matching asOf
    def firstRun(src: DataFrame): DataFrame = src
      .withColumn("valid_from", asOf)
      .withColumn("valid_to", nullTo)
      .withColumn("is_current", lit(true))
    history match {
      case None => firstRun(b)
      case Some(h) =>
        val open = h.filter(col("is_current"))
        val closed = h.filter(!col("is_current"))
        val oSide = open.select(
          keys.map(col) ++ attrs.map(a => col(a).as(s"__o_$a")) :+
            col("valid_from").as("__o_from") :+ lit(true).as("__o_present"): _*)
        val nSide = b.select(
          keys.map(col) ++ attrs.map(a => col(a).as(s"__n_$a")) :+
            lit(true).as("__n_present"): _*)
        val j = oSide.join(nSide, keys, "full_outer")
        val changed = checkCols.map(c => !(col(s"__o_$c") <=> col(s"__n_$c"))).reduce(_ || _)
        val hasO = col("__o_present")
        val hasN = col("__n_present")
        val keepOpen = j.filter(hasO && (hasN.isNull || !changed)).select(
          keys.map(col) ++ attrs.map(a => col(s"__o_$a").as(a)) :+
            col("__o_from").as("valid_from") :+ nullTo.as("valid_to") :+
            lit(true).as("is_current"): _*)
        val closeOld = j.filter(hasO && hasN && changed).select(
          keys.map(col) ++ attrs.map(a => col(s"__o_$a").as(a)) :+
            col("__o_from").as("valid_from") :+ asOf.as("valid_to") :+
            lit(false).as("is_current"): _*)
        val openNew = j.filter(hasN && (hasO.isNull || changed)).select(
          keys.map(col) ++ attrs.map(a => col(s"__n_$a").as(a)) :+
            asOf.as("valid_from") :+ nullTo.as("valid_to") :+
            lit(true).as("is_current"): _*)
        closed.unionByName(keepOpen).unionByName(closeOld).unionByName(openNew)
    }
  }

  /** M4 variant — overwrite every partition value present in the source
    * (`spark.sql.sources.partitionOverwriteMode=dynamic` semantics). */
  def dynamicPartitionOverwrite(target: DataFrame, source: DataFrame,
                                partitionCol: String): DataFrame = {
    // `<=>` so a NULL partition in the source replaces the target's NULL
    // partition, matching Spark's own dynamic partition overwrite (a plain
    // `===` anti-join would keep the old NULL-partition rows AND append the
    // new ones — duplicates).
    val parts = source.select(col(partitionCol).as("__part")).distinct()
    target.join(parts, col(partitionCol) <=> col("__part"), "left_anti")
      .unionByName(source.select(target.columns.map(col).toSeq: _*))
  }
}
