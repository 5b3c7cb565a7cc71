package graft.pipeline

/** Per-run job configuration — the engine's `dag_run.conf`
  * (SURVEY.md §2.10 V5, §2.8 backfill).
  *
  * The reference gates each table's TaskGroup on an optional
  * `conf["tables"]` subset (ShortCircuitOperator, bccp_dag.py:60-67,81-85)
  * and switches every operator into manual-backfill mode when
  * `{start_time, end_time}` arrive in the run conf
  * (casreport_to_ods.py:84-90).
  *
  * @param tables  optional subset filter — None runs everything
  * @param window  optional manual backfill window `[start, end)` that
  *                overrides the scheduled one
  * @param manual  route loads through the `_manual` staging twin (M5)
  */
final case class RunConfig(
    tables: Option[Seq[String]] = None,
    window: Option[(String, String)] = None,
    manual: Boolean = false) {

  /** V5 — is this table enabled for this run? */
  def tableEnabled(name: String): Boolean = tables.forall(_.contains(name))

  /** Resolve the effective window: manual override wins over schedule. */
  def effectiveWindow(scheduledStart: String, scheduledEnd: String): (String, String) =
    window.getOrElse((scheduledStart, scheduledEnd))
}
