package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, lit, sum}
import org.apache.spark.sql.types.{DataType, LongType}

/** Materialized-rollup query rewrite — the planner half of the
  * maintained-aggregate story (the maintenance half is
  * [[graft.pipeline.CdfRollup]]): a Catalyst rule, injected at
  * POST-HOC RESOLUTION (the slot view substitution uses — at analysis
  * time the query's fact subtree is still exactly the plan the
  * registration captured, before pruning/pushdown reshape it), that
  * recognizes an aggregate over a registered fact table whose grouping
  * keys and measures are derivable from a materialized rollup, and
  * rewrites the plan to RE-AGGREGATE the (tiny) rollup instead of
  * scanning the fact. At 100 TB this is the difference between a
  * full-fact shuffle and a kilobyte-scale scan; the rewrite is exact —
  * SUM re-aggregates from partial sums, COUNT(*) from the stored
  * per-group count, MIN/MAX from per-group extrema — and refuses
  * anything it cannot prove (distinct aggregates, filters on non-key
  * columns, unregistered measures, type drift).
  *
  * Registration is the opt-in: with an empty catalog the rule is a
  * no-op on every plan. Registration also states a freshness contract —
  * the caller keeps the rollup current (CdfRollup's O(changed-rows)
  * maintenance); the rule does no staleness detection, exactly like
  * engine materialized-view rewrite in Calcite/Delta. Scope rewrites
  * with [[RollupRewrite.withRollup]] so a shared session (Verify/Bench
  * run hundreds of queries in one SparkSession) never leaks a
  * registration past its query.
  *
  * Reference behavior: the reference's nightly datamart procs answer
  * repeated priority/flag rollup queries by re-scanning staging tables
  * (dags/sql/&#42;/datamart SQL files); this rule answers them from the
  * maintained aggregate instead.
  */
object RollupRewrite extends Rule[LogicalPlan] {

  /** A measure derivable from the rollup: the base column, the cast
    * applied under the aggregate (None = aggregated raw), the rollup
    * column holding the per-group partial sum, and optionally a rollup
    * column holding the per-group NON-NULL count of the measure —
    * registering it is what unlocks the AVG rewrite (avg = sum(x) /
    * count(x), and count(x) ≠ count(*) the moment the measure has
    * nulls — the group row count is never a safe denominator). */
  final case class SumMeasure(baseCol: String, cast: Option[DataType], rollupCol: String,
                              cntCol: Option[String] = None)

  /** One registered rollup. The fact is recognized either by the
    * parquet root paths of its single HadoopFsRelation scan
    * (`basePaths` — a raw table read) or, when the base is any richer
    * plan (a ManifestStore/MorStore read is a union of per-segment
    * scans), by CANONICALIZED-PLAN equality (`baseCanonical`). Plan
    * identity doubles as a freshness guard for store-backed facts: a
    * store commit changes the resolved plan, so a stale registration
    * silently stops matching until the maintenance loop re-registers
    * after its tick. `keys` are the grouping columns carried by the
    * rollup under the same names; `rollupPlan` yields a FRESH analyzed
    * plan per rewrite so two rewritten queries never share attribute
    * ids through one tree. */
  final case class Entry(
      name: String,
      basePaths: Option[Set[String]],
      baseCanonical: Option[LogicalPlan],
      // cheap identity pre-filter for canonical matching: two plans
      // with different output-name sets can never canonicalize equal,
      // and set equality is O(names) vs. O(plan) for canonicalization —
      // with many simultaneous registrations the rule stays cheap on
      // every non-matching aggregate it visits
      outputNames: Set[String],
      keys: Set[String],
      sums: Seq[SumMeasure],
      countCol: Option[String],
      mins: Map[String, String],
      maxs: Map[String, String],
      rollupPlan: () => LogicalPlan)

  private val entries = new ConcurrentHashMap[String, Entry]()

  /** Root paths of a DataFrame's single file-source scan — the identity
    * under which the fact table is recognized. */
  private def scanPaths(df: DataFrame): Set[String] =
    df.queryExecution.analyzed.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString).toSet
        case _ => Set.empty[String]
      }
    }.flatten.toSet

  /** Build the rollup DataFrame in the exact shape `register` expects:
    * one row per distinct `keys` tuple with every measure's partial.
    * Materialize the result (write + re-read) before registering — the
    * point is scanning something SMALLER than the fact. */
  def buildRollup(base: DataFrame, keys: Seq[String], sums: Seq[SumMeasure],
                  countCol: Option[String] = Some("cnt"),
                  mins: Map[String, String] = Map.empty,
                  maxs: Map[String, String] = Map.empty): DataFrame = {
    val aggs =
      sums.map(m => sum(m.cast.fold(col(m.baseCol))(dt => col(m.baseCol).cast(dt)))
        .as(m.rollupCol)) ++
      sums.flatMap(m => m.cntCol.map(c =>
        count(m.cast.fold(col(m.baseCol))(dt => col(m.baseCol).cast(dt))).as(c))) ++
      countCol.map(c => count(lit(1)).as(c)) ++
      mins.map { case (b, r) => org.apache.spark.sql.functions.min(col(b)).as(r) } ++
      maxs.map { case (b, r) => org.apache.spark.sql.functions.max(col(b)).as(r) }
    base.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  def register(spark: SparkSession, name: String, base: DataFrame,
               keys: Seq[String], sums: Seq[SumMeasure], rollup: => DataFrame,
               countCol: Option[String] = Some("cnt"),
               mins: Map[String, String] = Map.empty,
               maxs: Map[String, String] = Map.empty): Unit = {
    // a bare single-relation read is identified by its root paths (fast,
    // stable across re-reads); anything richer — store reads resolving
    // to segment unions — by canonical plan identity
    val analyzed = base.queryExecution.analyzed
    @scala.annotation.tailrec
    def unalias(p: LogicalPlan): LogicalPlan = p match {
      case sa: SubqueryAlias => unalias(sa.child)
      case other => other
    }
    val (paths, canonical) = unalias(analyzed) match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          (Some(fs.location.rootPaths.map(_.toString).toSet), None)
        case _ => (None, Some(analyzed.canonicalized))
      }
      case _ => (None, Some(analyzed.canonicalized))
    }
    require(paths.exists(_.nonEmpty) || canonical.nonEmpty,
      s"rollup '$name': base has no recognizable scan")
    entries.put(name, Entry(name, paths, canonical,
      analyzed.output.map(_.name).toSet, keys.toSet, sums, countCol,
      mins, maxs, () => rollup.queryExecution.analyzed))
  }

  def unregister(name: String): Unit = entries.remove(name)

  /** Scoped registration: rewrite only inside `body`, always cleaned up. */
  def withRollup[T](spark: SparkSession, name: String, base: DataFrame,
                    keys: Seq[String], sums: Seq[SumMeasure], rollup: => DataFrame,
                    countCol: Option[String] = Some("cnt"),
                    mins: Map[String, String] = Map.empty,
                    maxs: Map[String, String] = Map.empty)(body: => T): T = {
    register(spark, name, base, keys, sums, rollup, countCol, mins, maxs)
    try body finally unregister(name)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (entries.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }

  /** Peel the query's own Project(attrs)/Filter layers, collecting
    * filter conditions, trying the registered fact identities at EVERY
    * level — a store-backed base plan carries its own internal Filter
    * layers, which must match as part of the base, not be mistaken for
    * query predicates. Computed projections and joins above the fact
    * block the rewrite by never matching. */
  private def findMatch(p: LogicalPlan, conds: Seq[Expression])
      : Option[(Seq[Expression], Entry)] =
    matchEntry(p).map(e => (conds, e)).orElse(p match {
      case f: Filter => findMatch(f.child, conds :+ f.condition)
      case pr: Project if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
        findMatch(pr.child, conds)
      case sa: SubqueryAlias => findMatch(sa.child, conds)
      case v: View => findMatch(v.child, conds)
      case _ => None
    })

  private def matchEntry(remainder: LogicalPlan): Option[Entry] = {
    val byPath: Option[Entry] = remainder match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          val paths = fs.location.rootPaths.map(_.toString).toSet
          entries.values.asScala.find(_.basePaths.contains(paths))
        case _ => None
      }
      case _ => None
    }
    byPath.orElse {
      val names = remainder.output.map(_.name).toSet
      val candidates = entries.values.asScala
        .filter(e => e.baseCanonical.nonEmpty && e.outputNames == names)
      // canonicalize the query subtree only when some registration
      // survives the name pre-filter — the common case (an aggregate
      // over an unregistered table) pays set comparison only
      if (candidates.isEmpty) None
      else {
        val canon = remainder.canonicalized
        candidates.find(_.baseCanonical.exists(_ == canon))
      }
    }
  }

  private def tryRewrite(agg: Aggregate): Option[Aggregate] = for {
    (conds, entry) <- findMatch(agg.child, Nil)
    // every grouping key must be a plain registered-key attribute, and
    // every filter may touch registered keys only (it then applies
    // verbatim to the rollup, whose key columns are exact)
    if agg.groupingExpressions.forall {
      case ar: AttributeReference => entry.keys.contains(ar.name)
      case _ => false
    }
    if conds.forall(_.references.forall(a => entry.keys.contains(a.name)))
    // a condition must also be DETERMINISTIC and subquery-free: a
    // reference-free predicate like rand() < 0.5 passes the key check
    // above, but transplanting it turns a per-fact-row sample into a
    // per-group sample — silently different results from an automatic
    // rewrite; a subquery's result can likewise differ between the two
    // plans' evaluation contexts
    if conds.forall(c => c.deterministic &&
      c.collectFirst { case p: PlanExpression[_] => p }.isEmpty)
    rewritten <- rewriteAll(agg, conds, entry)
  } yield rewritten

  private def rewriteAll(agg: Aggregate, conds: Seq[Expression],
                         entry: Entry): Option[Aggregate] = {
    val rollup = entry.rollupPlan()
    val byName = rollup.output.map(a => a.name -> a).toMap
    // required rollup columns must all exist before attempting
    val needed = entry.keys ++ entry.sums.map(_.rollupCol) ++
      entry.sums.flatMap(_.cntCol) ++ entry.countCol ++
      entry.mins.values ++ entry.maxs.values
    if (!needed.forall(byName.contains)) return None

    def rollupAttr(n: String): Attribute = byName(n)

    // one aggregate call → its rollup-side replacement, result type
    // preserved EXACTLY (a decimal re-sum widens; cast back — the value
    // is the same number the direct plan would have produced)
    // the (baseCol, cast) identity under which both SUM and AVG
    // recognize a registered measure
    def matchMeasure(child: Expression): Option[SumMeasure] = child match {
      case ar: AttributeReference =>
        entry.sums.find(x => x.baseCol == ar.name && x.cast.isEmpty)
      case c: Cast => c.child match {
        case ar: AttributeReference =>
          entry.sums.find(x => x.baseCol == ar.name && x.cast.contains(c.dataType))
        case _ => None
      }
      case _ => None
    }

    def rewriteAggExpr(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.nonEmpty) return None
      // AVG first — its replacement is a RATIO of two re-aggregates
      // (sum of partial sums / sum of partial NON-NULL counts), not a
      // single AggregateFunction. Only measures registered with a
      // cntCol qualify. Double and decimal averages rewrite; interval
      // averages refuse.
      ae.aggregateFunction match {
        case avg: Average if avg.dataType == org.apache.spark.sql.types.DoubleType =>
          return matchMeasure(avg.child).flatMap(x => x.cntCol.map { cnt =>
            val sumAgg = AggregateExpression(
              Sum(rollupAttr(x.rollupCol)), ae.mode, isDistinct = false)
            val cntAgg = AggregateExpression(
              Sum(rollupAttr(cnt)), ae.mode, isDistinct = false)
            // cnt-sum 0 (all-null measure in every contributing group)
            // must divide to NULL — the direct plan's avg-over-no-values
            // answer under EVERY eval mode (avg ignores nulls, ANSI or
            // not). evalMode is pinned to LEGACY so an ANSI session
            // doesn't turn the rewrite into a DIVIDE_BY_ZERO error the
            // un-rewritten query never raises.
            Divide(Cast(sumAgg, org.apache.spark.sql.types.DoubleType),
              Cast(cntAgg, org.apache.spark.sql.types.DoubleType), EvalMode.LEGACY)
          })
        // Decimal AVG replicates Spark's own evaluateExpression shape
        // VERBATIM — `If(count = 0, null, DecimalDivideWithOverflowCheck(
        // sum, count.cast(Decimal(20,0)), resultType, _, nullOnOverflow))`
        // (Average.scala; the divide rounds HALF_UP directly at the
        // result type's scale, NOT through operator-Divide promotion,
        // which adjusts scale under precision pressure and would lose
        // trailing digits at high (p,s)). The one extra step: Σ(partial
        // sums) is computed wider (p+20) and cast back DOWN to the
        // direct plan's sum type (p+10) first — lossless on every input
        // where the direct sum doesn't overflow, NULL (legacy cast)
        // where the direct plan's sum buffer overflow nulls too.
        // nullOnOverflow mirrors the ORIGINAL avg's own evalMode, so an
        // ANSI avg's divide-overflow still errors; the one residual
        // corner (ANSI SUM-overflow: direct errors, rewrite nulls) is
        // documented in RollupRewriteSpec.
        case avg: Average if avg.child.dataType
            .isInstanceOf[org.apache.spark.sql.types.DecimalType] =>
          return matchMeasure(avg.child).flatMap(x => x.cntCol.flatMap { cnt =>
            val partial = rollupAttr(x.rollupCol)
            (partial.dataType, avg.dataType) match {
              case (pt: org.apache.spark.sql.types.DecimalType,
                    rt: org.apache.spark.sql.types.DecimalType) =>
                val sumAgg = AggregateExpression(
                  Sum(partial), ae.mode, isDistinct = false)
                val cntAgg = AggregateExpression(
                  Sum(rollupAttr(cnt)), ae.mode, isDistinct = false)
                val sumBack = Cast(sumAgg, pt)
                val cntDec = Cast(cntAgg, org.apache.spark.sql.types.DecimalType(20, 0))
                Some(If(EqualTo(cntAgg, Literal(0L)), Literal(null, rt),
                  DecimalDivideWithOverflowCheck(sumBack, cntDec, rt, null,
                    nullOnOverflow = avg.evalMode != EvalMode.ANSI)))
              case _ => None
            }
          })
        case _ => ()
      }
      val replaced: Option[AggregateFunction] = ae.aggregateFunction match {
        case s @ Sum(child, _) =>
          matchMeasure(child)
            .map(x => s.withNewChildren(Seq(rollupAttr(x.rollupCol))).asInstanceOf[AggregateFunction])
        case Count(Seq(Literal(1, _))) =>
          entry.countCol.map(c => Sum(rollupAttr(c)))
        case Count(Seq()) =>
          entry.countCol.map(c => Sum(rollupAttr(c)))
        case mn @ Min(ar: AttributeReference) =>
          entry.mins.get(ar.name).map(c => mn.withNewChildren(Seq(rollupAttr(c))).asInstanceOf[AggregateFunction])
        case mx @ Max(ar: AttributeReference) =>
          entry.maxs.get(ar.name).map(c => mx.withNewChildren(Seq(rollupAttr(c))).asInstanceOf[AggregateFunction])
        case _ => None
      }
      replaced.map { f =>
        val e: Expression = AggregateExpression(f, ae.mode, isDistinct = false)
        val typed = if (e.dataType == ae.dataType) e else Cast(e, ae.dataType)
        // count(*) is non-nullable; sum-of-counts is statically nullable
        // — coalesce restores the contract AND the empty-input value
        // (direct count over no rows is 0, sum over no rows is null)
        if (!ae.nullable && typed.nullable)
          Coalesce(Seq(typed, Literal.default(ae.dataType)))
        else typed
      }
    }

    // rewrite an output expression tree: aggregate calls map through
    // rewriteAggExpr, bare attributes must be grouping keys, scalar
    // scaffolding (casts, arithmetic over sums) carries over unchanged
    def rewriteExpr(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => rewriteAggExpr(ae)
      case ar: AttributeReference =>
        if (entry.keys.contains(ar.name)) Some(rollupAttr(ar.name)) else None
      case lit: Literal => Some(lit)
      case other =>
        val kids = other.children.map(rewriteExpr)
        if (kids.forall(_.isDefined)) Some(other.withNewChildren(kids.map(_.get)))
        else None
    }

    val newAggExprs: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      case ar: AttributeReference if entry.keys.contains(ar.name) =>
        Some(Alias(rollupAttr(ar.name), ar.name)(exprId = ar.exprId,
          qualifier = ar.qualifier))
      case al: Alias =>
        rewriteExpr(al.child).map(c =>
          Alias(c, al.name)(exprId = al.exprId, qualifier = al.qualifier))
      case _ => None
    }
    if (newAggExprs.exists(_.isEmpty)) return None
    val outExprs = newAggExprs.map(_.get)
    // the rewrite must be invisible: same output names AND types
    if (outExprs.map(e => (e.dataType, e.nullable)) !=
        agg.aggregateExpressions.map(e => (e.dataType, e.nullable))) return None

    val newGroupings: Seq[Expression] = agg.groupingExpressions.map {
      case ar: AttributeReference => rollupAttr(ar.name)
      case _ => return None
    }
    val mappedConds = conds.map { c =>
      c.transform { case ar: AttributeReference => rollupAttr(ar.name) }
    }
    val child = mappedConds.foldLeft(rollup)((p, c) => Filter(c, p))
    Some(agg.copy(groupingExpressions = newGroupings,
      aggregateExpressions = outExprs, child = child))
  }
}
