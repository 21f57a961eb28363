package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeReference, Cast, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{DataType, LongType}

/** Materialized-rollup query routing — the lakehouse answer to "this
  * aggregate re-scans the 100 TB fact table for the thousandth time".
  * A registered rollup is a pre-aggregated summary of a base scan at a
  * declared grain (group columns) with declared mergeable measures
  * (SUM / COUNT(*) / MIN / MAX — exactly the algebraic aggregates
  * whose partials re-combine losslessly). This optimizer rule rewrites
  * any logical `Aggregate` that the rollup SUBSUMES — grouping by a
  * subset of the grain, filtering only on grain columns, computing
  * only mapped measures — to re-aggregate the summary scan instead of
  * the base scan: SUM(x) → SUM(sum_x), COUNT(*) → SUM(cnt),
  * MIN/MAX(x) → MIN/MAX(min_x/max_x). At cluster scale the summary is
  * 3–6 orders of magnitude smaller than the fact table, so a routed
  * query reads megabytes instead of terabytes; the rewrite is
  * value-exact because every mapped measure is decomposable and the
  * summary's sums accumulate on the same exact DECIMAL grid the
  * queries use (order-independent, so re-aggregation cannot drift).
  *
  * Safety gates (any miss → the plan is left untouched):
  *  - the aggregate's child must unwrap (through attribute-only
  *    Projects and Filters) to the registered base relation, matched
  *    by its file-source root paths;
  *  - every grouping expression is a bare grain-column attribute;
  *  - every filter references only grain columns (so the predicate
  *    evaluates identically per summary row — the grain functionally
  *    determines it);
  *  - every aggregate call maps: SUM over the registered column with
  *    the registered cast (or none), COUNT of a literal (count(*)),
  *    MIN/MAX over a registered column; no DISTINCT, no FILTER clause;
  *  - output exprIds are preserved via re-aliasing, so the parent plan
  *    above the Aggregate is untouched.
  *
  * Wired at runtime through `experimental.extraOptimizations` (the
  * [[SimplifySqrtThreshold]] stance) by
  * [[graft.operators.Rollups.materialize]]; the rule is a no-op while
  * the registry is empty and self-terminating once rewritten (the
  * summary's paths are not a registered base).
  */
object RollupRouting extends Rule[LogicalPlan] {

  /** One mapped SUM measure: the query-side call must be `Sum(col)`
    * (castTo = None) or `Sum(Cast(col, castTo.get))`, and the summary
    * holds its per-grain partial in `summaryCol`. */
  final case class SumSpec(baseCol: String, castTo: Option[DataType],
      summaryCol: String)

  /** A registered rollup: base scan identity (root paths), the
    * ANALYZED summary scan to splice in, the grain, and the measure
    * map. */
  final case class Registration(
      basePaths: Set[String],
      summary: LogicalPlan,
      groupCols: Set[String],
      sums: Seq[SumSpec],
      countCol: Option[String],
      mins: Map[String, String],
      maxs: Map[String, String])

  private val regs = new ConcurrentHashMap[String, Registration]()

  /** Register (or refresh) a rollup and install the rule on the
    * session. Re-registration replaces the stored summary plan — the
    * caller re-captures it after every summary rewrite, because the
    * analyzed plan pins the file listing of the moment. */
  def register(spark: SparkSession, key: String, reg: Registration): Unit = {
    require(reg.groupCols.nonEmpty, "RollupRouting: empty grain")
    val have = reg.summary.output.map(_.name).toSet
    val need = reg.groupCols ++ reg.sums.map(_.summaryCol) ++
      reg.countCol ++ reg.mins.values ++ reg.maxs.values
    require(need.subsetOf(have),
      s"RollupRouting: summary is missing ${(need -- have).mkString(", ")}")
    regs.put(key, reg)
    this.synchronized {
      if (!spark.experimental.extraOptimizations.contains(this))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ this
    }
  }

  def unregister(key: String): Unit = regs.remove(key)

  /** Test isolation: clear every registration (queries re-register on
    * each invocation, so clearing is always safe). A lingering
    * registration from another suite otherwise wins the path lookup
    * and a spec asserts against the wrong summary. */
  def unregisterAll(): Unit = regs.clear()

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (regs.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }

  /** Strip attribute-only Projects, collect Filters, land on the scan. */
  private def unwrap(p: LogicalPlan, conds: Seq[Expression])
      : Option[(LogicalRelation, Seq[Expression])] = p match {
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      unwrap(c, conds)
    case Filter(cond, c) => unwrap(c, conds :+ cond)
    case lr: LogicalRelation => Some((lr, conds))
    case _ => None
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (lr, conds) = unwrap(agg.child, Nil).getOrElse(return None)
    val paths = lr.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString).toSet
      case _ => return None
    }
    val reg = regs.values.asScala.find(_.basePaths == paths)
      .getOrElse(return None)

    // Grouping: bare grain attributes only, present in the summary with
    // the identical type.
    val sAttr: Map[String, Attribute] =
      reg.summary.output.map(a => a.name -> a).toMap
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference
          if reg.groupCols(a.name) &&
            sAttr.get(a.name).exists(_.dataType == a.dataType) => a
      case _ => return None
    }
    // Filters: grain-determined predicates only.
    if (conds.exists(!_.references.forall(a => reg.groupCols(a.name))))
      return None

    // Fresh summary instance per splice (stable exprIds would collide if
    // the same rollup served two aggregates in one plan).
    val fresh = reg.summary match {
      case m: MultiInstanceRelation => m.newInstance().asInstanceOf[LogicalPlan]
      case other => other
    }
    val fAttr: Map[String, Attribute] =
      fresh.output.map(a => a.name -> a).toMap

    def sumOf(name: String): Expression =
      Sum(fAttr(name)).toAggregateExpression()

    /** Map one aggregate call onto the summary, or None. */
    def rewriteCall(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      def baseAttr(e: Expression): Option[(String, Option[DataType])] =
        e match {
          case a: AttributeReference => Some((a.name, None))
          case c: Cast => c.child match {
            case a: AttributeReference => Some((a.name, Some(c.dataType)))
            case _ => None
          }
          case _ => None
        }
      ae.aggregateFunction match {
        case s: Sum =>
          baseAttr(s.child).flatMap { case (n, castTo) =>
            reg.sums.find(sp => sp.baseCol == n && sp.castTo == castTo)
              .map { sp =>
                val re = sumOf(sp.summaryCol)
                if (re.dataType == ae.dataType) re else Cast(re, ae.dataType)
              }
          }
        case c: Count =>
          (c.children, reg.countCol) match {
            case (Seq(Literal(_, _)), Some(cnt)) =>
              val re = sumOf(cnt)
              val typed = if (re.dataType == LongType) re
                          else Cast(re, LongType)
              // count is non-null; a summed count over zero rows only
              // happens on a global aggregate of an empty base, where
              // COUNT(*) = 0.
              Some(Coalesce(Seq(typed, Literal(0L))))
            case _ => None
          }
        case m: Min =>
          baseAttr(m.child) match {
            case Some((n, None)) if reg.mins.contains(n) =>
              Some(Min(fAttr(reg.mins(n))).toAggregateExpression())
            case _ => None
          }
        case m: Max =>
          baseAttr(m.child) match {
            case Some((n, None)) if reg.maxs.contains(n) =>
              Some(Max(fAttr(reg.maxs(n))).toAggregateExpression())
            case _ => None
          }
        case _ => None
      }
    }

    val groupNames = groupAttrs.map(_.name).toSet
    val freshIds = fresh.output.map(_.exprId).toSet
    var ok = true
    val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        // grouping passthrough: keep the original exprId for the parent
        if (groupNames(a.name)) Alias(fAttr(a.name), a.name)(exprId = a.exprId)
        else { ok = false; a }
      case ne =>
        // Two phases, because a single bottom-up transform visits the
        // attributes INSIDE an aggregate call before the call itself
        // and cannot tell them from stray base references. Phase 1
        // swaps whole aggregate calls by object identity (the
        // replacements' own children are summary attributes and must
        // not be re-visited as "base" refs); phase 2 maps what's left:
        // summary attrs (by exprId) pass through, grouping attrs map
        // by name, anything else vetoes the rewrite.
        val calls = scala.collection.mutable
          .Map.empty[AggregateExpression, Expression]
        ne.foreach {
          case ae: AggregateExpression if !calls.contains(ae) =>
            rewriteCall(ae) match {
              case Some(nw) => calls(ae) = nw
              case None => ok = false
            }
          case _ =>
        }
        val phase1 = ne.transformDown {
          case ae: AggregateExpression if calls.contains(ae) => calls(ae)
        }
        val phase2 = phase1.transformUp {
          case a: AttributeReference =>
            if (freshIds(a.exprId)) a
            else if (groupNames(a.name)) fAttr(a.name)
            else { ok = false; a }
        }
        phase2 match {
          case n: NamedExpression => n
          case other => Alias(other, ne.name)(exprId = ne.exprId)
        }
    }
    if (!ok) return None

    // Filters rewritten onto the summary attributes, then a pruning
    // Project so the summary scan reads only the referenced columns.
    val filtered = conds.foldLeft(fresh) { (p, c) =>
      Filter(c.transformUp {
        case a: AttributeReference => fAttr(a.name)
      }, p)
    }
    val used = (groupAttrs.map(_.name) ++
      newAggExprs.flatMap(_.collect { case a: AttributeReference => a.name }))
      .distinct.filter(fAttr.contains)
    val pruned = Project(used.map(fAttr), filtered)
    Some(Aggregate(groupAttrs.map(a => fAttr(a.name)), newAggExprs, pruned))
  }
}
