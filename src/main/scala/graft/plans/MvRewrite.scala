package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DoubleType

/** Materialized-view (summary-table) definition for [[MvRewrite]].
  *
  * `baseTag` identifies the base table by path suffix (e.g.
  * `"lineitem.parquet"` — matched against the scan's root paths).
  * `dims` are the grouping columns the summary was built on; a query
  * aggregate is rewritable only if its GROUP BY (and any filter) uses a
  * subset of them. `sumOf`/`minOf`/`maxOf` map a base measure column to
  * the summary column holding its per-dim-tuple partial (`sum(x)`,
  * `min(x)`, `max(x)`); `countCol` holds `count(*)` per tuple.
  *
  * The summary must be registered as the ANALYZED plan of a scan over
  * the summary parquet (a plain `LogicalRelation`) so the rewrite splices
  * a real relation — with its own pushdown/pruning — into the query tree.
  */
case class MvDef(
    baseTag: String,
    dims: Set[String],
    sumOf: Map[String, String],
    minOf: Map[String, String],
    maxOf: Map[String, String],
    countCol: String,
    summary: LogicalRelation)

/** Process-wide registry the optimizer rule consults. Registration is an
  * explicit user act (like creating an MV in a warehouse); nothing is
  * rewritten unless a definition matches. */
object MvRegistry {
  @volatile private var defs: Vector[MvDef] = Vector.empty
  def register(d: MvDef): Unit = synchronized {
    defs = defs.filterNot(_.baseTag == d.baseTag) :+ d
  }
  def clear(): Unit = synchronized { defs = Vector.empty }
  def all: Seq[MvDef] = defs
}

/** Aggregate-over-base → aggregate-over-summary rewrite (the classic
  * materialized-view matching of Goldstein & Larson, SIGMOD '01, scoped
  * to the SPJA-over-one-table shape that covers reporting rollups).
  *
  * At 100 TB the win is structural: a `GROUP BY dim` over the fact table
  * re-scans terabytes for every report, while the summary is MBs — the
  * rewrite turns a full-scan aggregate into a summary-scan re-aggregate
  * with the same answer. Decomposition rules:
  *
  *   sum(x)    → sum(sum_x)
  *   count(*)  → sum(cnt)          (count(1) / any foldable non-null arg)
  *   min(x)    → min(min_x)
  *   max(x)    → max(max_x)
  *   avg(x)    → sum(sum_x) / cast(sum(cnt) as double)
  *
  * Rewrite fires only when ALL of the following hold — otherwise the
  * aggregate is left untouched (correctness first, the rule must never
  * change results):
  *   - the child is the registered base scan, through attribute-only
  *     Projects and Filters whose predicates touch only `dims`;
  *   - every GROUP BY expression references only dim columns (bare dims
  *     or deterministic expressions over them — grouping coarser than
  *     the summary's grain re-aggregates exactly);
  *   - every output is a deterministic expression over group dims and
  *     decomposable aggregate calls (the five forms above, each over a
  *     bare registered measure column, non-DISTINCT, un-FILTERed).
  *
  * Exactness: sum/count/min/max re-aggregation is exact by associativity;
  * avg is exact when the partial sums are (integer-valued doubles, longs,
  * decimals). Float sums of non-integer values can differ from the base
  * plan only by reassociation — the same nondeterminism Spark's own
  * partial aggregation already has.
  *
  * Output attribute ExprIds are preserved via aliases so parent operators'
  * references stay valid. The rewritten plan scans the summary path, which
  * no longer matches `baseTag`, so the rule is idempotent under the
  * optimizer's fixed-point batch.
  */
object MvRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MvRegistry.all.isEmpty) plan
    else plan.transform {
      case agg @ Aggregate(groupExprs, aggExprs, child, _) =>
        rewrite(groupExprs, aggExprs, child).getOrElse(agg)
    }

  /** Peel Projects and Filters off the aggregate child down to a bare
    * scan, accumulating filter predicates and a substitution map for
    * aliased project expressions (PullOutGroupingExpressions moves
    * computed GROUP BY keys into such a Project). Definitions are
    * resolved bottom-up, so every expression in the returned map and
    * every condition references only base-relation attributes. */
  private def strip(
      p: LogicalPlan
  ): Option[(Seq[Expression], LogicalRelation, Map[ExprId, Expression])] = p match {
    case r: LogicalRelation => Some((Nil, r, Map.empty))
    case Project(projList, c) if projList.forall(e =>
        e.isInstanceOf[AttributeReference] || e.isInstanceOf[Alias]) =>
      strip(c).map { case (cs, r, sub) =>
        val mine = projList.collect {
          case a: Alias => a.exprId -> substitute(a.child, sub)
        }
        (cs, r, sub ++ mine)
      }
    case Filter(cond, c) =>
      strip(c).map { case (cs, r, sub) => (cs :+ substitute(cond, sub), r, sub) }
    case _ => None
  }

  private def substitute(e: Expression, sub: Map[ExprId, Expression]): Expression =
    if (sub.isEmpty) e
    else e.transformUp {
      case a: AttributeReference if sub.contains(a.exprId) => sub(a.exprId)
    }

  private def pathsOf(rel: LogicalRelation): Seq[String] = rel.relation match {
    case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
    case _ => Seq.empty
  }

  private def rewrite(
      groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = {
    for {
      (conds, baseRel, sub) <- strip(child)
      mv <- MvRegistry.all.find(m => pathsOf(baseRel).exists(_.endsWith(m.baseTag)))
      g = groupExprs.map(substitute(_, sub))
      a = aggExprs.map(ne => substitute(ne, sub) match {
        case n: NamedExpression => n
        case e => Alias(e, ne.name)(exprId = ne.exprId)
      })
      plan <- rewriteWith(mv, g, a, conds)
    } yield plan
  }

  private def rewriteWith(
      mv: MvDef,
      groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      conds: Seq[Expression]): Option[LogicalPlan] = {
    // fresh ExprIds per splice: the same MV may serve several aggregates
    // in one tree and attribute ids must stay unique
    val sRel = mv.summary.newInstance()
    val sAttr: Map[String, Attribute] = sRel.output.map(a => a.name -> a).toMap

    def dimAttr(e: Expression): Option[Attribute] = e match {
      case a: AttributeReference if mv.dims.contains(a.name) => sAttr.get(a.name)
      case _ => None
    }

    // every filter predicate must be expressible over summary dims
    def rewriteCond(e: Expression): Option[Expression] = {
      val ok = e.references.forall(a => mv.dims.contains(a.name) && sAttr.contains(a.name))
      if (ok && e.deterministic)
        Some(e.transform { case a: AttributeReference => sAttr(a.name) })
      else None
    }

    def isCountAll(c: Count): Boolean =
      c.children.forall(ch => ch.foldable && !ch.nullable)

    // decompose one aggregate call; None = not rewritable
    def rewriteAggFn(f: AggregateFunction): Option[Expression] = {
      def partial(m: Map[String, String], a: Expression): Option[Attribute] = a match {
        case ar: AttributeReference => m.get(ar.name).flatMap(sAttr.get)
        case _ => None
      }
      def complete(fn: AggregateFunction): Expression =
        AggregateExpression(fn, Complete, isDistinct = false)
      f match {
        case Sum(a, ansi) => partial(mv.sumOf, a).map(p => complete(Sum(p, ansi)))
        case c: Count if isCountAll(c) =>
          sAttr.get(mv.countCol).map(p => complete(Sum(p)))
        case Min(a) => partial(mv.minOf, a).map(p => complete(Min(p)))
        case Max(a) => partial(mv.maxOf, a).map(p => complete(Max(p)))
        case Average(a, _) =>
          for {
            s <- partial(mv.sumOf, a)
            c <- sAttr.get(mv.countCol)
          } yield Divide(
            Cast(AggregateExpression(Sum(s), Complete, isDistinct = false), DoubleType),
            Cast(AggregateExpression(Sum(c), Complete, isDistinct = false), DoubleType))
        case _ => None
      }
    }

    // Rewrite an arbitrary expression tree: decomposable aggregate calls
    // swap to their summary re-aggregation, bare dim refs swap to summary
    // attrs, anything touching a non-dim column refuses. Explicit
    // recursion (not transform) so the rewritten subtrees — which contain
    // fresh AggregateExpressions over summary columns — are never
    // re-matched as if they were base-table aggregates.
    def rw(e: Expression): Option[Expression] = e match {
      case AggregateExpression(f, _, false, None, _) => rewriteAggFn(f)
      case _: AggregateExpression => None // DISTINCT / FILTER / PERCENTILE...
      case a: AttributeReference => dimAttr(a)
      case other if other.deterministic =>
        val kids = other.children.map(rw)
        if (kids.forall(_.isDefined)) Some(other.withNewChildren(kids.map(_.get)))
        else None
      case _ => None
    }

    val newGroup: Option[Seq[Expression]] = {
      val gs = groupExprs.map(rw)
      if (gs.forall(_.isDefined)) Some(gs.map(_.get)) else None
    }

    val newConds: Option[Seq[Expression]] = {
      val cs = conds.map(rewriteCond)
      if (cs.forall(_.isDefined)) Some(cs.map(_.get)) else None
    }

    def rewriteOutput(ne: NamedExpression): Option[NamedExpression] = ne match {
      case a: AttributeReference =>
        dimAttr(a).map(s => Alias(s, a.name)(exprId = a.exprId))
      case al: Alias =>
        rw(al.child).map(e => Alias(e, al.name)(exprId = al.exprId))
      case _ => None
    }

    for {
      g <- newGroup
      cs <- newConds
      outs <- {
        val os = aggExprs.map(rewriteOutput)
        if (os.forall(_.isDefined)) Some(os.map(_.get)) else None
      }
    } yield {
      val filtered = cs.foldLeft(sRel: LogicalPlan)((p, c) => Filter(c, p))
      Aggregate(g, outs, filtered)
    }
  }
}
