package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.{JoinType, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Logical as-of join: for each left row, attach the single right row with
  * the greatest `rightTime <= leftTime` (or `<` when `strict`) among rows
  * sharing the join keys — the temporal-resolution primitive the reference
  * implements as a correlated `TOP 1 ... WHERE from <= ts ORDER BY from
  * DESC` per fact row (`sql/calc/run-calculation.sql:107-110`).
  *
  * Spark has no native as-of join; composing it from built-ins costs an
  * equi join that fans out every fact row to ALL of its candidate versions
  * plus a second shuffle-and-sort (rank-1 window over the fact id) to keep
  * the latest. This node exists so the planner can use [[AsOfJoinExec]]:
  * one co-partitioned sort on each side and a single merge pass that emits
  * exactly one row per fact row — no fan-out, no second shuffle. At 100 TB
  * the fan-out is the difference between shuffling |facts| rows and
  * shuffling |facts| x avg-versions rows.
  *
  * The node is constructed already resolved (from analyzed child plans and
  * attributes resolved against them — see `operators.AsOfNative`), so it
  * needs no analyzer support; the optimizer treats it as an opaque binary
  * node, which is safe (nothing is pushed through it).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    joinType: JoinType,
    strict: Boolean) extends BinaryNode {

  override def output: Seq[Attribute] = joinType match {
    case LeftOuter => left.output ++ right.output.map(_.withNullability(true))
    case _         => left.output ++ right.output
  }

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]; registered through
  * `GraftExtensions` (`injectPlannerStrategy`). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, jt, strict) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, jt, strict) :: Nil
    case _ => Nil
  }
}
