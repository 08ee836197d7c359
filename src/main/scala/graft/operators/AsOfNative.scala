package graft.operators

import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.col
import graft.plans.AsOfJoinPlan

/** DataFrame API over the native as-of join ([[graft.plans.AsOfJoinExec]]).
  *
  * `Joins.asOfJoin` + `top1PerGroup` compose the same semantics from
  * built-ins (equi join, range residual, rank-1 window); this operator
  * plans it as one merge pass with no fan-out and no second shuffle. Use
  * the composed form when the query needs ALL covering versions; use this
  * when it needs the latest version at or before the fact's timestamp —
  * the overwhelmingly common case (reference
  * `sql/calc/run-calculation.sql:107-110`).
  *
  * Keys are given by name to sidestep expression-resolution pitfalls: the
  * logical node is built fully resolved from the children's analyzed
  * plans. The right side is re-aliased first so a self-as-of (both sides
  * reading one table) can't collide on attribute ids. Ties on
  * (keys, time) within the right side resolve to partition order — keep
  * (keys, time) unique on the right for deterministic output.
  */
object AsOfNative {

  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      on: Seq[(String, String)],
      leftTime: String,
      rightTime: String,
      joinType: String = "inner",
      strict: Boolean = false): DataFrame = {
    val jt: JoinType = joinType.toLowerCase match {
      case "inner" => Inner
      case "left" | "left_outer" | "leftouter" => LeftOuter
      case other => throw new IllegalArgumentException(
        s"as-of join supports inner/left_outer, got $other")
    }
    // fresh attribute ids on the right (Alias allocates new exprIds) so
    // left and right never share ids even when built from the same scan
    val rightAliased = right.select(right.columns.map(c => col(c).as(c)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rightAliased.queryExecution.analyzed

    def resolve(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"as-of $side column '$name' not in ${plan.output.map(_.name).mkString(", ")}"))

    val node = AsOfJoinPlan(
      lPlan, rPlan,
      on.map { case (l, _) => resolve(lPlan, l, "left") },
      on.map { case (_, r) => resolve(rPlan, r, "right") },
      resolve(lPlan, leftTime, "left"),
      resolve(rPlan, rightTime, "right"),
      jt, strict)
    GraftPlanBridge.ofRows(left.sparkSession, node)
  }
}
