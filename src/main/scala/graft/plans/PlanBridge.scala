// Lives in org.apache.spark.sql to reach the private[sql] Dataset.ofRows —
// the standard pattern for Spark-native libraries that construct their own
// logical plan nodes (a DataFrame can only be built from a LogicalPlan
// through this door).
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Re-root `df` on its own execution RDD (a `LogicalRDD` leaf): the
    * catalyst plan chain is truncated — iterative operators otherwise
    * nest each round's whole plan inside the next, and analysis blows
    * the heap after ~30 rounds — while the RDD keeps ITS lineage, so a
    * lost executor recomputes the partition instead of killing the job
    * (the property `localCheckpoint` gives up). Pair with `persist` so
    * the scan hits cached blocks rather than recomputing per action. */
  def rddRoot(df: DataFrame): DataFrame = {
    val c = df.asInstanceOf[classic.Dataset[Row]]
    val plan = execution.LogicalRDD.fromDataset(
      c.queryExecution.toRdd, c, isStreaming = false)
    classic.Dataset.ofRows(c.sparkSession, plan)
  }

  /** Eager localCheckpoint that KEEPS the frame's physical partitioning
    * and ordering. `Dataset.localCheckpoint` (and `LogicalRDD.fromDataset`)
    * capture `outputPartitioning` from the AdaptiveSparkPlanExec root
    * BEFORE the final plan exists, so every materialized frame comes back
    * `UnknownPartitioning(0)` (probed on 4.1.2) and iterative operators
    * re-exchange their edge frames every round even when the layout was
    * established once up front. This variant materializes first, then
    * reads the partitioning off the FINAL adaptive plan — whose output
    * attributes carry the same exprIds as the logical output, so the
    * rewritten leaf's partitioning lines up with downstream join keys. */
  def reRootKeyed(df: DataFrame, localCkpt: Boolean): DataFrame = {
    val c = df.asInstanceOf[classic.Dataset[Row]]
    val qe = c.queryExecution
    val rdd = qe.toRdd.map(_.copy())
    if (localCkpt) rdd.localCheckpoint()
    rdd.count() // materialize now so the adaptive plan is final below
    val fin = qe.executedPlan match {
      case a: execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val plan = execution.LogicalRDD(
      c.logicalPlan.output, rdd, fin.outputPartitioning, fin.outputOrdering,
      isStreaming = false)(c.sparkSession, None, None)
    classic.Dataset.ofRows(c.sparkSession, plan)
  }
}
