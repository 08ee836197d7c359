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
}
