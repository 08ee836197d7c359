// Lives in org.apache.spark.sql to reach the private[sql] Dataset.ofRows —
// the standard pattern for Spark-native libraries that construct their own
// logical plan nodes (a DataFrame can only be built from a LogicalPlan
// through this door).
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
