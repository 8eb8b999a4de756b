package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the one `private[sql]` constructor a whole-operator
  * extension needs: turning a custom resolved [[LogicalPlan]]
  * ([[graft.plans.AsOfJoinPlan]]) back into a [[DataFrame]]. Spark's
  * extension points cover injecting rules/strategies/functions but offer no
  * public "plan → Dataset" door, so libraries that add plan NODES place this
  * one-liner in the `org.apache.spark.sql` package — the established pattern
  * for Spark-native operator libraries. Nothing else of Spark's internals is
  * re-exported.
  */
object GraftPlanBridge {
  def ofRows(spark: classic.SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark, plan)
}
