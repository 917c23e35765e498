package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one sanctioned crossing into Spark's private[sql] surface:
  * build a DataFrame from a custom LogicalPlan (the constructor every
  * extension library needs and Spark deliberately keeps non-public).
  * Nothing else in the engine lives outside the `graft` package.
  */
object GraftDatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
