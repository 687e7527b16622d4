package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into private[sql] plan construction — the standard technique for
  * Spark extension libraries that add logical operators (the public API has
  * no "DataFrame from LogicalPlan" constructor). Lives under
  * org.apache.spark.sql so private[sql] members resolve; contains no logic.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
