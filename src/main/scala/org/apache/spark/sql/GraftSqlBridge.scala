package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private[sql] bridge for the custom-plan tier: constructing a
  * DataFrame from a hand-built LogicalPlan (Dataset.ofRows) and reading a
  * DataFrame's analyzed plan are both package-private in Spark's public
  * API. Living in org.apache.spark.sql is the standard extension-library
  * pattern for exactly these two calls — nothing else is accessed. */
object GraftSqlBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def logicalPlan(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].logicalPlan

  /** Is `cls` among the session's planner strategies (i.e. was the
    * extension injected)? Drives the planned-vs-cogroup fallback. */
  def hasStrategy(spark: SparkSession, cls: Class[_]): Boolean =
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.planner.strategies.exists(cls.isInstance)
}
