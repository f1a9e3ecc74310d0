package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the package-private classic Dataset factory — the
  * standard technique for Spark extension libraries that construct
  * DataFrames from custom `LogicalPlan` nodes (the public API has no
  * plan-level constructor). Only `ofRows` is exposed; nothing else in
  * the private surface is touched. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
