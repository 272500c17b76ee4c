package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Dataset constructor so the engine can
  * materialize a DataFrame from a hand-built logical plan (the standard
  * pattern for Spark extension libraries that add custom operators). */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column → fully-converted Catalyst Expression. (ExpressionUtils
    * .expression returns a lazy ColumnNode WRAPPER whose internal sort
    * nodes are not serializable — executors then fail with
    * NotSerializableException on internal.SortOrder$NullsLast$; the
    * converter object produces the real catalyst tree.) */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
