package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into Spark's private[sql] surface, the standard
  * pattern for external Catalyst extensions: building a DataFrame from a
  * hand-constructed LogicalPlan needs Dataset.ofRows. Nothing else
  * crosses the boundary. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Catalyst expression behind a Column (Column.expr was internalized
    * behind ColumnNode in Spark 4). */
  def expr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Column over a hand-built Catalyst expression (the inverse of
    * [[expr]]; the public Column(expr) constructor is gone in Spark 4). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
}
