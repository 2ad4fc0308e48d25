package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal accessor into Spark's `private[sql]` Column ↔ Expression
  * bridge (org.apache.spark.sql.classic.ExpressionUtils), needed to
  * expose custom Catalyst expressions as user-facing Columns in Spark 4
  * (the public Column constructor was removed in 4.0).
  */
package object graftbridge {
  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Build a DataFrame from a custom LogicalPlan (Dataset.ofRows is
    * private[sql]) — needed to expose custom plan nodes as user frames. */
  def datasetOf(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
