package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column <-> Expression conversion
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Spark 4 wraps Column
  * around ColumnNode; building typed Columns from custom Catalyst
  * expressions requires this internal hop — same technique every expression
  * library (e.g. Sedona's spark-shims) uses.
  */
package object graftbridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  /** DataFrame over an analyzed logical plan (`Dataset.ofRows` is
    * `private[sql]`) — used by the spatial-join rule's contraction probe
    * to run its memoized distinct-ratio aggregate over one side of a
    * matched join. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
