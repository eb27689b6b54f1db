package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's `private[sql]` Column <-> Expression conversions.
  * Spark 4 made `Column` wrap a `ColumnNode`; libraries that need to hand
  * Catalyst `Expression`s to the function registry (as this one does for
  * struct-packed dynamic-UDF calls) go through
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is `private[sql]` —
  * hence this shim lives under `org.apache.spark.sql`.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge into `Dataset.ofRows` (also `private[sql]` in Spark 4): the
  * catalog DML rewrite holds the MERGE source as the LogicalPlan
  * Spark's parser produced, and must re-wrap it as a DataFrame at
  * execution — exactly what every internal command does via `ofRows`.
  */
object DatasetBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
