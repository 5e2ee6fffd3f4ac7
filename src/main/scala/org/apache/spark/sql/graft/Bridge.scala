package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(Expression) constructor; the
  * supported conversion lives in `classic.ExpressionUtils`, which is
  * private[sql]. This bridge (compiled into the sql namespace, the
  * standard technique for Catalyst extensions) re-exports the two
  * conversions our custom expressions need.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `sql.types.AbstractDataType` is private[sql]; expressions outside
    * the sql namespace need the alias to declare ExpectsInputTypes
    * contracts (the alias dealiases to the same type, so overriding
    * `inputTypes: Seq[AbstractDataType]` type-checks).
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType

  /** DataFrame from a (resolved) logical plan — classic Dataset.ofRows is
    * private[sql].
    */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  ): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan
    )
}
