package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Expression ⇄ Column bridge for graft's custom Catalyst expressions.
  *
  * Spark 4 made `Column.expr` and the internal builders `private[sql]`
  * (Columns now carry ColumnNodes); the sanctioned pattern for extension
  * libraries that ship custom expressions (as used across the OSS Spark
  * ecosystem) is a small shim in the `org.apache.spark.sql` package that
  * re-exposes the two conversions.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame from a raw LogicalPlan (for custom logical operators). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Register a temp SQL function backed by a raw Expression builder on an
    * EXISTING session (the runtime counterpart of
    * `SparkSessionExtensions.injectFunction`, for sessions the library
    * does not construct — e.g. the driver-supplied one).
    */
  def registerExpressionFunction(
      spark: SparkSession, name: String, builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
