package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` surface: Column ⇄ Expression
  * conversion for registering custom Catalyst expressions from the graft
  * packages (Spark 4 moved these behind org.apache.spark.sql.classic). */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The session's function registry (behind `sessionState`, which Spark 4
    * keeps off the public API) — used to register the graft expressions as
    * SQL functions in an already-running session. */
  def functionRegistry(spark: SparkSession): org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
}
