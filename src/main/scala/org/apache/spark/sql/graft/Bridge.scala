package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.{Column, SparkSession}

/** Minimal bridge into Spark's `private[sql]` surface — the standard
  * pattern for libraries that define native Catalyst expressions:
  * Column↔Expression conversion and runtime function registration.
  * Everything used here is Spark's own public-in-bytecode API, just
  * package-scoped (`ExpressionUtils`, `sessionState.functionRegistry`).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a SQL-callable function on a live session (for sessions
    * we did not build — e.g. the driver's; sessions we do build can use
    * [[graft.functions.GraftExtensions]] instead). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")

  def functionInfo(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "")

  def functionId(name: String): FunctionIdentifier =
    FunctionIdentifier(name)
}
