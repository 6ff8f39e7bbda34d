package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's native Catalyst expressions and the public
  * `Column` API. Spark 4 made Column construction go through ColumnNode;
  * the converter lives behind `private[sql]`, hence this shim package. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Apply a SparkSessionExtensions configurator's injected functions —
    * scalar AND table-valued — to an ALREADY-RUNNING session (extensions
    * normally only take effect at session construction via
    * `spark.sql.extensions`). */
  def installFunctions(session: SparkSession, configure: SparkSessionExtensions => Unit): Unit = {
    val ext = new SparkSessionExtensions
    configure(ext)
    ext.registerFunctions(session.sessionState.functionRegistry)
    ext.registerTableFunctions(session.sessionState.tableFunctionRegistry)
  }
}
