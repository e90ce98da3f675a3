package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 hides the classic converters
  * behind `private[sql]`; this shim lives in the sql package
  * namespace to re-export the two conversions the function registry
  * integration needs (public bytecode, standard extension-library
  * technique — no Spark internals are modified). */
object ColumnBridge {
  /** Eager conversion via the classic converter — the lazy
    * `ColumnNodeExpression` wrapper `ExpressionUtils.expression`
    * returns would survive into codegen unresolved when used inside a
    * FunctionRegistry builder. */
  def expr(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
