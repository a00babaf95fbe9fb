package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `Column(expr)`/`col.expr` bridge; the
  * supported path for libraries shipping native Catalyst expressions is
  * `sql.classic.ExpressionUtils`, which is `private[sql]`. This shim
  * re-exports just the two conversions graft.functions needs.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
