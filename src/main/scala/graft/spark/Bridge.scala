package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge for the classic (non-Connect)
  * runtime. Spark 4 wraps Columns in ColumnNode and scopes the
  * conversion (`ExpressionUtils`) `private[sql]`, so this shim lives
  * under the sql package — the standard pattern for libraries that
  * define their own Catalyst expressions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
