package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Column ⇄ catalyst Expression bridge for the classic (non-Connect)
  * runtime. Spark 4 wraps Columns in ColumnNode and scopes the
  * conversion `private[sql]`, so this shim lives under the sql
  * package — the standard pattern for libraries that define their own
  * Catalyst expressions.
  *
  * Column→Expression converts EAGERLY (ColumnNodeToExpressionConverter)
  * rather than via ExpressionUtils.expression's lazy
  * ColumnNodeExpression wrapper: expressions returned from a SQL
  * FunctionBuilder must be real Catalyst trees (Unresolved* nodes the
  * analyzer then resolves) — the lazy wrapper reaches codegen
  * unconverted and fails there.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter.apply(c.node)

  /** Wrap a custom logical plan as a DataFrame (Dataset.ofRows is
    * `private[sql]`) and read a DataFrame's analyzed plan — the two
    * hooks a library-defined LogicalPlan node needs. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def analyzed(df: org.apache.spark.sql.Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed
}
