package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's private[sql] Column↔Expression conversions (Spark 4
  * wraps Column in ColumnNode; custom Catalyst expressions need this hop).
  * Lives under org.apache.spark.sql.* for access; keep it this thin.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly converts the ColumnNode tree to its catalyst Expression
    * ([[expression]] returns a lazy wrapper whose structure cannot be
    * pattern-matched before analysis). */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** DataFrame over a (possibly unresolved) logical plan — analysis runs
    * against the session catalog at creation, exactly like spark.sql.
    * Needed by the SQL DML layer: a parsed MERGE source subquery is a
    * LogicalPlan, and classic.Dataset.ofRows is private[sql]. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
