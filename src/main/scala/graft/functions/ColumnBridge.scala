package org.apache.spark.sql.graftops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's custom Catalyst expressions.
  *
  * Spark 4 wraps Column around ColumnNode and gates the classic
  * Expression-backed constructors behind `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils), so a library defining
  * its own expressions needs one file in the sql package namespace to
  * re-expose them — the same technique Spark extension libraries use.
  * Keep everything else in graft.* packages.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
