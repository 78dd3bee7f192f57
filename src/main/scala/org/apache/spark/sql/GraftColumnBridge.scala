package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql package: Spark 4's Column is node-based and the
  * Expression↔Column converters live behind private[sql]
  * (org.apache.spark.sql.classic.ExpressionUtils). Extension libraries
  * that ship native Catalyst expressions need this two-line door. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
