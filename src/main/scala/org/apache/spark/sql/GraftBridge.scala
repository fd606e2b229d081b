package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Column ⇄ Expression bridge. Spark 4 made the classic converters
 * (`org.apache.spark.sql.classic.ExpressionUtils`) private[sql] as part of
 * the Connect split; a library shipping a custom Catalyst expression still
 * needs them on the classic runtime, hence this one-file package shim —
 * the standard pattern for Spark-native extension libraries.
 */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
