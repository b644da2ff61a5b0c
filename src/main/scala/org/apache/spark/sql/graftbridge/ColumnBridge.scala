package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the Column↔Expression bridges private[sql]
  * (org.apache.spark.sql.classic.ExpressionUtils). Extensions that
  * define native Catalyst expressions need them; this shim lives in the
  * org.apache.spark.sql package tree to re-export the two calls —
  * the standard technique for out-of-tree Catalyst extensions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
