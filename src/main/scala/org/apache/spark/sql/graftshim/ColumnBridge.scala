package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ catalyst-Expression
  * converters (`org.apache.spark.sql.classic.ExpressionUtils`,
  * columnNodeSupport.scala in the Spark 4 source) so graft's custom
  * expressions ([[graft.functions.ArrayDot]]) can be used as `Column`s
  * without round-tripping through SQL strings. This is the standard
  * extension-library shim: one file inside the `org.apache.spark.sql`
  * package namespace, nothing else reaches into internals.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
