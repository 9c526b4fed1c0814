package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Narrow bridge to the classic Column <-> catalyst Expression converters,
  * which are `private[sql]` in Spark 4. This is the only file that lives in
  * the Spark namespace; everything else is public-API Scala.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
