package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between our custom Catalyst expressions and the public Column API
  * (Spark 4 Columns wrap ColumnNodes; the converters are private[sql], so
  * this one-file shim lives in the sql package). Public Spark API only. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
