package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between our custom Catalyst expressions and the public Column
  * API: `classic.ExpressionUtils` is `private[sql]`, so this one-file
  * shim lives in the org.apache.spark.sql namespace (the standard
  * library-extension pattern — no Spark internals are modified). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
