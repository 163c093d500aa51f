/** Bridge into Spark's package-private Expression↔Column converters.
  *
  * Spark 4 made the classic bridges `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils); a library adding a
  * native Catalyst expression needs exactly these two calls, so this
  * one-object shim lives in the sql package — the established pattern
  * for Spark extension libraries. Nothing else in the repo touches
  * Spark internals.
  */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object graftshim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
