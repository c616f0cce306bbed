package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` surface: Spark 4 made `Column` expression-
  * agnostic (Spark Connect), so wrapping a custom Catalyst `Expression`
  * into a `Column` goes through `classic.ExpressionUtils`, which is
  * package-private. This object lives in `org.apache.spark.sql` to expose
  * exactly the two conversions the graft function API needs — the same
  * technique public Spark extension libraries use. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
