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

  /** `internalCreateDataFrame` (InternalRow RDD + schema → DataFrame) is
    * `private[sql]` on SparkSession; the packing op uses it to re-wrap a
    * mapPartitions pass without a Row<->InternalRow round trip. */
  def internalCreateDataFrame(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)
}
