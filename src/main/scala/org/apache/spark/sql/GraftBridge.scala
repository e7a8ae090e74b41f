package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters —
  * Spark 4 hid them behind the api/classic split, and extension libraries
  * providing native Catalyst expressions (as this one does for
  * `cosine_similarity`) need exactly this hop. Nothing else in the engine
  * reaches into Spark internals.
  */
object GraftBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** Runtime function registration on a live session (the config-time
    * path is `spark.sql.extensions=graft.GraftExtensions`).
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
