package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to Spark internals that are `private[sql]` in Spark 4:
  * the Column <-> catalyst Expression conversion and the session function
  * registry. Everything else in graft stays outside the spark namespace.
  */
object GraftSqlBridge {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** True when the session's SQL cache holds no entries — the test hook for
    * the no-caller-orphaned-cache discipline (CacheManager is private[sql]). */
  def sqlCacheIsEmpty(spark: SparkSession): Boolean =
    spark.sharedState.cacheManager.isEmpty
}
