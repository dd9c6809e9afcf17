package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into the `private[sql]` Column <-> Expression
  * converters, so graft's native Catalyst expressions (e.g.
  * graft.functions.SortedIntersectSize) can be exposed as ordinary
  * `Column`s. This is the conventional extension-library technique for
  * Spark 4 (the public `Column(expr)` constructor was removed when
  * Column moved to ColumnNode).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A DataFrame over an already-materialized internal-row RDD with NO
    * carried statistics/constraints — the reset [[graft.Ckpt]] applies
    * when a checkpoint's origin-plan size estimate has compounded past
    * any physical meaning (`internalCreateDataFrame` is `private[sql]`,
    * hence this bridge).
    */
  def internalFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)

  /** Register a function builder into an EXISTING session's registry
    * (same shape as SparkSessionExtensions.injectFunction, which only
    * applies at session construction).
    */
  def registerFunction(
      spark: SparkSession,
      fn: (org.apache.spark.sql.catalyst.FunctionIdentifier,
           org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
           Seq[Expression] => Expression)): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(fn._1, fn._2, fn._3)
}
