package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression converters so graft's native
  * Catalyst expressions (e.g. graft.functions.FloatDot) can be exposed as
  * `Column`s. Public Spark API offers no stable constructor for a Column
  * from a raw Expression in 4.x; this shim is the single sanctioned
  * crossing point.
  */
object GraftSqlShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Rewrap a V1 streaming Sink.addBatch frame as a REPLAYABLE batch
    * DataFrame — the ForeachBatchSink idiom: materialize the micro-batch
    * through the incremental execution's toRdd once, then hang a plain
    * batch frame off that RDD so downstream writers can run their own
    * actions without re-executing (or being refused by) the streaming
    * plan. `internalCreateDataFrame` is `private[sql]`; this is the
    * sanctioned crossing point. */
  def replayableBatch(data: DataFrame): DataFrame = {
    val cs = data.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(
      data.queryExecution.toRdd, data.schema, isStreaming = false)
  }

  /** Register an Expression-backed SQL function on a live session (the
    * function registry is `private[sql]`). */
  def registerFunction(
      spark: SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
