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

  /** Wrap a batch DataFrame's computed rows as a STREAMING batch frame
    * (isStreaming = true) under a declared schema — what a V1
    * `Source.getBatch` must return (MicroBatchExecution asserts the
    * flag); the FileStreamSource idiom, crossed here because
    * `internalCreateDataFrame` is `private[sql]`. The declared schema
    * must be structurally identical to the frame's (positional
    * InternalRows; nullability may differ). */
  def streamingBatch(data: DataFrame,
                     schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val cs = data.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(data.queryExecution.toRdd, schema, isStreaming = true)
  }

  /** An empty streaming batch — the re-delivered-range answer when the
    * engine asks for (x, x] after a restart race. */
  def emptyStreamingBatch(spark: SparkSession,
                          schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(
      cs.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow],
      schema, isStreaming = true)
  }

  /** DataFrame over an already-analyzed logical plan (`Dataset.ofRows`
    * is `private[sql]`) — the execution seam for graft's planned
    * commands (e.g. the SQL INSERT rewrite). */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

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
