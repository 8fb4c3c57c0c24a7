package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters — needed
  * to wrap custom Catalyst expressions (StaticInvoke kernels) into
  * public Columns on Spark 4's column-node API.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** A clone sharing the SparkContext and (copied) session state —
    * the public-API way to run one action under a locally-modified
    * SQL conf without flipping the caller's session-global flags
    * (structured streaming runs every micro-batch on one).
    */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()

  /** Re-bind an (analyzed) DataFrame onto another session of the same
    * SparkContext — used with [[cloneSession]] to execute a plan under
    * per-operation conf overrides.
    */
  def rebind(spark: SparkSession, df: DataFrame): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession],
      df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed)

  /** Re-wrap a batch DataFrame's physical plan as a STREAMING
    * DataFrame (isStreaming = true) — what a V1 streaming `Source`
    * must return from getBatch (MicroBatchExecution asserts it). The
    * plan is not executed here; `toRdd` only plans, the streaming
    * batch triggers execution.
    */
  def asStreaming(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.asInstanceOf[classic.Dataset[Row]].queryExecution.toRdd,
      df.schema, isStreaming = true)
  }

  /** The inverse, for a V1 streaming `Sink.addBatch`: re-wrap the
    * micro-batch's incremental execution as a plain BATCH DataFrame so
    * ordinary writers can plan actions over it (the ForeachBatchSink
    * pattern — addBatch's df carries streaming lineage a batch writer
    * would refuse).
    */
  def asBatch(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.asInstanceOf[classic.Dataset[Row]].queryExecution.toRdd,
      df.schema, isStreaming = false)
  }
}
