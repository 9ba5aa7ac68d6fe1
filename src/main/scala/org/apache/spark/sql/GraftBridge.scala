package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4's `Column` wraps a connect-compatible `ColumnNode`; the
  * classic-session converters live behind `private[sql]`, so this
  * shim (in the sql package, the standard extension-library pattern)
  * re-exports the two conversions custom expressions need.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Catalyst's size estimate (bytes) for a frame's optimized plan —
    * the same statistic JoinSelection consults when it auto-picks a
    * broadcast side. Exposed so operators can make the SAME call
    * adaptively (hint only when the estimate fits the threshold)
    * instead of forcing a broadcast hint that would OOM the driver
    * on a fact-sized input. */
  def sizeEstimate(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** The session's autoBroadcastJoinThreshold in bytes (-1 = off). */
  def broadcastThreshold(spark: SparkSession): Long =
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.conf.autoBroadcastJoinThreshold

  /** DataFrame from a custom LogicalPlan (the `Dataset.ofRows`
    * constructor is private[sql]) — needed to surface custom logical
    * nodes like graft's native as-of join through the public API. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
