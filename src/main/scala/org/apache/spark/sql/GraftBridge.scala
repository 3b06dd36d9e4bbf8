package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the sql-private Column↔Expression converters (Spark 4
  * moved them behind `private[sql]` in the classic/Connect split).
  * This is the sanctioned extension-library pattern: a single shim
  * compiled into the org.apache.spark.sql namespace, everything else
  * stays in graft.*.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def logicalPlan(df: Dataset[Row]): catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  def ofRows(spark: SparkSession,
      plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Re-wrap a DataFrame as a one-node LogicalRDD plan over its own
    * (lazy) internal-row RDD — the lineage-truncation half of
    * `localCheckpoint`, without the eager materialization job and
    * without `df.rdd`'s InternalRow↔Row round-trip. Unlike
    * `createDataFrame(df.rdd, schema)`, `LogicalRDD.fromDataset`
    * also carries the origin's statistics forward, so joins against
    * the wrapped frame can still plan broadcast when it is small.
    * Used by iterative drivers (connected components) that must stop
    * the logical plan growing across rounds. */
  def rewrapInternal(df: Dataset[Row]): DataFrame = {
    val cd = df.asInstanceOf[classic.Dataset[Row]]
    classic.Dataset.ofRows(cd.sparkSession,
      execution.LogicalRDD.fromDataset(
        cd.queryExecution.toRdd, cd, isStreaming = false))
  }

  /** Block until queued listener-bus events have been delivered —
    * measurement-tool support (tools.JobStats), never a query path. */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
