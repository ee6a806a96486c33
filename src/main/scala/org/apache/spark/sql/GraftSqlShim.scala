package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway graft needs: wrap a hand-built (already
  * resolved) logical plan back into a DataFrame. Lives in the
  * `org.apache.spark.sql` package solely for access to
  * `classic.Dataset.ofRows`; everything else in graft stays on public API.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Drain the listener bus so `observe()` metrics / SparkListener counters
    * registered by graft are visible before a snapshot is read.
    * `SparkContext.listenerBus` is `private[spark]`; this package sits inside
    * that scope, keeping callers (Bench, specs) on graft-visible API only.
    */
  def waitListenerBusEmpty(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
