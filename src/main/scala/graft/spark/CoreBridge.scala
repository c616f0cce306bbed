package org.apache.spark

/** Bridge into `private[spark]` core surface (same technique as
  * [[org.apache.spark.sql.GraftSqlBridge]]): the shuffle-volume audit in
  * `graft.PlanAudit` counts records through a `SparkListener`, and listener
  * events are posted asynchronously — a measurement read before the bus
  * drains undercounts. `LiveListenerBus.waitUntilEmpty()` is the canonical
  * barrier (Spark's own test harness uses it) but is `private[spark]`.
  */
object GraftCoreBridge {
  /** Block until every queued listener event has been delivered. */
  def drainListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
