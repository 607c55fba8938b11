package org.apache.spark

/** graft's one private[spark] reach-in, measurement-tooling only:
  * [[graft.PlanCost]] must drain the async listener bus before reading or
  * resetting its counters — SparkListener events are delivered on a
  * background queue, so a stage-completed event from query N's run can
  * otherwise land after the reset and bleed its CPU/shuffle into query
  * N+1's totals in a batched sweep.
  */
object GraftListenerSync {
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(30000L)
    catch { case _: java.util.concurrent.TimeoutException =>
      System.err.println("[plancost] WARNING: listener bus not drained " +
        "after 30 s; counters may bleed across queries")
    }
}
