package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** The PlanCost accumulator's failed-attempt rule (round 13,
  * PlanCost.scala): a stage attempt that completed WITH a failureReason
  * must not accumulate CPU/shuffle/stage-count — Spark re-runs the stage
  * and the successful attempt would otherwise be double-counted in
  * exactly the load-robust metrics the tool adjudicates with.
  *
  * The listener is driven with REAL StageCompleted events captured from
  * a small job, re-delivered once unmodified and once with a synthetic
  * failureReason — so the test exercises the production event shape
  * without depending on provoking a genuine stage retry in local mode.
  */
class PlanCostSpec extends SparkTestBase {

  private def capturedEvents(): Seq[SparkListenerStageCompleted] = {
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[SparkListenerStageCompleted]()
    val cap = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        buf.add(sc); ()
      }
    }
    spark.sparkContext.addSparkListener(cap)
    try {
      // a shuffle job → at least two stages with real task metrics
      spark.range(0, 1000, 1, 4).groupBy((org.apache.spark.sql.functions.col("id") % 7)
        .as("k")).count().collect()
      val deadline = System.nanoTime() + 30e9.toLong
      while (buf.size() < 2 && System.nanoTime() < deadline) Thread.sleep(50)
    } finally spark.sparkContext.removeSparkListener(cap)
    assert(buf.size() >= 2, "expected at least 2 completed stages from the shuffle job")
    scala.jdk.CollectionConverters.CollectionHasAsScala(buf).asScala.toSeq
  }

  test("a failed stage attempt does not accumulate; a successful one does") {
    val events = capturedEvents()
    val acc = new PlanCost.CostListener()
    events.foreach(acc.onStageCompleted)
    val (cpu1, sw1, sr1, st1) = (acc.cpu.get, acc.sw.get, acc.sr.get, acc.stages.get)
    assert(st1 === events.size.toLong, "every clean attempt must count")
    assert(cpu1 > 0L, "real task metrics must carry CPU time")

    // re-deliver every event flagged as a failed attempt: NOTHING may move
    events.foreach { e =>
      val prev = e.stageInfo.failureReason
      e.stageInfo.failureReason = Some("synthetic failure (PlanCostSpec)")
      try acc.onStageCompleted(e)
      finally e.stageInfo.failureReason = prev
    }
    assert((acc.cpu.get, acc.sw.get, acc.sr.get, acc.stages.get) === ((cpu1, sw1, sr1, st1)),
      "failed attempts must not accumulate CPU/shuffle/stages")

    // and a clean re-delivery accumulates again (the guard keys on the
    // event's failureReason alone, not on having seen the stage before)
    acc.onStageCompleted(events.head)
    assert(acc.stages.get === st1 + 1)
  }

  test("reset() zeroes all four accumulators") {
    val acc = new PlanCost.CostListener()
    capturedEvents().foreach(acc.onStageCompleted)
    assert(acc.stages.get > 0)
    acc.reset()
    assert((acc.cpu.get, acc.sw.get, acc.sr.get, acc.stages.get) === ((0L, 0L, 0L, 0L)))
  }
}
