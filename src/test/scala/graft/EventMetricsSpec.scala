package graft

import graft.jobs.EventMetricsJob
import org.apache.spark.sql.functions._
import org.scalactic.Tolerance._
import java.nio.file.Files

/** Event-time flavor bundle vs the reference's hand-recomputable frame
  * (`tests/test_event_metrics.py:16-54`, FIXTURES.md §F2):
  * bb: 100.0 100.5 100.5 100.4 100.6 / ba: 100.2 100.6 100.6 100.5 100.7
  * qb: 10 12 8 9 11 / qa: 9 7 7.5 8 7.
  */
class EventMetricsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val outRows = {
    val df = Seq(
      (1L, 100.0, 100.2, 10.0, 9.0),
      (2L, 100.5, 100.6, 12.0, 7.0),
      (3L, 100.5, 100.6, 8.0, 7.5),
      (4L, 100.4, 100.5, 9.0, 8.0),
      (5L, 100.6, 100.7, 11.0, 7.0))
      .toDF("ts_ms", "best_bid", "best_ask", "bid1_size", "ask1_size")
    val dir = Files.createTempDirectory("event-in")
    df.coalesce(1).write.mode("overwrite").parquet(dir.toString + "/in.parquet")
    EventMetricsJob.run(spark, dir.toString + "/in.parquet", rvWindow = 3)
      .orderBy("ts_ms").collect()
  }

  private def dbl(i: Int, name: String): Double =
    outRows(i).getDouble(outRows(i).fieldIndex(name))

  test("mid / spread_bps / microprice match pandas formulas") {
    assert(dbl(0, "mid") === 100.1 +- 1e-12)
    assert(dbl(0, "spread_bps") === ((100.2 - 100.0) / 100.1 * 1e4) +- 1e-9)
    // microprice row 1: (ba*qb + bb*qa)/(qb+qa)
    assert(dbl(0, "microprice") === ((100.2 * 10 + 100.0 * 9) / 19.0) +- 1e-9)
  }

  test("Kyle OFI: first row 0, then hand-computed ±") {
    assert(dbl(0, "ofi_l1") === 0.0)
    assert(dbl(1, "ofi_l1") === 21.0 +- 1e-9)  // dB=12, dA=-9
    assert(dbl(2, "ofi_l1") === -4.5 +- 1e-9)  // ties count both: dB=-4, dA=0.5
    assert(dbl(3, "ofi_l1") === -16.0 +- 1e-9) // dB=-8, dA=8
    assert(dbl(4, "ofi_l1") === 19.0 +- 1e-9)  // dB=11, dA=-8
  }

  test("ret_mid and rv_event_3 (min_periods = window)") {
    val mids = Seq(100.1, 100.55, 100.55, 100.45, 100.65)
    val rets = mids.sliding(2).map { case Seq(a, b) => math.log(b) - math.log(a) }.toSeq
    assert(outRows(0).isNullAt(outRows(0).fieldIndex("ret_mid")))
    assert(dbl(1, "ret_mid") === rets(0) +- 1e-12)
    // rv needs 3 returns → first defined at row 4 (0-based 3)
    assert(outRows(2).isNullAt(outRows(2).fieldIndex("rv_event_3")))
    assert(dbl(3, "rv_event_3") === rets.take(3).map(r => r * r).sum +- 1e-12)
    assert(dbl(4, "rv_event_3") === rets.drop(1).map(r => r * r).sum +- 1e-12)
  }
}
