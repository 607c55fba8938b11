package graft

import graft.jobs.VwapJob
import org.scalactic.Tolerance._

/** Golden parity of the VWAP simulator (allocation + carry + fees,
  * including the reference's head-clustering bucket pick) against
  * `/root/reference/data/ETH_bybit_L2_60s_impact_vwap_summary.csv`:
  * `mmt-impact-vwap --side buy --target-qty 50 --slices 24 --depth 25
  * --fee-bps 5 --proxy topk_sum`.
  */
class VwapGoldenSpec extends SparkTestBase {

  test("summary matches the reference's committed vwap summary") {
    val s = VwapJob.run(spark, "/root/reference/data/ETH_bybit_L2_60s.parquet",
      side = "buy", targetQty = 50.0, nSlices = 24, depthK = 25, feeBps = 5.0)
    assert(s.filled_qty === 49.999999999999964 +- 1e-9)
    assert(s.vwap === 4306.75333105333 +- 1e-6)
    assert(s.notional === 215337.66655266634 +- 1e-4)
    assert(s.fees_paid === 107.61502576345148 +- 1e-6)
    assert(s.slippage_bps_vs_mid_open === 5.478890885547198 +- 1e-6)
    assert(s.slippage_bps_vs_mid_close === 0.5534197682571698 +- 1e-6)
    assert(s.slices === 24 && s.depth_k === 25 && s.proxy === "topk_sum")
  }

  test("csv input path produces the same summary (readAny string columns)") {
    // round-trip the recording through CSV: readAny returns all-string
    // columns there, exercising the cast-before-collect path
    val tmp = java.nio.file.Files.createTempDirectory("vwap-csv").toString
    val csvPath = s"$tmp/book.csv"
    spark.read.parquet("/root/reference/data/ETH_bybit_L2_60s.parquet")
      .coalesce(1)
      .write.option("header", "true").option("emptyValue", "").csv(csvPath)
    val s = VwapJob.run(spark, csvPath,
      side = "buy", targetQty = 50.0, nSlices = 24, depthK = 25, feeBps = 5.0)
    assert(s.vwap === 4306.75333105333 +- 1e-6)
    assert(s.notional === 215337.66655266634 +- 1e-4)
    assert(s.fees_paid === 107.61502576345148 +- 1e-6)
  }
}
