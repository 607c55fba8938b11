package graft

import graft.jobs.ImpactJob
import org.scalactic.Tolerance._

/** Golden parity of the TWAP simulator against the reference's committed
  * run (`/root/reference/impact/ETH_bybit_L2_60s_buy_twap_s20_q50_d25/`):
  * `mmt-impact --side buy --qty 50 --twap-slices 20 --depth 25` on the
  * 60-row depth-100 recording. Expected values from summary.csv /
  * slices.csv (float accumulation order differs from pandas, so compared
  * at 1e-9 relative — the CSVs carry ~16 digits).
  */
class ImpactGoldenSpec extends SparkTestBase {

  private lazy val res = ImpactJob.run(spark,
    "/root/reference/data/ETH_bybit_L2_60s.parquet",
    side = "buy", totalQty = 50.0, nSlices = 20, depth = 25)

  test("summary matches the reference's committed summary.csv") {
    val r = res.summary.collect()(0)
    def d(c: String) = r.getDouble(r.fieldIndex(c))
    assert(r.getString(r.fieldIndex("side")) === "buy")
    assert(d("target_qty") === 50.0)
    assert(d("filled_qty") === 49.99999999999999 +- 1e-9)
    assert(d("vwap") === 4301.466768000002 +- 1e-6)
    assert(d("notional") === 215073.33840000007 +- 1e-4)
    assert(d("slippage_bps_vs_mid_open") === -6.802888675407903 +- 1e-6)
    assert(d("slippage_bps_vs_mid_close") === 1.073628140404459 +- 1e-6)
    assert(r.getInt(r.fieldIndex("slices")) === 20)
  }

  test("per-slice rows match the reference's slices.csv head") {
    val rows = res.slices.collect()
    assert(rows.length === 20)
    def d(i: Int, c: String) = rows(i).getDouble(rows(i).fieldIndex(c))
    // slice 1: filled 2.5 @ 4304.4, 1 level; slice 3: 4305.26376, 6 levels
    assert(d(0, "filled_qty") === 2.5 +- 1e-12)
    assert(d(0, "slice_vwap") === 4304.4 +- 1e-9)
    assert(rows(0).getInt(rows(0).fieldIndex("levels_touched")) === 1)
    assert(d(2, "slice_vwap") === 4305.26376 +- 1e-9)
    assert(rows(2).getInt(rows(2).fieldIndex("levels_touched")) === 6)
    assert(rows(0).getLong(rows(0).fieldIndex("ts_ms")) === 1755510828273L)
  }
}
