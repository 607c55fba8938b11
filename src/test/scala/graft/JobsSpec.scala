package graft

import graft.jobs.{MetricsJob, PlotSeriesJob, TwapJob}
import graft.streaming.Recorder
import org.apache.spark.sql.functions._
import org.scalactic.Tolerance._
import java.nio.file.Files

/** Entry-point analogs without committed goldens: property/consistency
  * checks on the reference's own recordings.
  */
class JobsSpec extends SparkTestBase {

  private val fixture = "/root/reference/data/ETH_bybit_L2_60s.parquet"

  test("PlotSeriesJob emits the full plot-ready frame bundle") {
    val f = PlotSeriesJob.run(spark, fixture, depth = 10, tailN = 10)
    assert(f.series.count() === 60)
    assert(f.series.columns.toSet.contains("ofi_ntl_k_cum"))
    assert(f.depthCurve.count() === 20) // 10 levels × 2 sides
    assert(f.tail.count() === 10)
    val histN = f.spreadHist.agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    assert(histN === 60)
  }

  test("MetricsJob default mode shuffles by key and matches per-symbol golden runs") {
    val dir = Files.createTempDirectory("mj-multi").toString
    Recorder.synthesizeBook(spark.range(400).toDF("value"), depth = 5)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/book.parquet")
    val out = MetricsJob.run(spark, s"$dir/book.parquet", depth = 5, rvWindow = 5)
    // the window stage must hash-partition on the keys (not coalesce(1))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning") && plan.contains("symbol"),
      s"expected key-partitioned window exchange, got:\n${plan.take(800)}")
    // each symbol's series equals its single-series golden-mode run
    val byAll = out.collect().groupBy(r => r.getString(r.fieldIndex("symbol")))
    for (sym <- Seq("SYN0", "SYN1")) {
      spark.read.parquet(s"$dir/book.parquet").filter(col("symbol") === sym)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$sym.parquet")
      val golden = MetricsJob.run(spark, s"$dir/$sym.parquet",
        depth = 5, rvWindow = 5, golden = true).collect()
      assert(byAll(sym).length === golden.length)
      byAll(sym).zip(golden).foreach { case (a, b) =>
        assert(a.toSeq === b.toSeq, s"row mismatch for $sym")
      }
    }
  }

  test("TwapJob: fees worsen vwap; allow_residual is a no-op; filled ≤ target") {
    val noFee = TwapJob.run(spark, fixture, "buy", 50.0, 20, 10, feeBps = 0.0)
    val fee = TwapJob.run(spark, fixture, "buy", 50.0, 20, 10, feeBps = 5.0)
    assert(noFee.summary.filled_qty <= 50.0 + 1e-9)
    assert(fee.summary.vwap > noFee.summary.vwap)
    assert(fee.summary.vwap === noFee.summary.vwap * 1.0005 +- 1e-6)
    val resid = TwapJob.run(spark, fixture, "buy", 50.0, 20, 10, feeBps = 5.0,
      allowResidual = true)
    assert(resid.summary.filled_qty === fee.summary.filled_qty)
    assert(resid.summary.vwap === fee.summary.vwap)
  }

  test("TwapJob and ImpactJob produce identical summaries from CSV input") {
    val tmp = Files.createTempDirectory("jobs-csv").toString
    val csvPath = s"$tmp/book.csv"
    spark.read.parquet(fixture).coalesce(1)
      .write.option("header", "true").option("emptyValue", "").csv(csvPath)
    val tp = TwapJob.run(spark, fixture, "buy", 50.0, 20, 10, feeBps = 5.0)
    val tc = TwapJob.run(spark, csvPath, "buy", 50.0, 20, 10, feeBps = 5.0)
    assert(tc.summary.vwap === tp.summary.vwap +- 1e-9)
    assert(tc.summary.filled_qty === tp.summary.filled_qty +- 1e-9)
    val ip = graft.jobs.ImpactJob.run(spark, fixture, "buy", 40.0, 12, 10)
    val ic = graft.jobs.ImpactJob.run(spark, csvPath, "buy", 40.0, 12, 10)
    val (rp, rc) = (ip.summary.collect()(0), ic.summary.collect()(0))
    Seq("filled_qty", "vwap", "notional").foreach { c =>
      assert(math.abs(rc.getAs[Double](c) - rp.getAs[Double](c)) < 1e-9, c)
    }
  }

  test("TwapJob stochastic schedule: sizes sum to target, all positive, seed-stable") {
    val s1 = TwapJob.sliceSizes("stochastic", 50.0, 20, seed = 7L)
    val s2 = TwapJob.sliceSizes("stochastic", 50.0, 20, seed = 7L)
    assert(s1 === s2)
    assert(s1.sum === 50.0 +- 1e-9)
    assert(s1.forall(_ > 0))
    val s3 = TwapJob.sliceSizes("stochastic", 50.0, 20, seed = 8L)
    assert(s1 != s3)
  }
}
