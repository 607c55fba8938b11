package graft

import graft.jobs.MetricsJob
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Byte-parity of the metrics-enrichment pipeline against the reference's
  * own committed output (SURVEY.md §7.2 minimum slice):
  * `data/ws_bybit_ETHUSDTUSDT_d5_5s_5hz.csv` → `..._metrics.csv`
  * (depth 5, rv_window 20 — `metrics_cli.py:169`).
  */
class GoldenParitySpec extends SparkTestBase {

  private val in = "/root/reference/data/ws_bybit_ETHUSDTUSDT_d5_5s_5hz.csv"
  private val golden = "/root/reference/data/ws_bybit_ETHUSDTUSDT_d5_5s_5hz_metrics.csv"

  test("MetricsJob matches the reference golden metrics CSV byte-for-byte") {
    val out = MetricsJob.run(spark, in, depth = 5, rvWindow = 20, golden = true)
    val tmp = Files.createTempDirectory("golden").toString
    graft.io.BookIO.writeGoldenCsv(out.coalesce(1), tmp)
    val part = Files.list(Paths.get(tmp)).iterator().asScala
      .find(_.getFileName.toString.endsWith(".csv")).get
    val got = Files.readAllLines(part).asScala.toVector
    val exp = Files.readAllLines(Paths.get(golden)).asScala.toVector
    assert(got.length === exp.length, "row count")
    assert(got.head === exp.head, "header")
    got.zip(exp).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g === e, s"line ${i + 1} differs")
    }
  }

  // NOTE: the repo's second pair (BTCUSDT_swap_demo_20s_metrics.csv) was
  // produced by an OLDER reference version that only emitted
  // spread/mid/imbalance_l1/imbalance_k — not a valid target for the
  // current metric set. The older-schema tolerance (4 meta cols) is still
  // covered: MetricsJob reads that file fine.
  test("older 4-meta-col schema input is accepted (BTCUSDT_swap_demo)") {
    val out = MetricsJob.run(spark, "/root/reference/data/BTCUSDT_swap_demo_20s.csv",
      depth = 10, rvWindow = 20)
    assert(out.count() === 20)
    assert(out.columns.contains("ofi_l1") && out.columns.contains("ts_ms"))
  }
}
