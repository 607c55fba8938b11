package graft.jobs

import graft.book.BookMetrics
import graft.io.BookIO
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** mmt-metrics analog (SURVEY.md §3.1, `metrics_cli.py:88-162`): enrich a
  * flat recording with the 9 row metrics + rolling reset-on-gap RV +
  * strict L1 OFI, all 10-dp formatted, preserving the input columns
  * verbatim — byte-parity with the reference's committed `_metrics.csv`
  * outputs.
  *
  * Reference quirks replicated deliberately:
  *   - RV is computed from the FORMATTED mid (`metrics_cli.py:124-126`
  *     reads back the 10-dp strings) ≡ `round(mid, 10)` here;
  *   - RV uses log returns with reset-on-gap (`metrics.py:196-232`);
  *   - OFI is the strict flavor with NULL poisoning (`metrics.py:293-333`);
  *   - first-row OFI is "" and rows during RV warmup are "".
  *
  * The reference processes one file = one series; parity mode therefore
  * uses a single unpartitioned window (fine for per-file recordings). At
  * scale, partition by (exchange_id, symbol) as BookQueries does.
  */
object MetricsJob {

  def run(spark: SparkSession, inPath: String, depth: Int, rvWindow: Int): DataFrame = {
    val raw = BookIO.readAny(spark, inPath)
    val baseCols = raw.columns.toSeq

    def d(name: String): Column = col(name).cast("double")
    val bb = d("best_bid"); val ba = d("best_ask")
    val qb = d("bid1_size"); val qa = d("ask1_size")
    def levels(side: String) =
      (1 to depth).map(k => (d(s"$side${k}_price"), d(s"$side${k}_size")))

    val metrics: Seq[(String, Column)] = Seq(
      "spread" -> BookMetrics.spread(bb, ba),
      "mid" -> BookMetrics.mid(bb, ba),
      "relative_spread_bps" -> BookMetrics.relSpreadBpsStrict(bb, ba),
      "microprice" -> BookMetrics.microprice(bb, ba, qb, qa),
      "microprice_imbalance_bps" -> BookMetrics.micropriceImbalanceBps(bb, ba, qb, qa),
      "imbalance_l1" -> BookMetrics.imbalanceL1(qb, qa),
      "imbalance_k" -> BookMetrics.imbalanceDepthK(levels("bid").map(_._2), levels("ask").map(_._2)),
      "notional_bid_k" -> BookMetrics.notionalDepth(levels("bid")),
      "notional_ask_k" -> BookMetrics.notionalDepth(levels("ask")))

    // one file = one ordered series; single window, stable row id
    val ordered = raw.coalesce(1).withColumn("_rid", monotonically_increasing_id())
    val w = Window.orderBy("_rid")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // RV on the formatted mid (≡ round(mid, 10)), log returns, reset-on-gap
    val midR = round(BookMetrics.mid(bb, ba), 10)
    val prev = lag(midR, 1).over(w)
    val ret = when(midR.isNotNull && prev.isNotNull && midR > 0 && prev > 0,
      graft.book.SeriesMetrics.logReturn(midR, w))
    val enriched = ordered
      .withColumn("_ret", ret)
      .withColumn("_gap", count(when(col("_ret").isNull, lit(1))).over(wRun))
    val gw = Window.partitionBy("_gap").orderBy("_rid")
    val frame = gw.rowsBetween(-(rvWindow - 1), Window.currentRow)
    val rv = when(col("_ret").isNotNull && count(col("_ret")).over(frame) === rvWindow,
      sum((col("_ret") * col("_ret")).cast(DecimalType(38, 30))).over(frame).cast("double"))

    val ofi = graft.book.SeriesMetrics.ofiL1Strict(w,
      d("bid1_price"), d("bid1_size"), d("ask1_price"), d("ask1_size"))

    val out = enriched
      .withColumns(metrics.map { case (n, c) => n -> BookIO.fmt10(c) }.toMap)
      .withColumn("rv_window", lit(rvWindow))
      .withColumn("rv", BookIO.fmt10(rv))
      .withColumn("ofi_l1", BookIO.fmt10(ofi))
    val addCols = metrics.map(_._1) ++ Seq("rv_window", "rv", "ofi_l1")
    out.orderBy("_rid").select((baseCols ++ addCols).map(col): _*)
  }
}
