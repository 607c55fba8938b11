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
  * Partitioning: the default treats the input as many series keyed by
  * `partitionKeys` (windows partition on them, ordered by event time) —
  * the shape that scales to a 1000-executor cluster. `golden = true`
  * reproduces the reference's one-file-=-one-series mode exactly
  * (coalesce(1) + a single unpartitioned window, byte-parity with the
  * committed `_metrics.csv`) and is only right for per-file recordings.
  */
object MetricsJob {

  def run(spark: SparkSession, inPath: String, depth: Int, rvWindow: Int,
          partitionKeys: Seq[String] = Seq("exchange_id", "symbol"),
          golden: Boolean = false): DataFrame = {
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

    // golden: one file = one ordered series (single window, stable row id);
    // default: per-key windows ordered by event time, _rid as tiebreak.
    // Keys missing from the input (older schemas) degrade to the
    // reference's one-file-=-one-series semantics.
    val keys = if (golden) Seq.empty[String] else partitionKeys.filter(raw.columns.contains)
    val ordered =
      (if (golden) raw.coalesce(1) else raw).withColumn("_rid", monotonically_increasing_id())
    val ord = Seq(col("ts_ms").cast("long"), col("_rid"))
    val w = if (keys.isEmpty) Window.orderBy("_rid")
            else Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // RV on the formatted mid (≡ round(mid, 10)), log returns, reset-on-gap
    val midR = round(BookMetrics.mid(bb, ba), 10)
    val prev = lag(midR, 1).over(w)
    val ret = when(midR.isNotNull && prev.isNotNull && midR > 0 && prev > 0,
      graft.book.SeriesMetrics.logReturn(midR, w))
    val enriched = ordered
      .withColumn("_ret", ret)
      .withColumn("_gap", count(when(col("_ret").isNull, lit(1))).over(wRun))
    val gw = if (keys.isEmpty) Window.partitionBy("_gap").orderBy("_rid")
             else Window.partitionBy((keys :+ "_gap").map(col): _*).orderBy(ord: _*)
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
    val sorted = if (keys.isEmpty) out.orderBy("_rid")
                 else out.orderBy(keys.map(col) ++ ord: _*)
    sorted.select((baseCols ++ addCols).map(col): _*)
  }

  /** CLI-shaped entry point mirroring the reference's metrics writer
    * (`metrics_cli.py:60-66`): compute, then persist parquet with the
    * reference's CSV fallback chain. Returns the path actually written
    * (callers dispatch later reads via [[BookIO.readAny]]).
    */
  def runAndSave(spark: SparkSession, inPath: String, outPath: String,
                 depth: Int, rvWindow: Int,
                 partitionKeys: Seq[String] = Seq("exchange_id", "symbol"),
                 golden: Boolean = false): String =
    BookIO.writeAnyWithFallback(
      run(spark, inPath, depth, rvWindow, partitionKeys, golden), outPath)
}
