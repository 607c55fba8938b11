package graft.jobs

import graft.book.{BookMetrics, SeriesMetrics}
import graft.io.BookIO
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** mmt-event-metrics analog (`event_metrics.py:30-115`): adds
  * mid, spread_bps, microprice (mid-fallback flavor), event-time Kyle OFI,
  * log return of mid, and rv_event_<W> — the event-time flavor bundle
  * (SURVEY §7.4.1-3: these deliberately differ from the mmt-metrics
  * flavors).
  *
  * Reference quirks replicated:
  *   - missing `bid1_size`/`ask1_size` columns are created as 0.0
  *     (`event_metrics.py:60-63`);
  *   - OFI uses BEST quotes with sizes coerced to 0; only a missing PREV
  *     makes both tie-indicators true; first row forced 0.0;
  *   - ret_mid = ln(mid_t) − ln(mid_{t−1}) (difference of logs, not log
  *     of ratio — a different FP rounding than metrics.py's flavor);
  *   - rv window uses pandas' default min_periods = window.
  */
object EventMetricsJob {

  def run(spark: SparkSession, inPath: String, rvWindow: Int = 20,
          partitionKeys: Seq[String] = Seq("exchange_id", "symbol"),
          golden: Boolean = false): DataFrame = {
    var raw = BookIO.readAny(spark, inPath)
    for (c <- Seq("bid1_size", "ask1_size"))
      if (!raw.columns.contains(c)) raw = raw.withColumn(c, lit(0.0))
    val baseCols = raw.columns.toSeq

    def d(name: String): Column = col(name).cast("double")
    val bb = d("best_bid"); val ba = d("best_ask")
    val qb = coalesce(d("bid1_size"), lit(0.0))
    val qa = coalesce(d("ask1_size"), lit(0.0))

    // golden: single-series parity; default: per-key event-time windows
    // (keys missing from the input degrade to the single-series mode)
    val keys = if (golden) Seq.empty[String] else partitionKeys.filter(raw.columns.contains)
    val ordered =
      (if (golden) raw.coalesce(1) else raw).withColumn("_rid", monotonically_increasing_id())
    val ord = Seq(col("ts_ms").cast("long"), col("_rid"))
    val w = if (keys.isEmpty) Window.orderBy("_rid")
            else Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)

    val mid = (bb + ba) / 2.0
    val spreadBps = when(bb > 0 && ba > 0, (ba - bb) / mid * lit(1e4))
    val micro = BookMetrics.micropriceEvent(bb, ba, d("bid1_size"), d("ask1_size"))
    val ofi = SeriesMetrics.ofiEvent(w, bb, qb, ba, qa)
    val retMid = log(mid) - lag(log(mid), 1).over(w)
    val frame = w.rowsBetween(-(rvWindow - 1), Window.currentRow)

    val out = ordered
      .withColumn("mid", mid)
      .withColumn("spread_bps", spreadBps)
      .withColumn("microprice", micro)
      .withColumn("ofi_l1", ofi)
      .withColumn("ret_mid", retMid)
      .withColumn(s"rv_event_$rvWindow",
        when(count(col("ret_mid")).over(frame) === rvWindow,
          sum(col("ret_mid") * col("ret_mid")).over(frame)))
    val sorted = if (keys.isEmpty) out.orderBy("_rid")
                 else out.orderBy(keys.map(col) ++ ord: _*)
    sorted.select((baseCols ++ Seq("mid", "spread_bps", "microprice", "ofi_l1", "ret_mid",
      s"rv_event_$rvWindow")).map(col): _*)
  }
}
