package graft.jobs

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** mmt-impact-vwap analog (`impact_vwap.py:247-377`): proxy-weighted
  * allocation + sequential carry-forward execution with fees.
  *
  * Reference quirks replicated EXACTLY (SURVEY §7.4.4/7):
  *   - the bucket pick `round(i · slices/n)[:slices]` clusters picks at
  *     the head of the file (half-even rounding ≡ `math.rint`), with
  *     repeated rows;
  *   - allocation ∝ max(0, top-K passive-side size sum), equal fallback,
  *     FP drift absorbed by the FIRST largest bucket;
  *   - `_fill_slice` walks `take = min(remain, avail)` with NO negative
  *     clamp, counts only take>0 levels, NaN vwap on zero fill;
  *   - fees fold INTO the running notional (so the summary vwap includes
  *     fees), fee_total tracked separately;
  *   - carry = max(0, desired − filled).
  *
  * The slice loop is the one genuinely sequential scan (X5): ≤ slices
  * rows are collected and folded on the driver in the reference's exact
  * operation order (`SURVEY §7.3`); the distributed generalization is the
  * flatMapGroups fold in `impact.ImpactQueries` (q26).
  */
object VwapJob {

  case class Summary(side: String, target_qty: Double, filled_qty: Double,
                     vwap: Double, notional: Double, fees_paid: Double,
                     slippage_bps_vs_mid_open: Double, slippage_bps_vs_mid_close: Double,
                     slices: Int, depth_k: Int, proxy: String)

  def run(spark: SparkSession, inPath: String, side: String, targetQty: Double,
          nSlices: Int, depthK: Int, feeBps: Double, proxy: String = "topk_sum"): Summary = {
    val raw = graft.io.BookIO.readAny(spark, inPath)
      .coalesce(1).withColumn("_rid", monotonically_increasing_id())
    val n = raw.count().toInt

    // bucket pick with the reference's head-clustering behavior
    val scale = nSlices.toDouble / n
    var idx = (0 until n).map(i => math.rint(i * scale).toInt)
      .map(v => math.max(0, math.min(n - 1, v))).toList
    while (idx.length < nSlices) idx = idx :+ (n - 1)
    idx = idx.take(nSlices)

    val bookSide = if (side == "buy") "ask" else "bid"
    // cast numerics so CSV inputs (all-string via readAny) work like parquet
    val numCols = Seq("best_bid", "best_ask") ++
      (1 to depthK).flatMap(k => Seq(s"$bookSide${k}_price", s"$bookSide${k}_size"))
    val rows: Map[Long, Row] = raw
      .filter(col("_rid").isin(idx.map(_.toLong).distinct: _*))
      .select(col("_rid") +: col("ts_ms") +: numCols.map(c => col(c).cast("double").as(c)): _*)
      .collect().map(r => r.getLong(0) -> r).toMap

    // size<=0 levels dropped, mirroring _extract_side_levels (impact_vwap.py:126-127)
    def ladder(r: Row): Seq[(Double, Double)] =
      (1 to depthK).flatMap { k =>
        val pi = r.fieldIndex(s"$bookSide${k}_price"); val si = r.fieldIndex(s"$bookSide${k}_size")
        if (r.isNullAt(pi) || r.isNullAt(si) || r.getDouble(si) <= 0) None
        else Some((r.getDouble(pi), r.getDouble(si)))
      }
    def midOf(r: Row): Option[Double] = {
      val bi = r.fieldIndex("best_bid"); val ai = r.fieldIndex("best_ask")
      if (r.isNullAt(bi) || r.isNullAt(ai)) None
      else Some((r.getDouble(bi) + r.getDouble(ai)) / 2.0)
    }

    // allocation ∝ proxy (left-fold sums, first-max drift absorption)
    val proxies = idx.map { i =>
      val lv = ladder(rows(i))
      val p = if (lv.isEmpty) 0.0
      else if (proxy == "l1_sum") lv.head._2
      else lv.map(_._2).sum
      math.max(0.0, p)
    }
    val totalProxy = proxies.sum
    var sizes: Array[Double] =
      if (totalProxy <= 0) Array.fill(nSlices)(targetQty / nSlices)
      else proxies.map(w => targetQty * (w / totalProxy)).toArray
    val err = targetQty - sizes.sum
    if (math.abs(err) > 1e-9) {
      val j = sizes.indices.maxBy(k => sizes(k)) // first max, like Python max()
      sizes(j) += err
    }

    // sequential carry loop, fees folded into notional (impact_vwap.py:289-352)
    var filledTotal = 0.0; var notionalTotal = 0.0; var feeTotal = 0.0; var carry = 0.0
    val midOpen = midOf(rows(idx.head))
    val midClose = midOf(rows(idx.last))
    for ((rowI, target) <- idx.zip(sizes)) {
      val desired = target + carry
      var remain = desired; var cost = 0.0; var touched = 0
      val lv = ladder(rows(rowI))
      if (desired > 0 && lv.nonEmpty) {
        for ((px, avail) <- lv if remain > 0) {
          val take = math.min(remain, avail)
          cost += take * px
          remain -= take
          if (take > 0) touched += 1
        }
      } else remain = desired
      val filled = if (desired > 0 && lv.nonEmpty) desired - remain else 0.0
      val vwapSlice = if (filled > 0) cost / filled else Double.NaN
      val notional = if (java.lang.Double.isFinite(vwapSlice)) filled * vwapSlice else 0.0
      val fee = math.abs(notional) * (feeBps / 10000.0)
      val withFee = if (side == "buy") notional + fee else notional - fee
      filledTotal += filled
      notionalTotal += withFee
      feeTotal += fee
      carry = math.max(0.0, desired - filled)
    }
    val vwapAll = if (filledTotal > 0) notionalTotal / filledTotal else Double.NaN
    def slip(ref: Option[Double]): Double = ref match {
      case Some(m) if java.lang.Double.isFinite(vwapAll) =>
        val signed = (vwapAll - m) / m * 10000.0
        if (side == "buy") signed else -signed
      case _ => Double.NaN
    }
    Summary(side, targetQty, filledTotal, vwapAll, notionalTotal, feeTotal,
      slip(midOpen), slip(midClose), nSlices, depthK, proxy)
  }
}
