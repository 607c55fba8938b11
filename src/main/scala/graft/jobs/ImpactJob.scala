package graft.jobs

import graft.impact.Impact
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** mmt-impact analog (`impact.py:230-321`): naive TWAP — equal slices at
  * evenly spaced rows (numpy-linspace pick, half-even rounding ≡
  * `math.rint`), skip-blank ladder walk per slice, run summary with the
  * buy/sell slippage conventions of `simulate_twap`.
  *
  * Scheduling indices are computed on the driver (≤ slices values —
  * `SURVEY.md §3.3`); everything else is a DataFrame program. The walk is
  * [[Impact.walkLayers]]; per-slice and summary frames mirror the
  * reference's `slices.csv` / `summary.csv` outputs (golden-tested).
  */
object ImpactJob {

  case class Result(slices: DataFrame, summary: DataFrame)

  def run(spark: SparkSession, inPath: String, side: String, totalQty: Double,
          nSlices: Int, depth: Int): Result = {
    val raw = graft.io.BookIO.readAny(spark, inPath)
      .coalesce(1).withColumn("_rid", monotonically_increasing_id())
    val n = raw.count()

    // _slice_indices_by_time (impact.py:196-224): linspace over positions,
    // rounded half-even, dedup + sort
    val picks: Seq[Long] =
      if (n == 0) Seq()
      else if (nSlices <= 1) Seq(n - 1)
      else (0 until nSlices)
        .map(i => math.rint(i.toDouble * (n - 1) / (nSlices - 1)).toLong)
        .distinct.sorted
    val sliceQty = totalQty / picks.length

    val bookSide = if (side == "buy") "ask" else "bid"
    val walked = Impact.walkLayers(
      raw.filter(col("_rid").isin(picks: _*)), bookSide, lit(sliceQty), depth)
      .withColumn("slice",
        row_number().over(Window.orderBy("_rid")).cast("long"))
      .withColumn("mid", {
        // _mid_from_row (impact.py:166-180): prefer a precomputed `mid`
        // column (metrics-enriched recordings carry one), else derive
        val derived = (col("best_bid").cast("double") + col("best_ask").cast("double")) / 2.0
        if (raw.columns.contains("mid")) coalesce(expr("try_cast(mid AS DOUBLE)"), derived)
        else derived
      })

    val slices = walked.select(
      col("slice"), col("ts_ms"), col("iso"),
      col("filled").as("filled_qty"),
      lit(sliceQty).as("slice_target_qty"),
      col("walk_vwap").as("slice_vwap"),
      col("levels_touched"))
      .orderBy("slice")

    val agg = walked.agg(
      sum(col("filled")).as("filled_qty"),
      sum(col(s"cost$depth")).as("notional"),
      min_by(col("mid"), col("_rid")).as("mid_open"),
      max_by(col("mid"), col("_rid")).as("mid_close"))
    val vwap = when(col("filled_qty") > 0, col("notional") / col("filled_qty"))
    val summary = agg
      .withColumn("side", lit(side))
      .withColumn("target_qty", lit(totalQty))
      .withColumn("vwap", vwap)
      .withColumn("slippage_bps_vs_mid_open",
        if (side == "buy") Impact.slippageBpsRatio(col("vwap"), col("mid_open"))
        else Impact.slippageBpsRatio(col("mid_open"), col("vwap")))
      .withColumn("slippage_bps_vs_mid_close",
        if (side == "buy") Impact.slippageBpsRatio(col("vwap"), col("mid_close"))
        else Impact.slippageBpsRatio(col("mid_close"), col("vwap")))
      .withColumn("slices", lit(picks.length))
      .select("side", "target_qty", "filled_qty", "vwap", "notional",
        "slippage_bps_vs_mid_open", "slippage_bps_vs_mid_close", "slices")
    Result(slices, summary)
  }
}
