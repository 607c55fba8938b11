package graft.jobs

import graft.impact.Impact
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** mmt-impact-twap analog (`impact_twap.py:191-300`): equal or stochastic
  * (Dirichlet) slice sizes, timestamp schedule with optional jitter,
  * nearest-row as-of matching (monotone pointer, ties advance), stop-at-
  * first-blank/zero ladder (X2 stop flavor) capped at depth_cap, fees on
  * notional (per-slice vwap uses slice fee; summary applies fee to the
  * pre-fee total — the reference's exact order).
  *
  * `allow_residual` is replicated as the no-op it actually is (X6,
  * SURVEY §7.4.5): `take = min(min(size, remain), remain)`.
  *
  * Stochastic sizes use a seeded JVM RNG (Marsaglia-Tsang gamma) — the
  * reference's `random.gammavariate` sequence is not JVM-reproducible
  * (SURVEY §7.4.9), so this mode is property-tested, not golden-tested.
  */
object TwapJob {

  case class Summary(side: String, target_qty: Double, filled_qty: Double,
                     vwap: Double, notional: Double, fee_bps: Double,
                     slices: Int, schedule: String,
                     slippage_bps_vs_mid_open: Option[Double],
                     slippage_bps_vs_mid_close: Option[Double],
                     levels_touched_avg: Double)

  case class Result(slices: DataFrame, summary: Summary)

  /** Marsaglia–Tsang gamma(alpha, 1) sampler over a seeded JVM RNG. */
  private def gamma(rng: java.util.Random, alpha: Double): Double = {
    if (alpha < 1) {
      val u = rng.nextDouble()
      gamma(rng, alpha + 1) * math.pow(u, 1.0 / alpha)
    } else {
      val d = alpha - 1.0 / 3.0
      val c = 1.0 / math.sqrt(9.0 * d)
      var out = -1.0
      while (out < 0) {
        var x = 0.0; var v = 0.0
        do { x = rng.nextGaussian(); v = 1.0 + c * x } while (v <= 0)
        v = v * v * v
        val u = rng.nextDouble()
        if (u < 1 - 0.0331 * x * x * x * x || math.log(u) < 0.5 * x * x + d * (1 - v + math.log(v)))
          out = d * v
      }
      out
    }
  }

  def sliceSizes(schedule: String, targetQty: Double, nSlices: Int, seed: Long): Seq[Double] =
    if (schedule == "equal") {
      val per = targetQty / nSlices
      val sizes = Array.fill(nSlices)(per)
      sizes(nSlices - 1) = targetQty - sizes.take(nSlices - 1).sum
      sizes.toSeq
    } else {
      val rng = new java.util.Random(seed)
      val draws = Seq.fill(nSlices)(gamma(rng, 3.0))
      val total = draws.sum
      draws.map(d => targetQty * (d / total))
    }

  def run(spark: SparkSession, inPath: String, side: String, targetQty: Double,
          nSlices: Int, depthCap: Int, feeBps: Double, schedule: String = "equal",
          jitterMs: Int = 0, seed: Long = 42L,
          allowResidual: Boolean = false): Result = {
    val raw = graft.io.BookIO.readAny(spark, inPath)
      .coalesce(1).withColumn("_rid", monotonically_increasing_id())
    val n = raw.count().toInt

    // schedule: half-even index pick, optional jitter — only the ≤ nSlices
    // chosen rows' timestamps ever reach the driver
    val idxs = (0 until nSlices).map(i => math.rint(i.toDouble * (n - 1) / math.max(1, nSlices - 1)).toInt)
    val tsAt: Map[Long, Long] = raw
      .filter(col("_rid").isin(idxs.map(_.toLong).distinct: _*))
      .select(col("_rid"), col("ts_ms").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chosen = idxs.map(i => tsAt(i.toLong))
    val rng = new java.util.Random(seed)
    val targets = if (jitterMs <= 0) chosen
    else chosen.map(t => (t + (rng.nextDouble() * jitterMs - jitterMs / 2.0)).toLong)

    // nearest-|ts−t| matching runs distributed (AsOf.nearest: two window
    // passes over series ∪ probes); the reference pointer's never-backward
    // behavior under non-monotone jittered targets is a running max over
    // the ≤ nSlices matched indices — each greedy stop is provably
    // max(lastArgmin(tᵢ), jᵢ₋₁) because distances are V-shaped in row
    // order and equal-ts runs always advance to their last row
    import spark.implicits._
    val probesDf = targets.zipWithIndex
      .map { case (t, k) => (k.toLong, t, "s") }.toDF("probe_id", "t", "part")
    val series = raw.select(col("_rid"), col("ts_ms"), lit("s").as("part"))
    val matchedAt: Map[Long, Long] =
      graft.impact.AsOf.nearest(series, "part", "_rid", "ts_ms", Seq.empty,
          probesDf, "probe_id", "t")
        .select(col("probe_id"), col("matched_ord"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rowIdxs = {
      var j = 0L
      (0 until nSlices).map { k => j = math.max(j, matchedAt(k.toLong)); j }
    }
    val sizes = sliceSizes(schedule, targetQty, nSlices, seed)

    // distributed walk at the picked rows (stop-at-first-blank/zero ladder)
    val sched = rowIdxs.zip(sizes).zipWithIndex
      .map { case ((ri, sz), k) => (k + 1, ri, sz) }
      .toDF("slice", "_rid2", "slice_target_qty")
    val bookSide = if (side == "buy") "ask" else "bid"
    val picked = raw.join(broadcast(sched), col("_rid") === col("_rid2"))
    val masked = Impact.withStopMask(picked, bookSide, depthCap)
    val walked = Impact.walkLayers(masked, s"stop$bookSide", col("slice_target_qty"), depthCap)
      .withColumn("mid",
        (col("best_bid").cast("double") + col("best_ask").cast("double")) / 2.0)
      .withColumn("eff_notional",
        if (side == "buy") col(s"cost$depthCap") * (lit(1.0) + lit(feeBps) / lit(1e4))
        else greatest(lit(0.0), col(s"cost$depthCap") * (lit(1.0) - lit(feeBps) / lit(1e4))))
      .withColumn("slice_vwap", when(col("filled") > 0, col("eff_notional") / col("filled")))

    val slices = walked.select(col("slice").cast("long").as("slice"), col("ts_ms"),
      col("filled").as("filled_qty"), col("slice_target_qty"),
      col("slice_vwap"), col("levels_touched"))
      .orderBy("slice")

    val a = walked.agg(
      sum("filled").as("filled_qty"),
      sum(col(s"cost$depthCap")).as("pre_fee_notional"),
      sum("levels_touched").as("levels_sum"),
      min_by(col("mid"), col("slice")).as("mid_open"),
      max_by(col("mid"), col("slice")).as("mid_close")).collect()(0)
    val filledTotal = a.getDouble(0)
    val preFee = a.getDouble(1)
    val effTotal = if (side == "buy") preFee * (1.0 + feeBps / 1e4)
    else math.max(0.0, preFee * (1.0 - feeBps / 1e4))
    val vwap = if (filledTotal > 0) effTotal / filledTotal else Double.NaN
    def slip(i: Int): Option[Double] =
      if (a.isNullAt(i)) None
      else {
        val m = a.getDouble(i)
        if (m == 0) None
        else Some(if (side == "buy") 1e4 * (vwap / m - 1) else 1e4 * (1 - vwap / m))
      }
    Result(slices, Summary(side, targetQty, filledTotal, vwap, effTotal, feeBps,
      nSlices, schedule, slip(3), slip(4), a.getLong(2).toDouble / math.max(1, nSlices)))
  }
}
