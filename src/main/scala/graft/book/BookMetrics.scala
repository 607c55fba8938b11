package graft.book

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-row (projection-only) microstructure metrics as pure `Column`
  * combinators — no UDFs, fully codegen'd (SURVEY.md §2.2).
  *
  * Null semantics follow the reference exactly
  * (`/root/reference/src/market_microstructure_toolkit/metrics.py`):
  * a `None` return maps to SQL NULL via `when(cond, expr)` with no
  * otherwise-branch.
  */
object BookMetrics {

  /** P2 `metrics.py:56-65`: spread = ask − bid; NULL propagates. */
  def spread(bid: Column, ask: Column): Column = ask - bid

  /** P2: mid = 0.5·(bid + ask). */
  def mid(bid: Column, ask: Column): Column = lit(0.5) * (bid + ask)

  /** P5 `metrics.py:98-121` (strict flavor): 1e4·(a−b)/mid; NULL on
    * missing, non-positive prices, or crossed/locked book (a ≤ b).
    */
  def relSpreadBpsStrict(bid: Column, ask: Column): Column =
    when(bid > 0 && ask > 0 && ask > bid, lit(10000.0) * (ask - bid) / (lit(0.5) * (bid + ask)))

  /** P6 `plot_cli.py:130-135` (vectorized flavor): 20000·(a−b)/(a+b);
    * crossed books allowed (negative result); NULL iff a+b ≤ 0.
    */
  def relSpreadBpsVector(bid: Column, ask: Column): Column =
    when(bid + ask > 0, lit(20000.0) * (ask - bid) / (bid + ask))

  /** P7 `event_metrics.py:72-74` (event-time flavor): masks non-positive
    * quotes only; crossed books produce negative spreads.
    */
  def spreadBpsEvent(bid: Column, ask: Column): Column =
    when(bid > 0 && ask > 0, (ask - bid) / (lit(0.5) * (bid + ask)) * lit(10000.0))

  /** P3 `metrics.py:68-75`: L1 imbalance b/(b+a); missing sizes coerced
    * to 0 (`or 0.0`); NULL iff denom ≤ 0.
    */
  def imbalanceL1(bidSize: Column, askSize: Column): Column = {
    val b = coalesce(bidSize, lit(0.0))
    val a = coalesce(askSize, lit(0.0))
    when(b + a > 0, b / (b + a))
  }

  /** P4 `metrics.py:78-95`: depth-K imbalance Σbid/(Σbid+Σask), missing
    * levels skipped; NULL iff denom ≤ 0. Left-fold order matches the
    * reference's level loop.
    */
  def imbalanceDepthK(bidSizes: Seq[Column], askSizes: Seq[Column]): Column = {
    val b = bidSizes.map(coalesce(_, lit(0.0))).reduce(_ + _)
    val a = askSizes.map(coalesce(_, lit(0.0))).reduce(_ + _)
    when(b + a > 0, b / (b + a))
  }

  /** P8 `metrics.py:124-142`: microprice (a·qb + b·qa)/(qb+qa); NULL if
    * any input missing or denom ≤ 0 (null propagation covers "missing").
    */
  def microprice(bid: Column, ask: Column, bidSize: Column, askSize: Column): Column =
    when(bidSize + askSize > 0, (ask * bidSize + bid * askSize) / (bidSize + askSize))

  /** P9 `event_metrics.py:76-82`: event-time microprice — missing sizes
    * → 0, denom-0 falls back to mid.
    */
  def micropriceEvent(bid: Column, ask: Column, bidSize: Column, askSize: Column): Column = {
    val qb = coalesce(bidSize, lit(0.0))
    val qa = coalesce(askSize, lit(0.0))
    coalesce(when(qb + qa > 0, (ask * qb + bid * qa) / (qb + qa)), mid(bid, ask))
  }

  /** P10 `metrics.py:145-167`: 1e4·(microprice − mid)/mid; NULL when
    * mid ≤ 0 or microprice NULL.
    */
  def micropriceImbalanceBps(bid: Column, ask: Column, bidSize: Column, askSize: Column): Column = {
    val m = mid(bid, ask)
    val mp = microprice(bid, ask, bidSize, askSize)
    when(m > 0, lit(10000.0) * (mp - m) / m)
  }

  /** P11 `metrics.py:235-253`: one side's notional Σ p·q over top-K,
    * levels with either field missing skipped; NULL iff no valid level.
    */
  def notionalDepth(levels: Seq[(Column, Column)]): Column = {
    val terms = levels.map { case (p, q) =>
      when(p.isNotNull && q.isNotNull, p * q).otherwise(lit(0.0))
    }.reduce(_ + _)
    val anyValid = levels.map { case (p, q) => p.isNotNull && q.isNotNull }.reduce(_ || _)
    when(anyValid, terms)
  }

  /** P12 `metrics.py:256-290`: book slope — OLS slope of cumulative size
    * y_i vs price distance x_i = |p_i − p_first_valid| over the valid
    * top-K levels; NULL if < 2 valid levels or var(x) ≤ 0.
    *
    * Closed-form scalar expression (no shuffle, no UDF): uses the
    * unnormalized sums form slope = (Σxy − Σx·Σy/n)/(Σx² − (Σx)²/n),
    * algebraically equal to the reference's centered form.
    */
  def bookSlope(levels: Seq[(Column, Column)]): Column = {
    val valid = levels.map { case (p, q) => p.isNotNull && q.isNotNull }
    val n = valid.map(v => when(v, lit(1.0)).otherwise(lit(0.0))).reduce(_ + _)
    // first valid price
    val p0 = coalesce(levels.zip(valid).map { case ((p, _), v) => when(v, p) }: _*)
    // per-level x_i (0 contribution when invalid)
    val xs = levels.zip(valid).map { case ((p, _), v) => when(v, abs(p - p0)).otherwise(lit(0.0)) }
    // cumulative valid size up to level i = y_i
    val sizes = levels.zip(valid).map { case ((_, q), v) => when(v, q).otherwise(lit(0.0)) }
    val ys = sizes.scanLeft(lit(0.0))(_ + _).tail // running sums, per level
    val ysMasked = ys.zip(valid).map { case (y, v) => when(v, y).otherwise(lit(0.0)) }
    val sx = xs.reduce(_ + _)
    val sy = ysMasked.reduce(_ + _)
    val sxy = xs.zip(ysMasked).map { case (x, y) => x * y }.reduce(_ + _)
    val sxx = xs.map(x => x * x).reduce(_ + _)
    val den = sxx - sx * sx / n
    when(n >= 2 && den > 0, (sxy - sx * sy / n) / den)
  }

  /** Validity filter for an `ARRAY<STRUCT<price,size>>` side. */
  def validLevels(side: Column): Column =
    filter(side, x => x.getField("price").isNotNull && x.getField("size").isNotNull)

  /** P12 on the array schema: same slope via higher-order functions over
    * `ARRAY<STRUCT<price,size>>` — the generic-K scale path (no 4K-wide
    * codegen). Semantics identical to [[bookSlope]].
    *
    * PERF: prefer `bookSlopeValidArray(col)` over a MATERIALIZED
    * [[validLevels]] column — passing the filter expression inline makes
    * `element_at(valid, 1)` re-run the O(K) filter per fold element
    * (O(K²) interpreted work per row; ~100× at K=100).
    */
  def bookSlopeArray(side: Column): Column =
    bookSlopeValidArray(validLevels(side))

  /** [[bookSlopeArray]] body over an already-valid level array. */
  def bookSlopeValidArray(valid: Column): Column = {
    val n = size(valid).cast("double")
    val p0 = element_at(valid, 1).getField("price")
    // x_i, running y_i via aggregate with struct accumulator
    val acc = aggregate(
      valid,
      struct(lit(0.0).as("cum"), lit(0.0).as("sx"), lit(0.0).as("sy"),
        lit(0.0).as("sxy"), lit(0.0).as("sxx")),
      (st, x) => {
        val xi = abs(x.getField("price") - p0)
        val yi = st.getField("cum") + x.getField("size")
        struct(yi.as("cum"),
          (st.getField("sx") + xi).as("sx"),
          (st.getField("sy") + yi).as("sy"),
          (st.getField("sxy") + xi * yi).as("sxy"),
          (st.getField("sxx") + xi * xi).as("sxx"))
      })
    val den = acc.getField("sxx") - acc.getField("sx") * acc.getField("sx") / n
    when(n >= 2 && den > 0,
      (acc.getField("sxy") - acc.getField("sx") * acc.getField("sy") / n) / den)
  }

  /** Layered slope computation: appends named intermediate columns
    * (validity, masked size, first price, x_i, running y_i) and a final
    * `slope_<pfx>` column. Identical values to [[bookSlope]] — but the
    * named layers keep each projection small enough for whole-stage
    * codegen (the single giant tree falls back to interpreted mode and is
    * ~6× slower at 100k rows), and CollapseProject leaves reused non-cheap
    * columns un-inlined. Mirrors [[BookSql.slopeLayer1]]/[[BookSql.slopeLayer2]].
    */
  def withSlopeLayered(df0: org.apache.spark.sql.DataFrame, pfx: String, depth: Int): org.apache.spark.sql.DataFrame = {
    def valid(k: Int) = col(s"$pfx${k}_price").isNotNull && col(s"$pfx${k}_size").isNotNull
    val layer1: Seq[(String, Column)] =
      (1 to depth).flatMap { k =>
        Seq(s"${pfx}_v$k" -> when(valid(k), lit(1.0)).otherwise(lit(0.0)),
          s"${pfx}_s$k" -> when(valid(k), col(s"$pfx${k}_size")).otherwise(lit(0.0)))
      } :+ (s"${pfx}_p0" -> coalesce((1 to depth).map(k => when(valid(k), col(s"$pfx${k}_price"))): _*))
    var d = df0.withColumns(layer1.toMap)
    // running raw cumulative sizes: yraw_k = ((0.0 + s1) + ... + s_k)
    val yraws = (1 to depth).map { k =>
      s"${pfx}_yraw$k" -> (1 to k).foldLeft(lit(0.0): Column)((acc, j) => acc + col(s"${pfx}_s$j"))
    }
    val layer2a: Seq[(String, Column)] = yraws ++ (1 to depth).map { k =>
      s"${pfx}_x$k" -> when(col(s"${pfx}_v$k") === 1.0,
        abs(col(s"$pfx${k}_price") - col(s"${pfx}_p0"))).otherwise(lit(0.0))
    }
    d = d.withColumns(layer2a.toMap)
    d = d.withColumns((1 to depth).map { k =>
      s"${pfx}_y$k" -> when(col(s"${pfx}_v$k") === 1.0, col(s"${pfx}_yraw$k")).otherwise(lit(0.0))
    }.toMap)
    val n = (1 to depth).map(k => col(s"${pfx}_v$k")).reduce(_ + _)
    val sx = (1 to depth).map(k => col(s"${pfx}_x$k")).reduce(_ + _)
    val sy = (1 to depth).map(k => col(s"${pfx}_y$k")).reduce(_ + _)
    val sxy = (1 to depth).map(k => col(s"${pfx}_x$k") * col(s"${pfx}_y$k")).reduce(_ + _)
    val sxx = (1 to depth).map(k => col(s"${pfx}_x$k") * col(s"${pfx}_x$k")).reduce(_ + _)
    val den = sxx - sx * sx / n
    d.withColumn(s"slope_$pfx", when(n >= 2 && den > 0, (sxy - sx * sy / n) / den))
  }

  /** P4 on the array compute schema: Σbid/(Σbid+Σask) over
    * `ARRAY<STRUCT<price,size>>` sides — generic in K (the wide layout at
    * K≈100 is 408 columns and strains codegen; SURVEY §7.4.11).
    */
  def imbalanceDepthKArray(bids: Column, asks: Column): Column = {
    def s(side: Column) = aggregate(side, lit(0.0),
      (acc, x) => acc + coalesce(x.getField("size"), lit(0.0)))
    val b = s(bids); val a = s(asks)
    when(b + a > 0, b / (b + a))
  }

  /** P11 on the array schema: notional Σp·q, invalid levels skipped,
    * NULL iff no valid level.
    */
  def notionalDepthArray(side: Column): Column = {
    val total = aggregate(side, lit(0.0), (acc, x) =>
      acc + when(x.getField("price").isNotNull && x.getField("size").isNotNull,
        x.getField("price") * x.getField("size")).otherwise(lit(0.0)))
    val anyValid = exists(side, x =>
      x.getField("price").isNotNull && x.getField("size").isNotNull)
    when(anyValid, total)
  }

  /** Column handles for the wide layout at a given depth. */
  def bidLevels(depth: Int): Seq[(Column, Column)] =
    (1 to depth).map(k => (col(s"bid${k}_price"), col(s"bid${k}_size")))
  def askLevels(depth: Int): Seq[(Column, Column)] =
    (1 to depth).map(k => (col(s"ask${k}_price"), col(s"ask${k}_size")))

  /** P13 `metrics.py:336-379`: the standard row-metrics bundle keyed by
    * output column name (mmt-metrics enrichment set).
    */
  def rowMetricsBundle(depth: Int): Seq[(String, Column)] = {
    val bb = col("best_bid"); val ba = col("best_ask")
    val qb = col("bid1_size"); val qa = col("ask1_size")
    Seq(
      "spread" -> spread(bb, ba),
      "mid" -> mid(bb, ba),
      "relative_spread_bps" -> relSpreadBpsStrict(bb, ba),
      "microprice" -> microprice(bb, ba, qb, qa),
      "microprice_imbalance_bps" -> micropriceImbalanceBps(bb, ba, qb, qa),
      "imbalance_l1" -> imbalanceL1(qb, qa),
      "imbalance_k" -> imbalanceDepthK(bidLevels(depth).map(_._2), askLevels(depth).map(_._2)),
      "notional_bid_k" -> notionalDepth(bidLevels(depth)),
      "notional_ask_k" -> notionalDepth(askLevels(depth)),
      "slope_bid" -> bookSlope(bidLevels(depth)),
      "slope_ask" -> bookSlope(askLevels(depth)))
  }
}
