package graft.impact

import graft.{Q, Tables}
import graft.book.{BookMetrics, BookSql, SyntheticBook}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-slice TWAP input after scheduling + allocation (q26). */
case class SliceIn(sym: String, i: Long, seq: Long, alloc: Double, mid: Option[Double],
                   p1: Option[Double], s1: Option[Double], p2: Option[Double], s2: Option[Double],
                   p3: Option[Double], s3: Option[Double], p4: Option[Double], s4: Option[Double],
                   p5: Option[Double], s5: Option[Double])

case class SliceOut(sym: String, i: Long, seq: Long, alloc: Double,
                    desired: Double, filled: Double, carry: Double,
                    cost: Double, levels_touched: Int,
                    mid_open: Option[Double], mid_close: Option[Double])

/** Impact-simulation queries (SURVEY.md §2.8, §3.3): X1 ladder walk, X3
  * TWAP scheduling, A4/A5 run summaries, J2 as-of join, X5 VWAP
  * carry-forward.
  *
  * Scale design: the walk is a pure per-row projection; scheduling is one
  * window pass + a tiny broadcast join; the carry loop (X5) — the one
  * genuinely sequential scan — runs as `flatMapGroups` per symbol:
  * sequential within a key (≤ slices rows in memory), parallel across
  * keys, no driver-side collect.
  */
object ImpactQueries {

  private val D = 5
  private val SLICES = 20

  private def bookDf(s: SparkSession, dir: String): DataFrame =
    SyntheticBook.fromEvents(Tables(s, dir, "events"), D)

  private def withCte(rest: String): String = s"WITH ${SyntheticBook.sqlCte(D)}$rest"

  // ---------------------------------------------------------------- q22
  val q22 = Q("q22_book_walk",
    (s, dir) => {
      // both X2 flavors: skip-blank (impact.py) and stop-at-first-blank/zero
      // (impact_twap.py) — the stop flavor walks a chain-masked ladder
      // sort-early: the walk layers are pure projections; sorting the
      // narrow book first avoids the trailing sort re-executing them for
      // range sampling (see BookQueries.q11)
      val skip = Impact.walkLayers(bookDf(s, dir).orderBy("seq"), "ask", lit(3.7), D)
      Impact.walkLayers(Impact.withStopMask(skip, "ask", D), "stopask", lit(3.7), D, "stop_")
        .select("seq", "sym", "filled", "walk_vwap", "levels_touched",
          "stop_filled", "stop_walk_vwap", "stop_levels_touched")
    },
    Some(withCte(s""",
    ${Impact.walkLayersSql("book", "ask", "3.7::DOUBLE", D)},
    ${Impact.stopMaskSql("walked", "ask", D)},
    ${Impact.walkLayersSql("stopmasked", "stopask", "3.7::DOUBLE", D, "stop_")}
    SELECT seq, sym, filled, walk_vwap, levels_touched,
           stop_filled, stop_walk_vwap, stop_levels_touched
    FROM stop_walked ORDER BY seq""")),
    headline = true)

  // ------------------------------------------- TWAP schedule (shared)
  /** Spark side: book + per-sym row_number/count + positional slice pick
    * `pos_i = (i·(n−1)) div (slices−1)` (deterministic integer-floor
    * variant of the reference's linspace pick, `impact.py:196-224`;
    * SURVEY §7.4 notes numpy's banker-rounding is not portable).
    */
  private def slicedBook(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy("sym").orderBy("seq")
    val bn = bookDf(s, dir)
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("sym")))
    val sched = bn.groupBy("sym").agg(max("n").as("n2"))
      .select(col("sym").as("s_sym"), col("n2"),
        explode(sequence(lit(0L), lit((SLICES - 1).toLong))).as("i"))
      .withColumn("pos", expr(s"(i * (n2 - 1)) div ${SLICES - 1}"))
    bn.join(broadcast(sched), bn("sym") === col("s_sym") && (bn("rn") - lit(1) === col("pos")))
      .drop("s_sym", "n2", "pos")
  }

  private val schedCtes: String = s""",
    bn AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY sym ORDER BY seq) AS rn,
                     COUNT(*) OVER (PARTITION BY sym) AS n FROM book),
    sn AS (SELECT DISTINCT sym, n FROM bn),
    sched AS (SELECT sym, n, i, (i * (n - 1)) // ${SLICES - 1} AS pos
              FROM sn, generate_series(0, ${SLICES - 1}) AS t(i)),
    sl AS (SELECT b.*, s.i,
             CASE WHEN s.i = ${SLICES - 1}
                  THEN 50.0::DOUBLE - (50.0::DOUBLE / 20.0::DOUBLE) * ${SLICES - 1}
                  ELSE 50.0::DOUBLE / 20.0::DOUBLE END AS slice_target
           FROM bn b JOIN sched s ON b.sym = s.sym AND b.rn - 1 = s.pos)"""

  private def twapSlices(s: SparkSession, dir: String): DataFrame = {
    val target = when(col("i") === SLICES - 1,
      lit(50.0) - (lit(50.0) / lit(20.0)) * lit(SLICES - 1))
      .otherwise(lit(50.0) / lit(20.0))
    val sliced = slicedBook(s, dir).withColumn("slice_target", target)
    Impact.walkLayers(sliced, "ask", col("slice_target"), D)
      .withColumn("mid", BookMetrics.mid(col("best_bid"), col("best_ask")))
      .withColumn("slice_vwap_fee", Impact.withFeeBps(col("walk_vwap"), 5.0))
      .withColumn("slip_bps", Impact.slippageBpsRatio(col("slice_vwap_fee"), col("mid")))
  }

  private val twapSqlCore: String = s"""$schedCtes,
    ${Impact.walkLayersSql("sl", "ask", "slice_target", D)},
    tw AS (SELECT *, ${BookSql.mid} AS mid,
             walk_vwap * (1.0::DOUBLE + 5.0::DOUBLE / 10000.0::DOUBLE) AS slice_vwap_fee
           FROM walked),
    tw2 AS (SELECT *,
             CASE WHEN mid != 0 THEN 10000.0::DOUBLE * (slice_vwap_fee / mid - 1) END AS slip_bps
            FROM tw)"""

  // ---------------------------------------------------------------- q23
  val q23 = Q("q23_impact_twap_slices",
    (s, dir) => {
      twapSlices(s, dir)
        .select("sym", "i", "seq", "slice_target", "filled", "walk_vwap",
          "slice_vwap_fee", "levels_touched", "slip_bps")
        .transform(graft.Q.presentSorted(_, "sym", "i"))
    },
    Some(withCte(s"""$twapSqlCore
    SELECT sym, i, seq, slice_target, filled, walk_vwap, slice_vwap_fee,
           levels_touched, slip_bps
    FROM tw2 ORDER BY sym, i""")),
    headline = true)

  // ---------------------------------------------------------------- q24
  val q24 = Q("q24_impact_twap_summary",
    (s, dir) => {
      val sl = twapSlices(s, dir).cache()
      val summary = sl.groupBy("sym").agg(
        count(lit(1)).as("n_slices"),
        graft.Exact.sumExact(col("filled"), 6).as("filled_qty"),
        graft.Exact.sumExact(col(s"cost$D"), 6).as("notional"),
        (sum("levels_touched").cast("double") / count(lit(1))).as("avg_levels"))
      val oc = sl.filter(col("mid").isNotNull).groupBy("sym").agg(
        min_by(col("mid"), col("seq")).as("mid_open"),
        max_by(col("mid"), col("seq")).as("mid_close"))
      summary.join(oc, Seq("sym"))
        .withColumn("exec_vwap", when(col("filled_qty") > 0, col("notional") / col("filled_qty")))
        .withColumn("slip_open_bps", Impact.slippageBpsRatio(col("exec_vwap"), col("mid_open")))
        .withColumn("slip_close_bps", Impact.slippageBpsRatio(col("exec_vwap"), col("mid_close")))
        .select("sym", "n_slices", "filled_qty", "notional", "exec_vwap", "avg_levels",
          "mid_open", "mid_close", "slip_open_bps", "slip_close_bps")
        .orderBy("sym")
    },
    Some(withCte(s"""$twapSqlCore,
    summary AS (
      SELECT sym, COUNT(*) AS n_slices,
        ${graft.Exact.sumExactSql("filled", 6)} AS filled_qty,
        ${graft.Exact.sumExactSql(s"cost$D", 6)} AS notional,
        CAST(SUM(levels_touched) AS DOUBLE) / COUNT(*) AS avg_levels
      FROM tw2 GROUP BY sym),
    oc AS (
      SELECT sym, arg_min(mid, seq) AS mid_open, arg_max(mid, seq) AS mid_close
      FROM tw2 WHERE mid IS NOT NULL GROUP BY sym),
    j AS (
      SELECT s.*, oc.mid_open, oc.mid_close,
        CASE WHEN filled_qty > 0 THEN notional / filled_qty END AS exec_vwap
      FROM summary s JOIN oc USING (sym))
    SELECT sym, n_slices, filled_qty, notional, exec_vwap, avg_levels, mid_open, mid_close,
      CASE WHEN mid_open != 0 THEN 10000.0::DOUBLE * (exec_vwap / mid_open - 1) END AS slip_open_bps,
      CASE WHEN mid_close != 0 THEN 10000.0::DOUBLE * (exec_vwap / mid_close - 1) END AS slip_close_bps
    FROM j ORDER BY sym""")))

  // ------------------------------------------------------- q25: as-of join
  /** J2 `impact_twap.py:174-188` generalized: match each scheduled probe
    * time to the latest book row with ts_us ≤ t per symbol. Spark side is
    * the scalable union + running-last trick (one sort, no N×M join);
    * oracle side is a correlated top-1 subquery.
    */
  val q25 = Q("q25_asof_match",
    (s, dir) => {
      val b = bookDf(s, dir)
        .withColumn("mid", BookMetrics.mid(col("best_bid"), col("best_ask")))
        .select("sym", "seq", "ts_us", "mid")
      val sched = b.filter(col("seq") % 100 === 0)
        .select(col("sym"), col("seq").as("sched_seq"), (col("ts_us") + lit(15000000L)).as("t"))
      val tagged = b.select(col("sym"), col("ts_us").as("ts"), lit(0).as("is_q"),
        col("seq").as("ord"), struct(col("seq"), col("mid")).as("bk"),
        lit(null).cast("long").as("sched_seq"))
        .unionByName(sched.select(col("sym"), col("t").as("ts"), lit(1).as("is_q"),
          col("sched_seq").as("ord"), lit(null).cast("struct<seq:bigint,mid:double>").as("bk"),
          col("sched_seq")))
      val w = Window.partitionBy("sym").orderBy("ts", "is_q", "ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("m", last("bk", ignoreNulls = true).over(w))
        .filter(col("is_q") === 1)
        .select(col("sym"), col("sched_seq"), col("ts").as("t"),
          col("m.seq").as("matched_seq"), col("m.mid").as("matched_mid"))
        .transform(graft.Q.presentSorted(_, "sym", "sched_seq"))
    },
    Some(withCte(s""",
    bm AS (SELECT sym, seq, ts_us, ${BookSql.mid} AS mid FROM book),
    sched AS (SELECT sym, seq AS sched_seq, ts_us + 15000000 AS t FROM bm WHERE seq % 100 = 0)
    SELECT s.sym, s.sched_seq, s.t,
      (SELECT b.seq FROM bm b WHERE b.sym = s.sym AND b.ts_us <= s.t
       ORDER BY b.ts_us DESC, b.seq DESC LIMIT 1) AS matched_seq,
      (SELECT b.mid FROM bm b WHERE b.sym = s.sym AND b.ts_us <= s.t
       ORDER BY b.ts_us DESC, b.seq DESC LIMIT 1) AS matched_mid
    FROM sched s ORDER BY s.sym, s.sched_seq""")))

  // -------------------------------------------- q49: nearest-|ts−t| as-of
  /** J2 exact semantics of `impact_twap.py:174-188` distributed: match
    * each probe time to the row minimizing |ts−t|, pointer tie rules —
    * forward wins an exact two-sided tie, the last row of an equal-ts run
    * wins within a side. Probes cover all three regimes: exact hit
    * (dB = 0), gap midpoint (two-sided tie when the gap is even), and an
    * off-grid offset. Implementation: [[AsOf.nearest]] (two window
    * passes, no N×S join); oracle: LATERAL top-1 ordered by
    * (|ts−t| ASC, seq DESC).
    */
  val q49 = Q("q49_asof_nearest",
    (s, dir) => {
      val b = bookDf(s, dir)
        .withColumn("mid", BookMetrics.mid(col("best_bid"), col("best_ask")))
        .select("sym", "seq", "ts_us", "mid")
      val wn = Window.partitionBy("sym").orderBy("seq")
      val probes = b
        .withColumn("next_ts", lead(col("ts_us"), 1).over(wn))
        .filter(col("seq") % 100 === 0)
        .select(col("sym"), col("seq"), posexplode(array(
          col("ts_us"),
          expr("ts_us + ((next_ts - ts_us) DIV 2)"),
          col("ts_us") + lit(15000L))))
        .toDF("sym", "seq", "flavor", "t")
        .filter(col("t").isNotNull)
        .select(col("sym"), (col("seq") * 3 + col("flavor")).as("probe_id"), col("t"))
      AsOf.nearest(b, "sym", "seq", "ts_us", Seq("mid"), probes, "probe_id", "t")
        .select(col("sym"), col("probe_id"), col("t"),
          col("matched_ord").as("matched_seq"), col("matched_ts"), col("matched_mid"),
          abs(col("matched_ts") - col("t")).as("dist"))
        .transform(graft.Q.presentSorted(_, "sym", "probe_id"))
    },
    Some(withCte(s""",
    bm AS (SELECT sym, seq, ts_us, ${BookSql.mid} AS mid FROM book),
    wn AS (SELECT sym, seq, ts_us,
             lead(ts_us) OVER (PARTITION BY sym ORDER BY seq) AS next_ts
           FROM bm),
    probes AS (
      SELECT sym, seq * 3 AS probe_id, ts_us AS t FROM wn WHERE seq % 100 = 0
      UNION ALL
      SELECT sym, seq * 3 + 1, ts_us + (next_ts - ts_us) // 2
      FROM wn WHERE seq % 100 = 0 AND next_ts IS NOT NULL
      UNION ALL
      SELECT sym, seq * 3 + 2, ts_us + 15000 FROM wn WHERE seq % 100 = 0
    )
    SELECT p.sym, p.probe_id, p.t, m.seq AS matched_seq, m.ts_us AS matched_ts,
           m.mid AS matched_mid, abs(m.ts_us - p.t) AS dist
    FROM probes p, LATERAL (
      SELECT b.seq, b.ts_us, b.mid FROM bm b WHERE b.sym = p.sym
      ORDER BY abs(b.ts_us - p.t) ASC, b.seq DESC LIMIT 1
    ) m
    ORDER BY p.sym, p.probe_id""")))

  // ------------------------------------------------- q26: VWAP carry loop
  /** X5 `impact_vwap.py:289-352`: allocation ∝ ask-side top-K size proxy
    * (X4), then the sequential carry fold — slice i's desired qty is its
    * allocation plus slice i−1's unfilled remainder. Sequential within a
    * symbol, parallel across symbols (`flatMapGroups`). Oracle: DuckDB
    * recursive CTE with the walk closed form inlined.
    */
  /** Spark side of the carry fold (shared by q26/q40): slices with
    * allocation (X4) → per-symbol sequential fold (X5) producing desired,
    * filled, carry, cost, levels_touched. The fold's arithmetic is the
    * exact mirror of [[Impact.walkLayers]] / the recursive-CTE oracle.
    *
    * The fold ALSO emits the per-symbol open/close slice mids (first/last
    * non-null mid in seq order — the group is already in memory), so q40
    * derives its whole summary from this one pass instead of executing
    * the schedule + fold lineage a second time for the mids.
    */
  private def vwapCarryDf(s: SparkSession, dir: String) = {
    import s.implicits._
    val proxy = (1 to D).map(k => coalesce(col(s"ask${k}_size"), lit(0.0))).reduce(_ + _)
    // target 400 over 20 slices: per-slice demand (~20) exceeds typical
    // ladder capacity, so unfilled remainders chain across slices — the
    // X5 stress the reference's carry loop is about
    val sliced = slicedBook(s, dir)
      .withColumn("proxy", proxy)
      .withColumn("total", sum("proxy").over(Window.partitionBy("sym")))
      .withColumn("alloc",
        when(col("total") > 0, lit(400.0) * col("proxy") / col("total"))
          .otherwise(lit(400.0) / lit(20.0)))
    val ins = sliced.select(col("sym"), col("i"), col("seq"), col("alloc"),
      BookMetrics.mid(col("best_bid"), col("best_ask")).as("mid"),
      col("ask1_price").as("p1"), col("ask1_size").as("s1"),
      col("ask2_price").as("p2"), col("ask2_size").as("s2"),
      col("ask3_price").as("p3"), col("ask3_size").as("s3"),
      col("ask4_price").as("p4"), col("ask4_size").as("s4"),
      col("ask5_price").as("p5"), col("ask5_size").as("s5")).as[SliceIn]
    ins.groupByKey(_.sym).flatMapGroups { (_, it) =>
      val slices = it.toSeq.sortBy(_.i)
      // open/close mid over the SAME slice rows (min_by/max_by(mid, seq)
      // with nulls skipped — slices are seq-monotone in i)
      val withMid = slices.filter(_.mid.isDefined)
      val midOpen = if (withMid.isEmpty) None else withMid.minBy(_.seq).mid
      val midClose = if (withMid.isEmpty) None else withMid.maxBy(_.seq).mid
      var carry = 0.0
      slices.map { sl =>
        val desired = sl.alloc + carry
        // mirror of Impact.walkLayers / the oracle's walk chain
        var rem = desired; var cost = 0.0; var tch = 0
        val ladder = Seq(sl.p1 -> sl.s1, sl.p2 -> sl.s2, sl.p3 -> sl.s3,
          sl.p4 -> sl.s4, sl.p5 -> sl.s5)
        for ((p, sz) <- ladder) {
          val take =
            if (p.isDefined && sz.isDefined && rem > 0) math.min(rem, math.max(0.0, sz.get))
            else 0.0
          rem = rem - take
          if (take > 0) { cost = cost + p.get * take; tch += 1 }
        }
        val filled = desired - rem
        carry = desired - filled
        SliceOut(sl.sym, sl.i, sl.seq, sl.alloc, desired, filled, carry, cost, tch,
          midOpen, midClose)
      }
    }.toDF()
  }

  /** Oracle WITH-chain shared by q26/q40: recursive carry + a second
    * layered walk pass over the resolved `desired` (recomputing cost /
    * touched without inlining them into the recursion).
    */
  private def vwapCarryCtes: String = {
    def remChain(d: String): String = {
      var rem = s"($d)"
      for (k <- 1 to D) {
        val p = s"a.ask${k}_price"; val sz = s"a.ask${k}_size"
        val take = s"CASE WHEN $p IS NOT NULL AND $sz IS NOT NULL AND $rem > 0 " +
          s"THEN least($rem, greatest(0.0::DOUBLE, $sz)) ELSE 0.0::DOUBLE END"
        rem = s"($rem - $take)"
      }
      rem
    }
    def filledExpr(d: String) = s"(($d) - ${remChain(d)})"
    val proxySql = (1 to D).map(k => s"COALESCE(ask${k}_size, 0.0::DOUBLE)").mkString(" + ")
    val dRec = "(a.alloc + (r.desired - r.filled))"
    s"""${SyntheticBook.sqlCte(D)}$schedCtes,
    al AS (
      SELECT sl.*,
        CASE WHEN SUM($proxySql) OVER (PARTITION BY sym) > 0
             THEN 400.0::DOUBLE * ($proxySql) / SUM($proxySql) OVER (PARTITION BY sym)
             ELSE 400.0::DOUBLE / 20.0::DOUBLE END AS alloc
      FROM sl),
    rec AS (
      SELECT a.sym, a.i, a.seq, a.alloc,
             a.alloc AS desired, ${filledExpr("a.alloc")} AS filled
      FROM al a WHERE a.i = 0
      UNION ALL
      SELECT a.sym, a.i, a.seq, a.alloc,
             $dRec AS desired, ${filledExpr(dRec)} AS filled
      FROM rec r JOIN al a ON a.sym = r.sym AND a.i = r.i + 1
    ),
    sl2 AS (
      SELECT r.sym, r.i, r.seq, r.alloc, r.desired,
             ${(1 to D).map(k => s"a.ask${k}_price, a.ask${k}_size").mkString(", ")}
      FROM rec r JOIN al a ON a.sym = r.sym AND a.i = r.i
    ),
    ${Impact.walkLayersSql("sl2", "ask", "desired", D)}"""
  }

  val q26 = Q("q26_impact_vwap_carry",
    (s, dir) => {
      vwapCarryDf(s, dir)
        .select("sym", "i", "seq", "alloc", "desired", "filled", "carry",
          "cost", "levels_touched")
        .transform(graft.Q.presentSorted(_, "sym", "i"))
    },
    Some(s"""WITH RECURSIVE $vwapCarryCtes
    SELECT sym, i, seq, alloc, desired, filled, desired - filled AS carry,
           cost$D AS cost, levels_touched
    FROM walked ORDER BY sym, i"""))

  // ------------------------------------------- q40: full VWAP summary
  /** A5 `impact_vwap.py:354-375`: per-symbol run summary with fee
    * tracking (fee = slice notional · bps/1e4, tracked separately and
    * added into notional_with_fees) and slippage vs open/close mid.
    */
  val q40 = Q("q40_impact_vwap_summary",
    (s, dir) => {
      val folded = vwapCarryDf(s, dir)
      val feeRate = lit(5.0) / lit(10000.0)
      // ONE aggregation over the single fold pass: the open/close mids
      // ride along from the fold (constant per sym), so the schedule +
      // carry lineage executes exactly once. The mid_open null filter
      // mirrors the oracle's inner join against its WHERE mid IS NOT
      // NULL subquery (a symbol with no non-null mid drops out).
      folded.groupBy("sym").agg(
        count(lit(1)).as("n_slices"),
        graft.Exact.sumExact(col("filled"), 6).as("filled_qty"),
        graft.Exact.sumExact(col("cost"), 6).as("notional"),
        graft.Exact.sumExact(col("cost") * feeRate, 8).as("fees_paid"),
        (sum("levels_touched").cast("double") / count(lit(1))).as("avg_levels"),
        min(col("mid_open")).as("mid_open"),
        min(col("mid_close")).as("mid_close"))
        .filter(col("mid_open").isNotNull)
        .withColumn("exec_vwap", when(col("filled_qty") > 0, col("notional") / col("filled_qty")))
        .withColumn("notional_with_fees", col("notional") + col("fees_paid"))
        .withColumn("slip_open_bps", Impact.slippageBpsRatio(col("exec_vwap"), col("mid_open")))
        .withColumn("slip_close_bps", Impact.slippageBpsRatio(col("exec_vwap"), col("mid_close")))
        .select("sym", "n_slices", "filled_qty", "notional", "fees_paid",
          "notional_with_fees", "exec_vwap", "avg_levels", "mid_open", "mid_close",
          "slip_open_bps", "slip_close_bps")
        .orderBy("sym")
    },
    Some(s"""WITH RECURSIVE $vwapCarryCtes,
    summary AS (
      SELECT sym, COUNT(*) AS n_slices,
        ${graft.Exact.sumExactSql("filled", 6)} AS filled_qty,
        ${graft.Exact.sumExactSql(s"cost$D", 6)} AS notional,
        ${graft.Exact.sumExactSql(s"cost$D * (5.0::DOUBLE / 10000.0::DOUBLE)", 8)} AS fees_paid,
        CAST(SUM(levels_touched) AS DOUBLE) / COUNT(*) AS avg_levels
      FROM walked GROUP BY sym),
    oc AS (
      SELECT sym, arg_min(mid, seq) AS mid_open, arg_max(mid, seq) AS mid_close
      FROM (SELECT sym, seq, ${BookSql.mid} AS mid FROM sl)
      WHERE mid IS NOT NULL GROUP BY sym),
    j AS (
      SELECT s.*, oc.mid_open, oc.mid_close,
        CASE WHEN filled_qty > 0 THEN notional / filled_qty END AS exec_vwap
      FROM summary s JOIN oc USING (sym))
    SELECT sym, n_slices, filled_qty, notional, fees_paid,
      notional + fees_paid AS notional_with_fees, exec_vwap, avg_levels,
      mid_open, mid_close,
      CASE WHEN mid_open != 0 THEN 10000.0::DOUBLE * (exec_vwap / mid_open - 1) END AS slip_open_bps,
      CASE WHEN mid_close != 0 THEN 10000.0::DOUBLE * (exec_vwap / mid_close - 1) END AS slip_close_bps
    FROM j ORDER BY sym"""))

  def all: Seq[Q] = Seq(q22, q23, q24, q25, q26, q40, q49)
}
