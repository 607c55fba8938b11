package graft.sql

import graft.Tables
import graft.book.{BookSql, SyntheticBook}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing Spark-SQL surface for the engine.
  *
  * Until round 12 the engine's SQL texts existed only as DuckDB oracle
  * mirrors; a user had to write DataFrame code. This object makes the
  * engine SQL-first-usable:
  *
  *   - [[registerViews]] registers every testdata table (TESTDATA.md)
  *     plus the derived order-book (`book`, [[SyntheticBook]]) as temp
  *     views, and registers the native kernel functions — so
  *     `dec_unscaled`/`unscaled_dbl` (exact float aggregation),
  *     `shingle_agg`/`minhash_spans` (text), `ord_dot` (vectors) are all
  *     callable from plain SQL.
  *   - [[texts]] carries Spark-SQL texts for a representative catalog
  *     slice — the §2.2 row-metrics bundle, spread flavors, OFI, realized
  *     variance, OHLC bars, the TPC-H-ish join/agg family, rollup, exact
  *     dedup, and a native-kernel text query — each producing EXACTLY the
  *     catalog query's output (SqlSurfaceSpec pins row-for-row equality,
  *     doubles bit-for-bit).
  *
  * Dialect note: the book fragments live in [[BookSql]] in DuckDB
  * spelling so the oracle gate can run them; the only divergence is the
  * literal double cast (`0.5::DOUBLE` vs `0.5D`), handled by [[d]]. Keeping
  * one fragment source means the SQL surface cannot drift from the
  * oracle-pinned semantics.
  */
object SqlSurface {

  private val D = 5

  /** Register the ten testdata tables + the derived `book` as temp views
    * and ensure every native kernel is in the session's FunctionRegistry.
    * Idempotent; call once per (session, sfDir).
    */
  def registerViews(spark: SparkSession, sfDir: String): Unit = {
    Tables.names.foreach { t =>
      Tables(spark, sfDir, t).createOrReplaceTempView(t)
    }
    graft.functions.TextKernels.ensureRegistered(spark)
    graft.functions.DeepBookAgg.ensureRegistered(spark)
    graft.functions.RollingHash.ensureRegistered(spark)
    graft.functions.ExactTopK.ensureRegistered(spark)
    graft.functions.DecDot8.ensureRegistered(spark)
    graft.functions.OrdDot.ensureRegistered(spark)
    SyntheticBook.fromEvents(Tables(spark, sfDir, "events"), D)
      .createOrReplaceTempView("book")
    // dedup_components is NOT registered here: its first materialization
    // runs the whole LSH + CC machinery, which a q01 user never needs —
    // [[run]] registers it on demand (or call [[registerDedupComponents]]
    // directly before issuing your own dedup SQL).
  }

  /** Register `dedup_components(doc_id, group_id)` (memoized per
    * session + sfDir; see [[dedupComponents]]).
    */
  def registerDedupComponents(spark: SparkSession, sfDir: String): Unit =
    dedupComponents(spark, sfDir).createOrReplaceTempView("dedup_components")

  /** MinHash-LSH verified near-dup EDGES, written in plain Spark SQL over
    * the registered kernels (`minhash_spans` signatures → 4×4 banding →
    * hot-bucket-guarded band self-join → exact `shingle_overlap` Jaccard
    * ≥ 0.8) — the SQL spelling of `TextQueries.dedupCandidates/
    * scoredPairs`, step for step, including the ≤256 hot-bucket star
    * fallback.
    */
  private val dedupEdgeSql: String = {
    val bandCols = (0 to 3).map { k =>
      val parts = (1 to 4).map(j => s"element_at(sig, ${4 * k + j})").mkString(", ")
      s"md5(CAST(concat($parts) AS BINARY)) AS b$k"
    }.mkString(",\n        ")
    s"""WITH sig AS (
      SELECT doc_id, minhash_spans(text, 8, 4) AS sig FROM documents
    ), bh4 AS (
      SELECT doc_id,
        $bandCols
      FROM sig
    ), bands AS (
      SELECT doc_id, band_idx, bh,
        COUNT(*) OVER (PARTITION BY band_idx, bh) AS bsz,
        MIN(doc_id) OVER (PARTITION BY band_idx, bh) AS bmin
      FROM bh4 LATERAL VIEW posexplode(array(b0, b1, b2, b3)) AS band_idx, bh
    ), cand AS (
      SELECT DISTINCT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.bh = b.bh AND a.doc_id < b.doc_id
        WHERE a.bsz <= 256
        UNION ALL
        SELECT bmin, doc_id FROM bands WHERE bsz > 256 AND doc_id != bmin
      )
    ), scored AS (
      SELECT c.id_a, c.id_b, shingle_overlap(a.text, b.text, 8) AS ov
      FROM cand c
      JOIN documents a ON a.doc_id = c.id_a
      JOIN documents b ON b.doc_id = c.id_b
    )
    SELECT id_a, id_b FROM scored
    WHERE ov.n_union > 0 AND CAST(ov.n_inter AS DOUBLE) / ov.n_union >= 0.8D"""
  }

  /** `dedup_components(doc_id, group_id)` — the q48/q51 group labels for
    * the SQL surface. The verified edge set is computed by
    * [[dedupEdgeSql]] (pure SQL over the kernels); the one step SQL
    * cannot express is the transitive closure — Spark 4's recursive CTEs
    * support UNION ALL only, which never terminates on a cyclic edge
    * relation — so that single step runs through the engine's
    * distributed alternating-star connected components, exactly as the
    * DataFrame catalog path does. Memoized + checkpointed per
    * (session, sfDir): two longs per doc, no executor storage pinned.
    */
  private def dedupComponents(spark: SparkSession, sfDir: String): DataFrame =
    graft.util.SessionMemo.getOrCompute(spark, s"sql-dedup-components:$sfDir") {
      val edges = spark.sql(dedupEdgeSql)
      val (labels, _) = graft.graph.ConnectedComponents.label(
        edges, Tables(spark, sfDir, "documents").select("doc_id"))
      graft.util.Ckpt.ensureDir(spark.sparkContext)
      val out = labels.select(
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("comp").as("group_id")).checkpoint()
      labels.unpersist()
      out
    }

  /** DuckDB literal-cast spelling → Spark double-literal suffix. The
    * fragments only ever use `::DOUBLE` on numeric literals.
    */
  private def d(frag: String): String = frag.replace("::DOUBLE", "D")

  // Spark-SQL spellings of the Exact.*Fast aggregation recipe (the same
  // registered kernels the Column builders call via call_function).
  private def sumFast(term: String, scale: Int): String =
    s"unscaled_dbl(SUM(dec_unscaled($term, $scale)), $scale, $scale)"
  private def sumFastR(term: String, termScale: Int, outScale: Int): String =
    s"unscaled_dbl(SUM(dec_unscaled($term, $termScale)), $termScale, $outScale)"
  private def avgFast(term: String, scale: Int): String =
    s"(${sumFast(term, scale)} / COUNT($term))"

  private val disc = "l_extendedprice * (1 - l_discount)"
  private val winSql = "(PARTITION BY sym ORDER BY seq)"
  private val runSql =
    "(PARTITION BY sym ORDER BY seq ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"

  /** Spark-SQL text per catalog query name. Every entry runs via
    * `spark.sql` after [[registerViews]] and matches the DataFrame
    * catalog output row-for-row.
    */
  val texts: Map[String, String] = Map(
    // ---- vec family: the exact-decimal kernel from plain SQL --------
    "q34_embedding_stats" ->
      s"""SELECT vec_id, label,
        CAST(size(embedding) AS BIGINT) AS dim,
        dec_dot8(embedding, embedding) AS norm2,
        sqrt(dec_dot8(embedding, embedding)) AS norm,
        CAST(aggregate(embedding, CAST(0 AS DECIMAL(30,8)), (acc, x) ->
          CAST(acc + CAST(round(CAST(x AS DOUBLE), 8) AS DECIMAL(30,8)) AS DECIMAL(30,8))) AS DOUBLE) AS comp_sum,
        CAST(array_min(embedding) AS DOUBLE) AS comp_min,
        CAST(array_max(embedding) AS DOUBLE) AS comp_max
      FROM embeddings ORDER BY vec_id""",

    "q36_knn_bruteforce" ->
      s"""WITH en AS (
        SELECT vec_id, embedding, dec_dot8(embedding, embedding) AS n2 FROM embeddings
      ), p AS (
        SELECT q.vec_id AS q_id, c.vec_id AS c_id, q.n2 AS qn2, c.n2 AS cn2,
          dec_dot8(q.embedding, c.embedding) AS dot
        FROM en q JOIN en c ON c.vec_id != q.vec_id
        WHERE q.vec_id < 8
      ), sc AS (
        SELECT q_id, c_id,
          CASE WHEN qn2 > 0 AND cn2 > 0 THEN dot / (sqrt(qn2) * sqrt(cn2)) END AS cos_sim
        FROM p
      ), r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rnk FROM sc
      )
      SELECT q_id, CAST(rnk AS BIGINT) AS rnk, c_id, cos_sim
      FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""",

    // ---- impact family: schedule + ladder walk + fees, in plain SQL --
    // (the unrolled walk CTEs come from Impact.walkLayersSql — the SAME
    // fragment source as the DuckDB oracle mirror, dialect-translated by
    // d(); schedule spelled with Spark's DIV + LATERAL VIEW explode)
    "q23_impact_twap_slices" -> d(s"""WITH bn AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY sym ORDER BY seq) AS rn,
               COUNT(*) OVER (PARTITION BY sym) AS n
        FROM book
      ), sn AS (SELECT DISTINCT sym, n FROM bn),
      sched AS (
        SELECT sym, n, i, (i * (n - 1)) DIV 19 AS pos
        FROM sn LATERAL VIEW explode(sequence(CAST(0 AS BIGINT), CAST(19 AS BIGINT))) t AS i
      ), sl AS (
        SELECT b.*, s.i,
          CASE WHEN s.i = 19 THEN 50.0::DOUBLE - (50.0::DOUBLE / 20.0::DOUBLE) * 19
               ELSE 50.0::DOUBLE / 20.0::DOUBLE END AS slice_target
        FROM bn b JOIN sched s ON b.sym = s.sym AND b.rn - 1 = s.pos
      ),
      ${graft.impact.Impact.walkLayersSql("sl", "ask", "slice_target", 5)},
      tw AS (SELECT *, ${BookSql.mid} AS mid,
               walk_vwap * (1.0::DOUBLE + 5.0::DOUBLE / 10000.0::DOUBLE) AS slice_vwap_fee
             FROM walked),
      tw2 AS (SELECT *,
               CASE WHEN mid != 0 THEN 10000.0::DOUBLE * (slice_vwap_fee / mid - 1) END AS slip_bps
              FROM tw)
      SELECT sym, i, seq, slice_target, filled, walk_vwap, slice_vwap_fee,
             levels_touched, slip_bps
      FROM tw2 ORDER BY sym, i"""),

    "q24_impact_twap_summary" -> d(s"""WITH bn AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY sym ORDER BY seq) AS rn,
               COUNT(*) OVER (PARTITION BY sym) AS n
        FROM book
      ), sn AS (SELECT DISTINCT sym, n FROM bn),
      sched AS (
        SELECT sym, n, i, (i * (n - 1)) DIV 19 AS pos
        FROM sn LATERAL VIEW explode(sequence(CAST(0 AS BIGINT), CAST(19 AS BIGINT))) t AS i
      ), sl AS (
        SELECT b.*, s.i,
          CASE WHEN s.i = 19 THEN 50.0::DOUBLE - (50.0::DOUBLE / 20.0::DOUBLE) * 19
               ELSE 50.0::DOUBLE / 20.0::DOUBLE END AS slice_target
        FROM bn b JOIN sched s ON b.sym = s.sym AND b.rn - 1 = s.pos
      ),
      ${graft.impact.Impact.walkLayersSql("sl", "ask", "slice_target", 5)},
      tw2 AS (SELECT *, ${BookSql.mid} AS mid FROM walked),
      summary AS (
        SELECT sym, COUNT(*) AS n_slices,
          ${sumFast("filled", 6)} AS filled_qty,
          ${sumFast("cost5", 6)} AS notional,
          CAST(SUM(levels_touched) AS DOUBLE) / COUNT(*) AS avg_levels
        FROM tw2 GROUP BY sym),
      oc AS (
        SELECT sym, min_by(mid, seq) AS mid_open, max_by(mid, seq) AS mid_close
        FROM tw2 WHERE mid IS NOT NULL GROUP BY sym),
      j AS (
        SELECT s.*, oc.mid_open, oc.mid_close,
          CASE WHEN filled_qty > 0 THEN notional / filled_qty END AS exec_vwap
        FROM summary s JOIN oc USING (sym))
      SELECT sym, n_slices, filled_qty, notional, exec_vwap, avg_levels, mid_open, mid_close,
        CASE WHEN mid_open != 0 THEN 10000.0::DOUBLE * (exec_vwap / mid_open - 1) END AS slip_open_bps,
        CASE WHEN mid_close != 0 THEN 10000.0::DOUBLE * (exec_vwap / mid_close - 1) END AS slip_close_bps
      FROM j ORDER BY sym"""),

    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
        ${sumFast("l_quantity", 2)} AS sum_qty,
        ${sumFast("l_extendedprice", 2)} AS sum_base_price,
        ${sumFastR(disc, 4, 2)} AS sum_disc_price,
        ${sumFastR(s"$disc * (1 + l_tax)", 6, 2)} AS sum_charge,
        ${avgFast("l_quantity", 2)} AS avg_qty,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q02_top_revenue_orders" ->
      s"""SELECT o_orderkey, date_format(o_orderdate, 'yyyy-MM-dd') AS o_date,
        ${sumFastR(disc, 4, 2)} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < '1997-06-01'
        AND l_shipdate > '1997-06-01'
      GROUP BY o_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderkey
      LIMIT 10""",

    "q03_region_revenue" ->
      s"""SELECT r_name, n_name, ${sumFastR(disc, 4, 2)} AS revenue,
        COUNT(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE o_orderdate >= '1997-01-01' AND o_orderdate < '1998-01-01'
        AND r_name IN ('ASIA', 'EUROPE')
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name""",

    "q04_active_segment_stats" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n_customers,
        ${sumFast("c_acctbal", 2)} AS sum_acctbal
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",

    "q05_inactive_customers" ->
      s"""SELECT n_name, COUNT(*) AS n_customers,
        ${sumFast("c_acctbal", 2)} AS sum_acctbal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      GROUP BY n_name
      ORDER BY n_name""",

    "q06_rollup_lineitem" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
        COALESCE(l_linestatus, 'ALL') AS lstatus,
        COUNT(*) AS n, ${sumFast("l_quantity", 2)} AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY rflag, lstatus""",

    "q11_book_row_metrics" ->
      d(s"""WITH s1 AS (
        SELECT *,
          ${BookSql.slopeLayer1("bid", D)},
          ${BookSql.slopeLayer1("ask", D)}
        FROM book
      ),
      s2 AS (
        SELECT *,
          ${BookSql.slopeLayer2("bid", D)},
          ${BookSql.slopeLayer2("ask", D)}
        FROM s1
      )
      SELECT seq, sym,
        ${BookSql.spread} AS spread,
        ${BookSql.mid} AS mid,
        ${BookSql.relSpreadBpsStrict} AS relative_spread_bps,
        ${BookSql.microprice} AS microprice,
        ${BookSql.micropriceImbalanceBps} AS microprice_imbalance_bps,
        ${BookSql.imbalanceL1} AS imbalance_l1,
        ${BookSql.imbalanceDepthK(D)} AS imbalance_k,
        ${BookSql.notionalDepth("bid", D)} AS notional_bid_k,
        ${BookSql.notionalDepth("ask", D)} AS notional_ask_k,
        ${BookSql.slopeFinal("bid", D)} AS slope_bid,
        ${BookSql.slopeFinal("ask", D)} AS slope_ask
      FROM s2
      ORDER BY seq"""),

    "q12_spread_flavors" ->
      d(s"""SELECT seq, sym,
        ${BookSql.relSpreadBpsStrict} AS spread_bps_strict,
        ${BookSql.relSpreadBpsVector} AS spread_bps_vector,
        ${BookSql.spreadBpsEvent} AS spread_bps_event,
        CAST(best_bid > best_ask AS INT) AS is_crossed,
        CAST(best_bid = best_ask AS INT) AS is_locked
      FROM book
      ORDER BY seq"""),

    "q13_ofi_l1_strict" ->
      d(s"""WITH lagged AS (
        SELECT *, ${BookSql.lagLayer}
        FROM book WINDOW w AS $winSql
      ),
      o AS (SELECT seq, sym, ${BookSql.ofiL1Strict} AS ofi_l1 FROM lagged)
      SELECT seq, sym, ofi_l1, SUM(ofi_l1) OVER $runSql AS ofi_cum
      FROM o ORDER BY seq"""),

    "q14_ofi_event" ->
      d(s"""WITH lagged AS (
        SELECT *, ${BookSql.lagLayer}
        FROM book WINDOW w AS $winSql
      ),
      o AS (SELECT seq, sym, ${BookSql.ofiEvent} AS ofi_event FROM lagged)
      SELECT seq, sym, ofi_event, SUM(ofi_event) OVER $runSql AS ofi_event_cum
      FROM o ORDER BY seq"""),

    "q15_ofi_lobster" ->
      d(s"""WITH lagged AS (
        SELECT *, ${BookSql.lagLayer}
        FROM book WINDOW w AS $winSql
      ),
      o AS (SELECT seq, sym, ${BookSql.ofiLobster} AS ofi_lob FROM lagged)
      SELECT seq, sym, ofi_lob, SUM(ofi_lob) OVER $runSql AS ofi_lob_cum
      FROM o ORDER BY seq"""),

    "q17_realized_variance" ->
      d(s"""WITH m AS (SELECT seq, sym, ${BookSql.mid} AS mid FROM book),
      p AS (SELECT seq, sym, 100.0::DOUBLE + mid / 100.0::DOUBLE AS px FROM m),
      r AS (
        SELECT seq, sym, px,
          CASE WHEN px > 0 AND LAG(px, 1) OVER w > 0
               THEN px / LAG(px, 1) OVER w - 1 END AS ret
        FROM p WINDOW w AS $winSql
      )
      SELECT seq, sym, px, ret,
        CASE WHEN COUNT(ret) OVER f = 20
             THEN CAST(SUM(CAST(ROUND(ret * ret, 12) AS DECIMAL(38,12))) OVER f AS DOUBLE) END AS rv20
      FROM r
      WINDOW f AS (PARTITION BY sym ORDER BY seq ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
      ORDER BY seq"""),

    "q27_text_stats" ->
      s"""WITH tk AS (
        SELECT doc_id, lang, source, length(trim(text)) AS trimmed_len,
          split(trim(lower(text)), '\\\\s+') AS toks
        FROM documents
      ), b AS (
        SELECT doc_id, lang, source,
          CASE WHEN trimmed_len = 0 THEN 0L ELSE CAST(size(toks) AS BIGINT) END AS n_tokens,
          aggregate(toks, 0L, (acc, x) -> acc + length(x)) AS chars_no_ws,
          CAST(size(filter(toks, x -> x = 'the' OR x = 'and' OR x = 'of')) AS BIGINT) AS n_stopwords
        FROM tk
      ), r AS (
        SELECT *,
          CASE WHEN n_tokens > 0 THEN CAST(chars_no_ws AS DOUBLE) / n_tokens END AS avg_token_len,
          CASE WHEN n_tokens > 0 THEN CAST(n_stopwords AS DOUBLE) / n_tokens END AS stop_ratio
        FROM b
      )
      SELECT doc_id, lang, source, n_tokens, chars_no_ws, n_stopwords,
        avg_token_len, stop_ratio,
        CASE WHEN n_tokens > 0
             THEN 0.5D * least(1.0D, n_tokens / 200.0D)
                + 0.3D * least(1.0D, stop_ratio * 10.0D)
                + 0.2D * least(1.0D, chars_no_ws / 400.0D)
             ELSE 0.0D END AS quality_score
      FROM r ORDER BY doc_id""",

    "q29_exact_dedup" ->
      s"""SELECT md5(CAST(text AS BINARY)) AS fp, COUNT(*) AS n_docs,
        MIN(doc_id) AS keep_id, SUM(n_chars) AS total_chars
      FROM documents
      GROUP BY md5(CAST(text AS BINARY))
      ORDER BY fp""",

    "q30_shingle_stats" ->
      s"""SELECT doc_id, sa.n_positions AS n_positions, sa.n_distinct AS n_distinct,
        CAST(sa.n_distinct AS DOUBLE) / sa.n_positions AS distinct_ratio
      FROM (SELECT doc_id, shingle_agg(text, 8) AS sa FROM documents)
      ORDER BY doc_id""",

    "q31_minhash_signatures" ->
      s"""SELECT doc_id, mh0, mh1, mh2, mh3,
        md5(CAST(concat(mh0, mh1, mh2, mh3) AS BINARY)) AS band
      FROM (SELECT doc_id,
              element_at(sig, 1) AS mh0, element_at(sig, 2) AS mh1,
              element_at(sig, 3) AS mh2, element_at(sig, 4) AS mh3
            FROM (SELECT doc_id, minhash_spans(text, 8, 0) AS sig
                  FROM documents))
      ORDER BY doc_id""",

    "q07_customer_running_spend" ->
      s"""SELECT o_custkey, o_orderkey, date_format(o_orderdate, 'yyyy-MM-dd') AS o_date,
        o_totalprice,
        CAST(ROW_NUMBER() OVER w AS BIGINT) AS order_seq,
        CAST(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(38,2)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, order_seq""",

    "q08_events_minute_agg" ->
      s"""SELECT (ts div 1000) div 60000000 AS minute, event_type,
        COUNT(*) AS n,
        ${sumFast("value", 2)} AS sum_value,
        MIN(value) AS min_value, MAX(value) AS max_value
      FROM events
      GROUP BY (ts div 1000) div 60000000, event_type
      ORDER BY minute, event_type""",

    "q09_events_sessionize" ->
      s"""WITH ev AS (
        SELECT user_id, event_id, ts div 1000 AS ts_us, value FROM events
      ), flagged AS (
        SELECT *, CASE WHEN ts_us - LAG(ts_us, 1) OVER w IS NULL
                         OR ts_us - LAG(ts_us, 1) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
      ), sessions AS (
        SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
      )
      SELECT user_id, session_id, COUNT(*) AS n_events,
        MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us,
        ${sumFast("value", 2)} AS session_value
      FROM sessions
      GROUP BY user_id, session_id
      ORDER BY user_id, session_id""",

    // reset-on-gap realized variance as one WINDOW chain: the gap-group
    // id is itself a running window count, then the RV window partitions
    // by (sym, gap_grp) — no intermediate materialization needed.
    "q18_rv_reset_on_gap" ->
      d(s"""WITH m AS (SELECT seq, sym, ${BookSql.mid} AS mid FROM book),
      p AS (SELECT seq, sym, 100.0::DOUBLE + mid / 100.0::DOUBLE AS px FROM m),
      r AS (
        SELECT seq, sym, px,
          CASE WHEN px > 0 AND LAG(px, 1) OVER w > 0
               THEN px / LAG(px, 1) OVER w - 1 END AS ret
        FROM p WINDOW w AS $winSql
      ),
      g AS (
        SELECT *, COUNT(CASE WHEN ret IS NULL THEN 1 END) OVER $runSql AS gap_grp
        FROM r
      )
      SELECT seq, sym, ret, gap_grp,
        CASE WHEN ret IS NOT NULL AND COUNT(ret) OVER f = 20
             THEN CAST(SUM(CAST(ROUND(ret * ret, 12) AS DECIMAL(38,12))) OVER f AS DOUBLE) END AS rv20
      FROM g
      WINDOW f AS (PARTITION BY sym, gap_grp ORDER BY seq ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
      ORDER BY seq"""),

    // ladder walk through the native deep_book_agg kernel (one compiled
    // fold per side): skip-blank flavor on the raw ladder, stop-at-first-
    // blank/zero flavor on the chain-masked ladder — masking a level to
    // NULL once any level above it is blank/zero makes the kernel's
    // skip semantics reproduce the stop walk exactly (Impact.withStopMask
    // is the Column-side twin of the mask below).
    "q22_book_walk" -> {
      def ladder(side: String, maskStop: Boolean): String =
        (1 to D).map { k =>
          val chain = (1 to k).map(j =>
            s"$side${j}_price IS NOT NULL AND $side${j}_size IS NOT NULL AND $side${j}_size > 0")
            .mkString(" AND ")
          if (maskStop)
            s"named_struct('price', CASE WHEN $chain THEN $side${k}_price END, " +
              s"'size', CASE WHEN $chain THEN $side${k}_size END)"
          else
            s"named_struct('price', $side${k}_price, 'size', $side${k}_size)"
        }.mkString("array(", ", ", ")")
      s"""WITH arr AS (
        SELECT seq, sym,
          ${ladder("bid", maskStop = false)} AS bids,
          ${ladder("ask", maskStop = false)} AS asks,
          ${ladder("ask", maskStop = true)} AS stop_asks
        FROM book
      ), m AS (
        SELECT seq, sym,
          deep_book_agg(bids, asks, CAST(3.7 AS DOUBLE)) AS w,
          deep_book_agg(bids, stop_asks, CAST(3.7 AS DOUBLE)) AS sw
        FROM arr
      )
      SELECT seq, sym,
        w.walk_filled AS filled,
        CASE WHEN w.walk_filled > 0 THEN w.walk_cost / w.walk_filled END AS walk_vwap,
        w.walk_touched AS levels_touched,
        sw.walk_filled AS stop_filled,
        CASE WHEN sw.walk_filled > 0 THEN sw.walk_cost / sw.walk_filled END AS stop_walk_vwap,
        sw.walk_touched AS stop_levels_touched
      FROM m ORDER BY seq"""
    },

    // MinHash-LSH dedup over the on-demand dedup_components view: the
    // candidate generation + Jaccard verify run as SQL over the
    // minhash_spans / shingle_overlap kernels (see dedupEdgeSql); only
    // the transitive closure itself comes from the engine's distributed
    // connected components.
    "q48_minhash_lsh_dedup" ->
      s"""SELECT c.doc_id, c.group_id,
        CAST(c.doc_id = c.group_id AS INT) AS is_kept, gs.group_size
      FROM dedup_components c
      JOIN (SELECT group_id, COUNT(*) AS group_size
            FROM dedup_components GROUP BY group_id) gs
        USING (group_id)
      ORDER BY doc_id""",

    "q51_dedup_keep_longest" ->
      s"""WITH scored AS (
        SELECT c.doc_id, c.group_id, d.n_chars
        FROM dedup_components c JOIN documents d USING (doc_id)
      ), best AS (
        SELECT group_id, MAX(n_chars) AS best_chars FROM scored GROUP BY group_id
      ), keep AS (
        SELECT s.group_id, MIN(s.doc_id) AS keep_id
        FROM scored s JOIN best b
          ON b.group_id = s.group_id AND s.n_chars = b.best_chars
        GROUP BY s.group_id
      )
      SELECT s.doc_id, s.group_id, s.n_chars, k.keep_id,
        CAST(s.doc_id = k.keep_id AS INT) AS is_kept
      FROM scored s JOIN keep k USING (group_id)
      ORDER BY s.doc_id""",

    // Rabin–Karp fingerprinting through the native rolling_hash kernel.
    "q53_rolling_fingerprint" ->
      s"""SELECT doc_id, rh.doc_fp AS doc_fp,
        CAST(size(rh.wins) AS BIGINT) AS n_windows,
        CAST(size(array_distinct(rh.wins)) AS BIGINT) AS n_distinct_win
      FROM (SELECT doc_id, rolling_hash(text, 8, 131, 1000000007) AS rh FROM documents)
      ORDER BY doc_id""",

    // exact per-group top-k through the native exact_topk typed aggregate
    // (map-side combinable O(k) buffers, SQL-callable).
    "q56_topk_typed_agg" ->
      s"""WITH t AS (
        SELECT o_orderpriority, exact_topk(o_totalprice, 5) AS topk
        FROM orders GROUP BY o_orderpriority
      )
      SELECT o_orderpriority, CAST(pos0 + 1 AS BIGINT) AS rnk, price
      FROM t LATERAL VIEW posexplode(topk) AS pos0, price
      ORDER BY o_orderpriority, rnk""",

    "q176_ohlc_bars" ->
      d(s"""WITH m AS (
        SELECT sym, seq, ts_us div 3600000000 AS bar, ${BookSql.mid} AS mid,
          CAST(COALESCE(bid1_size, 0.0::DOUBLE) + COALESCE(ask1_size, 0.0::DOUBLE) AS BIGINT) AS vol
        FROM book
        WHERE ${BookSql.mid} IS NOT NULL
      ), agg AS (
        SELECT sym, bar,
          min_by(mid, seq) AS open,
          MAX(mid) AS high,
          MIN(mid) AS low,
          max_by(mid, seq) AS close,
          COUNT(*) AS n_ticks,
          SUM(vol) AS l1_volume,
          CAST(ROUND(SUM(CAST(ROUND(mid * vol, 6) AS DECIMAL(38,6))), 6) AS DOUBLE) AS pv
        FROM m GROUP BY sym, bar
      )
      SELECT sym, bar, open, high, low, close, n_ticks, l1_volume,
        CASE WHEN l1_volume > 0 THEN pv / l1_volume END AS bar_vwap
      FROM agg ORDER BY sym, bar"""))

  /** Run one surface query end-to-end: register views, execute the text. */
  def run(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    registerViews(spark, sfDir)
    if (texts(name).contains("dedup_components"))
      registerDedupComponents(spark, sfDir)
    spark.sql(texts(name))
  }
}
