package graft.sql

import graft.Tables
import graft.book.{BookSql, SyntheticBook}
import graft.impact.Impact
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
    SyntheticBook.fromEvents(Tables(spark, sfDir, "events"), D)
      .createOrReplaceTempView("book")
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
    spark.sql(texts(name))
  }
}
