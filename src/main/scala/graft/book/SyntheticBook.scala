package graft.book

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic order-book snapshot table derived from the `events` test
  * table, in the reference's flat fixed-width layout (SURVEY.md §1.1:
  * `/root/reference/src/market_microstructure_toolkit/record.py:46-52`,
  * 8 meta + 4K level columns; here the meta cols are `seq, sym, ts_us,
  * best_bid, best_ask`).
  *
  * The oracle driver can only query the shared parquet tables, so the book
  * is *derived*, not stored: every column is a pure scalar expression of
  * `events` so the DuckDB mirror ([[SyntheticBook.sqlCte]]) produces
  * bit-identical doubles. The two builders MUST stay in lock-step — edit
  * them together.
  *
  * Injected data-quality cases (exercising the reference's null/crossed
  * semantics, SURVEY §2.2/§7.4):
  *   - seq % 97 == 0  → best_bid NULL (gap rows for reset-on-gap RV)
  *   - seq % 101 == 0 → crossed book (bid > ask; P5 nulls it, P6 doesn't)
  *   - seq % 89 == 0  → best_ask NULL
  *   - per-level modular NULLs in prices and sizes
  * Sizes are integer-valued doubles so OFI running sums stay FP-exact.
  */
object SyntheticBook {

  /** Wide flat book derived from `events` (already nanosAsLong LONG ts). */
  def fromEvents(events: DataFrame, depth: Int): DataFrame = {
    val base = events.select(
      col("event_id").as("seq"),
      concat(lit("SYM"), (col("user_id") % 4).cast("string")).as("sym"),
      expr("ts div 1000").as("ts_us"),
      col("value").as("v"))
      .withColumn("bb0", col("v") - lit(0.005) * (lit(1) + col("seq") % 3))
      .withColumn("ba0", col("v") + lit(0.005) * (lit(1) + col("seq") % 4))

    val bests = base
      .withColumn("best_bid",
        when(col("seq") % 97 === 0, lit(null).cast("double"))
          .when(col("seq") % 101 === 0, col("ba0") + lit(0.01))
          .otherwise(col("bb0")))
      .withColumn("best_ask",
        when(col("seq") % 89 === 0, lit(null).cast("double")).otherwise(col("ba0")))

    val levelCols: Seq[(String, Column)] = (1 to depth).flatMap { k =>
      Seq(
        s"bid${k}_price" -> when((col("seq") + lit(7 * k)) % 31 === 0, lit(null).cast("double"))
          .otherwise(col("best_bid") - lit(0.01) * lit(k - 1)),
        s"bid${k}_size" -> when((col("seq") + lit(3 * k)) % 29 === 0, lit(null).cast("double"))
          .otherwise((lit(1) + (col("seq") + lit(k)) % 7).cast("double")),
        s"ask${k}_price" -> when((col("seq") + lit(5 * k)) % 37 === 0, lit(null).cast("double"))
          .otherwise(col("best_ask") + lit(0.01) * lit(k - 1)),
        s"ask${k}_size" -> when((col("seq") + lit(2 * k)) % 23 === 0, lit(null).cast("double"))
          .otherwise((lit(1) + (col("seq") + lit(2 * k)) % 5).cast("double")))
    }
    val meta = Seq("seq", "sym", "ts_us", "best_bid", "best_ask").map(col)
    bests.select(meta ++ levelCols.map { case (n, c) => c.as(n) }: _*)
  }

  /** DuckDB mirror of [[fromEvents]] as a WITH-clause body; the final CTE
    * is named `book`. Fractional literals are cast to DOUBLE so DuckDB
    * doesn't evaluate them in DECIMAL (Spark literals are doubles).
    */
  def sqlCte(depth: Int): String = {
    val levels = (1 to depth).flatMap { k =>
      Seq(
        s"CASE WHEN (seq + ${7 * k}) % 31 = 0 THEN NULL ELSE best_bid - 0.01::DOUBLE * ${k - 1} END AS bid${k}_price",
        s"CASE WHEN (seq + ${3 * k}) % 29 = 0 THEN NULL ELSE CAST(1 + (seq + $k) % 7 AS DOUBLE) END AS bid${k}_size",
        s"CASE WHEN (seq + ${5 * k}) % 37 = 0 THEN NULL ELSE best_ask + 0.01::DOUBLE * ${k - 1} END AS ask${k}_price",
        s"CASE WHEN (seq + ${2 * k}) % 23 = 0 THEN NULL ELSE CAST(1 + (seq + ${2 * k}) % 5 AS DOUBLE) END AS ask${k}_size")
    }.mkString(",\n    ")
    s"""graft_base AS (
  SELECT event_id AS seq,
         'SYM' || CAST(user_id % 4 AS VARCHAR) AS sym,
         epoch_us(ts) AS ts_us,
         value AS v,
         value - 0.005::DOUBLE * (1 + event_id % 3) AS bb0,
         value + 0.005::DOUBLE * (1 + event_id % 4) AS ba0
  FROM events
),
graft_bests AS (
  SELECT seq, sym, ts_us,
         CASE WHEN seq % 97 = 0 THEN NULL
              WHEN seq % 101 = 0 THEN ba0 + 0.01::DOUBLE
              ELSE bb0 END AS best_bid,
         CASE WHEN seq % 89 = 0 THEN NULL ELSE ba0 END AS best_ask
  FROM graft_base
),
book AS (
  SELECT seq, sym, ts_us, best_bid, best_ask,
    $levels
  FROM graft_bests
)"""
  }

  /** Normalized array-schema view (SURVEY §1.4 compute schema):
    * `bids/asks ARRAY<STRUCT<price:DOUBLE, size:DOUBLE>>`. Depth-K loops
    * become higher-order functions and schema width stops depending on K —
    * this is the scale path for K≈100 books (codegen width limits).
    */
  def toArraySchema(wide: DataFrame, depth: Int): DataFrame = {
    def side(s: String) = array((1 to depth).map { k =>
      struct(col(s"$s${k}_price").as("price"), col(s"$s${k}_size").as("size"))
    }: _*)
    val levelCols = (1 to depth).flatMap(k =>
      Seq(s"bid${k}_price", s"bid${k}_size", s"ask${k}_price", s"ask${k}_size")).toSet
    val meta = wide.columns.filterNot(levelCols).map(col)
    wide.select(meta.toSeq ++ Seq(side("bid").as("bids"), side("ask").as("asks")): _*)
  }
}
