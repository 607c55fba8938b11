package graft.impact

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-impact execution primitives (SURVEY.md §2.8).
  *
  * The ladder walk (X1, `/root/reference/src/market_microstructure_toolkit/
  * impact.py:111-145`) is row-local and embarrassingly parallel: each row
  * consumes its own ladder best→worse with
  * `take = min(remaining, max(0, avail))`, skipping blank levels
  * (`impact.py:74-108` skip-blank flavor), partial fill at the last
  * touched level, `filled = qty − remaining`, `vwap = Σp·take/filled`.
  *
  * Two implementations with identical semantics:
  *   - [[walkLayers]]: per-level named columns over the wide schema —
  *     codegen-friendly scalar chain, and the form mirrored by the DuckDB
  *     oracle SQL ([[walkLayersSql]]).
  *   - [[walkArray]]: `aggregate()` higher-order fold over the
  *     `ARRAY<STRUCT<price,size>>` compute schema — generic in K, the
  *     scale path for deep books (no 4K-wide codegen).
  */
object Impact {

  /** Append take/rem/cost/tch columns per level plus `filled`,
    * `walk_vwap`, `levels_touched`. `qtyCol` is the per-row target.
    */
  def walkLayers(df: DataFrame, side: String, qtyCol: Column, depth: Int,
                 pfx: String = ""): DataFrame = {
    var d = df
      .withColumn(s"${pfx}rem0", qtyCol)
      .withColumn(s"${pfx}cost0", lit(0.0))
      .withColumn(s"${pfx}tch0", lit(0))
    for (k <- 1 to depth) {
      // cast("double"): no-op for typed inputs, parses CSV string columns
      val p = col(s"$side${k}_price").cast("double")
      val sz = col(s"$side${k}_size").cast("double")
      val valid = p.isNotNull && sz.isNotNull
      d = d
        .withColumn(s"${pfx}take$k",
          when(valid && col(s"${pfx}rem${k - 1}") > 0,
            least(col(s"${pfx}rem${k - 1}"), greatest(lit(0.0), sz))).otherwise(lit(0.0)))
        .withColumn(s"${pfx}rem$k", col(s"${pfx}rem${k - 1}") - col(s"${pfx}take$k"))
        .withColumn(s"${pfx}cost$k", col(s"${pfx}cost${k - 1}") +
          when(col(s"${pfx}take$k") > 0, p * col(s"${pfx}take$k")).otherwise(lit(0.0)))
        .withColumn(s"${pfx}tch$k", col(s"${pfx}tch${k - 1}") +
          when(col(s"${pfx}take$k") > 0, lit(1)).otherwise(lit(0)))
    }
    d.withColumn(s"${pfx}filled", qtyCol - col(s"${pfx}rem$depth"))
      .withColumn(s"${pfx}walk_vwap", when(col(s"${pfx}filled") > 0, col(s"${pfx}cost$depth") / col(s"${pfx}filled")))
      .withColumn(s"${pfx}levels_touched", col(s"${pfx}tch$depth"))
  }

  /** DuckDB mirror of [[walkLayers]] as CTE text: emits
    * `w0 AS (SELECT *, {qty} AS rem0, ... FROM {src}), w1 AS (...), ...`
    * and a final `walked` CTE with filled/walk_vwap/levels_touched.
    */
  def walkLayersSql(src: String, side: String, qtySql: String, depth: Int,
                    pfx: String = ""): String = {
    val sb = new StringBuilder
    sb.append(s"${pfx}w0 AS (SELECT *, $qtySql AS ${pfx}rem0, 0.0::DOUBLE AS ${pfx}cost0, 0 AS ${pfx}tch0 FROM $src)")
    for (k <- 1 to depth) {
      val p = s"$side${k}_price"; val s = s"$side${k}_size"
      sb.append(s""",
    $pfx${"w"}${k}a AS (SELECT *,
      CASE WHEN $p IS NOT NULL AND $s IS NOT NULL AND ${pfx}rem${k - 1} > 0
           THEN least(${pfx}rem${k - 1}, greatest(0.0::DOUBLE, $s)) ELSE 0.0::DOUBLE END AS ${pfx}take$k
      FROM $pfx${"w"}${if (k == 1) "0" else s"${k - 1}b"}),
    $pfx${"w"}${k}b AS (SELECT *,
      ${pfx}rem${k - 1} - ${pfx}take$k AS ${pfx}rem$k,
      ${pfx}cost${k - 1} + CASE WHEN ${pfx}take$k > 0 THEN $p * ${pfx}take$k ELSE 0.0::DOUBLE END AS ${pfx}cost$k,
      ${pfx}tch${k - 1} + CASE WHEN ${pfx}take$k > 0 THEN 1 ELSE 0 END AS ${pfx}tch$k
      FROM $pfx${"w"}${k}a)""")
    }
    sb.append(s""",
    ${pfx}walked AS (SELECT *,
      ($qtySql) - ${pfx}rem$depth AS ${pfx}filled,
      CASE WHEN ($qtySql) - ${pfx}rem$depth > 0 THEN ${pfx}cost$depth / (($qtySql) - ${pfx}rem$depth) END AS ${pfx}walk_vwap,
      ${pfx}tch$depth AS ${pfx}levels_touched
      FROM $pfx${"w"}${depth}b)""")
    sb.toString
  }

  /** X2 stop-at-first-blank/zero ladder flavor (`impact_twap.py:66-98`):
    * append `stopmask_<side>K` columns where level k is visible only if
    * ALL levels 1..k are valid with positive size. Walking the masked
    * ladder with [[walkLayers]] reproduces the stop semantics.
    */
  def withStopMask(df: DataFrame, side: String, depth: Int): DataFrame = {
    var d = df
    var chain: Column = lit(true)
    for (k <- 1 to depth) {
      // cast("double") is a no-op on typed inputs (SimplifyCasts) and
      // parses the all-string CSV reading path (blanks arrive as NULL)
      val p = col(s"$side${k}_price").cast("double")
      val sz = col(s"$side${k}_size").cast("double")
      chain = chain && p.isNotNull && sz.isNotNull && sz > 0
      d = d.withColumn(s"stop$side${k}_price", when(chain, p))
        .withColumn(s"stop$side${k}_size", when(chain, sz))
    }
    d
  }

  /** SQL mirror of [[withStopMask]] as a single CTE body. */
  def stopMaskSql(src: String, side: String, depth: Int): String = {
    val cols = (1 to depth).map { k =>
      val chain = (1 to k).map(j =>
        s"$side${j}_price IS NOT NULL AND $side${j}_size IS NOT NULL AND $side${j}_size > 0")
        .mkString(" AND ")
      s"""CASE WHEN $chain THEN $side${k}_price END AS stop$side${k}_price,
      CASE WHEN $chain THEN $side${k}_size END AS stop$side${k}_size"""
    }.mkString(",\n      ")
    s"stopmasked AS (SELECT *,\n      $cols\n      FROM $src)"
  }

  /** Generic-K walk over `ARRAY<STRUCT<price,size>>` via `aggregate()`:
    * returns STRUCT<filled, cost, touched>. Same semantics as
    * [[walkLayers]] (ScalaTest asserts equality).
    */
  def walkArray(ladder: Column, qty: Column): Column = {
    val acc0 = struct(qty.as("rem"), lit(0.0).as("cost"), lit(0).as("tch"))
    val folded = aggregate(ladder, acc0, (acc, x) => {
      val p = x.getField("price"); val sz = x.getField("size")
      val valid = p.isNotNull && sz.isNotNull
      val take = when(valid && acc.getField("rem") > 0,
        least(acc.getField("rem"), greatest(lit(0.0), sz))).otherwise(lit(0.0))
      struct(
        (acc.getField("rem") - take).as("rem"),
        (acc.getField("cost") + when(take > 0, p * take).otherwise(lit(0.0))).as("cost"),
        (acc.getField("tch") + when(take > 0, lit(1)).otherwise(lit(0))).as("tch"))
    })
    struct(
      (qty - folded.getField("rem")).as("filled"),
      folded.getField("cost").as("cost"),
      folded.getField("tch").as("touched"))
  }

  /** P20 slippage conventions (`impact.py:183-193` vs
    * `impact_twap.py:324-337` — they differ for sells, SURVEY §7.4.6).
    */
  def slippageBpsRatio(achieved: Column, reference: Column): Column =
    when(reference =!= 0, lit(1e4) * (achieved / reference - 1))

  def slippageBpsSigned(side: String, px: Column, ref: Column): Column =
    if (side == "buy") when(ref =!= 0, lit(1e4) * (px / ref - 1))
    else when(ref =!= 0, lit(1e4) * (lit(1) - px / ref))

  /** P21 fee fold (buy adds, TWAP folds into slice vwap). */
  def withFeeBps(vwap: Column, feeBps: Double): Column =
    vwap * (lit(1.0) + lit(feeBps) / lit(10000.0))
}
