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
  def walkLayers(df: DataFrame, side: String, qtyCol: Column, depth: Int): DataFrame = {
    var d = df
      .withColumn("rem0", qtyCol)
      .withColumn("cost0", lit(0.0))
      .withColumn("tch0", lit(0))
    for (k <- 1 to depth) {
      val p = col(s"$side${k}_price"); val sz = col(s"$side${k}_size")
      val valid = p.isNotNull && sz.isNotNull
      d = d
        .withColumn(s"take$k",
          when(valid && col(s"rem${k - 1}") > 0,
            least(col(s"rem${k - 1}"), greatest(lit(0.0), sz))).otherwise(lit(0.0)))
        .withColumn(s"rem$k", col(s"rem${k - 1}") - col(s"take$k"))
        .withColumn(s"cost$k", col(s"cost${k - 1}") +
          when(col(s"take$k") > 0, p * col(s"take$k")).otherwise(lit(0.0)))
        .withColumn(s"tch$k", col(s"tch${k - 1}") +
          when(col(s"take$k") > 0, lit(1)).otherwise(lit(0)))
    }
    d.withColumn("filled", qtyCol - col(s"rem$depth"))
      .withColumn("walk_vwap", when(col("filled") > 0, col(s"cost$depth") / col("filled")))
      .withColumn("levels_touched", col(s"tch$depth"))
  }

  /** DuckDB mirror of [[walkLayers]] as CTE text: emits
    * `w0 AS (SELECT *, {qty} AS rem0, ... FROM {src}), w1 AS (...), ...`
    * and a final `walked` CTE with filled/walk_vwap/levels_touched.
    */
  def walkLayersSql(src: String, side: String, qtySql: String, depth: Int): String = {
    val sb = new StringBuilder
    sb.append(s"w0 AS (SELECT *, $qtySql AS rem0, 0.0::DOUBLE AS cost0, 0 AS tch0 FROM $src)")
    for (k <- 1 to depth) {
      val p = s"$side${k}_price"; val s = s"$side${k}_size"
      sb.append(s""",
    w${k}a AS (SELECT *,
      CASE WHEN $p IS NOT NULL AND $s IS NOT NULL AND rem${k - 1} > 0
           THEN least(rem${k - 1}, greatest(0.0::DOUBLE, $s)) ELSE 0.0::DOUBLE END AS take$k
      FROM w${if (k == 1) "0" else s"${k - 1}b"}),
    w${k}b AS (SELECT *,
      rem${k - 1} - take$k AS rem$k,
      cost${k - 1} + CASE WHEN take$k > 0 THEN $p * take$k ELSE 0.0::DOUBLE END AS cost$k,
      tch${k - 1} + CASE WHEN take$k > 0 THEN 1 ELSE 0 END AS tch$k
      FROM w${k}a)""")
    }
    sb.append(s""",
    walked AS (SELECT *,
      ($qtySql) - rem$depth AS filled,
      CASE WHEN ($qtySql) - rem$depth > 0 THEN cost$depth / (($qtySql) - rem$depth) END AS walk_vwap,
      tch$depth AS levels_touched
      FROM w${depth}b)""")
    sb.toString
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
