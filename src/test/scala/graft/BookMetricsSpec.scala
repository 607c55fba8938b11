package graft

import graft.book.{BookMetrics, SeriesMetrics, SyntheticBook}
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalactic.Tolerance._

/** Hand-computed expectations mirroring the reference's own unit tests
  * (`/root/reference/tests/test_metrics.py:29-150`, FIXTURES.md §F2).
  */
class BookMetricsSpec extends SparkTestBase {
  import spark.implicits._

  /** The reference's fake row: depth 3, bid2 valid, ask2/L3 blank. */
  private def fakeRow = {
    val cols = Seq("best_bid", "best_ask",
      "bid1_price", "bid1_size", "bid2_price", "bid2_size", "bid3_price", "bid3_size",
      "ask1_price", "ask1_size", "ask2_price", "ask2_size", "ask3_price", "ask3_size")
    val vals: Seq[java.lang.Double] = Seq(100.0, 100.1,
      100.0, 1.0, 99.9, 1.01, null, null,
      100.1, 0.5, null, null, null, null)
    val df = spark.createDataFrame(
      java.util.List.of(Row.fromSeq(vals)),
      org.apache.spark.sql.types.StructType(cols.map(c =>
        org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.DoubleType))))
    df
  }

  private def one(c: org.apache.spark.sql.Column): Option[Double] = {
    val r = fakeRow.select(c.as("v")).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("spread and mid (test_metrics.py:62-70)") {
    assert(one(BookMetrics.spread(col("best_bid"), col("best_ask"))).get === 0.1 +- 1e-12)
    assert(one(BookMetrics.mid(col("best_bid"), col("best_ask"))).get === 100.05 +- 1e-12)
  }

  test("imbalances (test_metrics.py:76-95)") {
    assert(one(BookMetrics.imbalanceL1(col("bid1_size"), col("ask1_size"))).get === (1.0 / 1.5) +- 1e-12)
    val bidSizes = (1 to 3).map(k => col(s"bid${k}_size"))
    val askSizes = (1 to 3).map(k => col(s"ask${k}_size"))
    assert(one(BookMetrics.imbalanceDepthK(bidSizes, askSizes)).get === (2.01 / 2.51) +- 1e-12)
  }

  test("notional depth skips blanks (test_metrics.py:100-113)") {
    def lv(s: String) = (1 to 3).map(k => (col(s"$s${k}_price"), col(s"$s${k}_size")))
    assert(one(BookMetrics.notionalDepth(lv("bid"))).get === (100.0 * 1.0 + 99.9 * 1.01) +- 1e-9)
    assert(one(BookMetrics.notionalDepth(lv("ask"))).get === (100.1 * 0.5) +- 1e-9)
  }

  test("book slope: bid defined with 2 valid levels, ask NULL (test_metrics.py:117-127)") {
    def lv(s: String) = (1 to 3).map(k => (col(s"$s${k}_price"), col(s"$s${k}_size")))
    // bid: x = [0, 0.1], y = [1.0, 2.01] → slope = cov/var = (2.01-1.0)/0.1… OLS two points
    val slope = one(BookMetrics.bookSlope(lv("bid"))).get
    assert(slope === ((2.01 - 1.0) / 0.1) +- 1e-9)
    assert(one(BookMetrics.bookSlope(lv("ask"))).isEmpty)
  }

  test("microprice + imbalance bps (test_metrics.py formulas)") {
    val mp = one(BookMetrics.microprice(col("best_bid"), col("best_ask"),
      col("bid1_size"), col("ask1_size"))).get
    assert(mp === ((100.1 * 1.0 + 100.0 * 0.5) / 1.5) +- 1e-12)
    val mpi = one(BookMetrics.micropriceImbalanceBps(col("best_bid"), col("best_ask"),
      col("bid1_size"), col("ask1_size"))).get
    assert(mpi === (1e4 * (mp - 100.05) / 100.05) +- 1e-9)
  }

  test("strict OFI pair → -0.8 (test_metrics.py:133-150)") {
    val df = Seq(
      ("A", 1L, 100.0, 1.0, 100.1, 1.0),
      ("A", 2L, 100.1, 1.2, 100.2, 0.9))
      .toDF("sym", "seq", "bid1_price", "bid1_size", "ask1_price", "ask1_size")
    val w = Window.partitionBy("sym").orderBy("seq")
    val out = df.withColumn("ofi", SeriesMetrics.ofiL1Strict(w)).orderBy("seq").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("ofi"))) // first row NULL
    assert(out(1).getDouble(out(1).fieldIndex("ofi")) === -0.8 +- 1e-12)
  }

  test("reset-on-gap RV restarts after a NULL mid (metrics.py:196-232)") {
    // prices: 10 valid, then a gap, then window-1 valid → RV NULL after gap
    val n = 12; val win = 3
    val rows = (1 to n).map { i =>
      val p: java.lang.Double = if (i == 6) null else 100.0 + i * 0.1
      (i.toLong, p)
    }
    val df = rows.toDF("seq", "px").withColumn("sym", lit("A"))
    val w = Window.partitionBy("sym").orderBy("seq")
    val prev = lag(col("px"), 1).over(w)
    val ret = when(col("px") > 0 && prev > 0, col("px") / prev - 1)
    val out = df.withColumn("ret", ret)
      .withColumn("g", SeriesMetrics.gapGroup(col("ret"), w))
      .withColumn("rv", SeriesMetrics.realizedVarResetOnGap(col("ret"),
        Window.partitionBy("sym", "g").orderBy("seq"), win))
      .orderBy("seq").collect()
    def rvAt(i: Int): Option[Double] = {
      val r = out(i - 1); if (r.isNullAt(r.fieldIndex("rv"))) None else Some(r.getDouble(r.fieldIndex("rv")))
    }
    assert(rvAt(3).isEmpty)  // warmup: rets at rows 2,3 only
    assert(rvAt(4).isDefined) // rets 2,3,4
    assert(rvAt(6).isEmpty)  // gap row
    assert(rvAt(7).isEmpty); assert(rvAt(8).isEmpty); assert(rvAt(9).isEmpty) // restart warmup
    assert(rvAt(10).isDefined) // rets 8,9,10
  }

  test("wide→array schema round-trip and array slope equals wide slope") {
    val events = Tables(spark, "/root/testdata/sf0.001", "events")
    val wide = SyntheticBook.fromEvents(events, 5)
    val arr = SyntheticBook.toArraySchema(wide, 5)
    val wideSlope = wide.select(col("seq"),
      BookMetrics.bookSlope(BookMetrics.bidLevels(5)).as("s"))
    val arrSlope = arr.select(col("seq"), BookMetrics.bookSlopeArray(col("bids")).as("s"))
    val joined = wideSlope.as("a").join(arrSlope.as("b"), "seq")
      .select(col("a.s").as("ws"), col("b.s").as("as"))
      .filter(!(col("ws") <=> col("as")) &&
        !(abs(col("ws") - col("as")) < 1e-9))
    assert(joined.count() === 0)
  }
}
