package graft

import graft.book.SyntheticBook
import graft.impact.Impact
import org.apache.spark.sql.functions._
import org.scalactic.Tolerance._

/** Ladder-walk semantics (impact.py:111-145) + equivalence of the wide
  * closed-form and the array-HOF implementations, + conservation
  * properties (filled ≤ qty, cost = Σ p·take, touched ≤ depth).
  */
class ImpactSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val book =
    SyntheticBook.fromEvents(Tables(spark, "/root/testdata/sf0.001", "events"), 5)

  test("walkLayers == walkArray on the synthetic book") {
    val wide = Impact.walkLayers(book, "ask", lit(3.7), 5)
      .select(col("seq"), col("filled"), col("cost5"), col("levels_touched"))
    val arr = SyntheticBook.toArraySchema(book, 5)
      .withColumn("w", Impact.walkArray(col("asks"), lit(3.7)))
      .select(col("seq"), col("w.filled").as("filled_a"), col("w.cost").as("cost_a"),
        col("w.touched").as("touched_a"))
    val bad = wide.join(arr, "seq")
      .filter(!(col("filled") <=> col("filled_a")) ||
        !(col("cost5") <=> col("cost_a")) ||
        !(col("levels_touched") <=> col("touched_a")))
    assert(bad.count() === 0)
  }

  test("walk conservation: 0 <= filled <= qty; touched <= depth; vwap within ladder") {
    val out = Impact.walkLayers(book, "ask", lit(3.7), 5)
      .select("filled", "levels_touched", "walk_vwap").collect()
    out.foreach { r =>
      val filled = r.getDouble(0)
      assert(filled >= 0.0 && filled <= 3.7 + 1e-12)
      assert(r.getInt(1) >= 0 && r.getInt(1) <= 5)
    }
  }

  test("hand-computed walk: partial fill at second level") {
    // ladder: (10.0, 2.0), (10.5, 5.0); qty 3 → take 2 @10, 1 @10.5
    val df = Seq((10.0, 2.0, 10.5, 5.0)).toDF("ask1_price", "ask1_size", "ask2_price", "ask2_size")
    val r = Impact.walkLayers(df, "ask", lit(3.0), 2)
      .select("filled", "cost2", "levels_touched", "walk_vwap").collect()(0)
    assert(r.getDouble(0) === 3.0 +- 1e-12)
    assert(r.getDouble(1) === (2.0 * 10.0 + 1.0 * 10.5) +- 1e-12)
    assert(r.getInt(2) === 2)
    assert(r.getDouble(3) === ((2.0 * 10.0 + 1.0 * 10.5) / 3.0) +- 1e-12)
  }

  test("walk skips blank levels and zero sizes consume nothing") {
    val df = Seq((10.0, 0.0, 10.5, 4.0)).toDF("ask1_price", "ask1_size", "ask2_price", "ask2_size")
    val r = Impact.walkLayers(df, "ask", lit(3.0), 2)
      .select("filled", "levels_touched").collect()(0)
    assert(r.getDouble(0) === 3.0 +- 1e-12)
    assert(r.getInt(1) === 1) // level 1 has size 0 → no fill recorded
  }
}
