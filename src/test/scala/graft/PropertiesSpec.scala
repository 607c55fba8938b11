package graft

import graft.book.BookMetrics
import graft.impact.Impact
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants over randomly generated books (SURVEY §5
  * plan): imbalance ∈ [0,1], RV ≥ 0, walk conservation + monotonicity,
  * and partitioning-invariance of exact decimal aggregation. Generators
  * are sampled with fixed seeds (no scalatestplus bridge in the offline
  * dependency set).
  */
class PropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private val levelGen: Gen[(Option[Double], Option[Double])] = for {
    p <- Gen.option(Gen.choose(1.0, 1000.0))
    s <- Gen.option(Gen.choose(0.0, 50.0))
  } yield (p, s)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private def bookDfOf(rows: Seq[Seq[(Option[Double], Option[Double])]]) = {
    val flat = rows.zipWithIndex.map { case (lvls, i) =>
      (i.toLong,
        lvls(0)._1, lvls(0)._2, lvls(1)._1, lvls(1)._2, lvls(2)._1, lvls(2)._2)
    }
    flat.toDF("seq", "ask1_price", "ask1_size", "ask2_price", "ask2_size",
      "ask3_price", "ask3_size")
  }

  test("imbalance ∈ [0,1] or NULL; walk conserves and is monotone in qty (5 seeds × 60 rows)") {
    for (seed <- 1 to 5) {
      val rows = sample(Gen.listOfN(60, Gen.listOfN(3, levelGen).map(_.toSeq)), seed)
      val df = bookDfOf(rows)
      df.select(BookMetrics.imbalanceL1(col("ask1_size"), col("ask2_size")).as("i"))
        .collect().foreach { r =>
          if (!r.isNullAt(0)) assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
        }
      val w1 = Impact.walkLayers(df, "ask", lit(5.0), 3)
        .select(col("seq"), col("filled").as("f1"), col("cost3").as("c1"),
          col("walk_vwap").as("v1"))
      val w2 = Impact.walkLayers(df, "ask", lit(9.0), 3)
        .select(col("seq"), col("filled").as("f2"))
      w1.join(w2, "seq").collect().foreach { r =>
        val f1 = r.getAs[Double]("f1"); val f2 = r.getAs[Double]("f2")
        assert(f1 >= -1e-12 && f1 <= 5.0 + 1e-12)
        assert(f2 + 1e-12 >= f1, "monotone in qty")
        if (!r.isNullAt(r.fieldIndex("v1"))) {
          val v = r.getAs[Double]("v1"); val c = r.getAs[Double]("c1")
          assert(math.abs(v * f1 - c) <= 1e-9 * math.max(1.0, math.abs(c)), "vwap*filled = cost")
        }
      }
    }
  }

  test("exact decimal aggregation is invariant under repartitioning") {
    val values = sample(Gen.listOfN(500, Gen.choose(-1e6, 1e6)), 42L)
    val df = values.toDF("x")
    def total(parts: Int): Double =
      df.repartition(parts).agg(Exact.sumExact(col("x"), 4).as("s"))
        .collect()(0).getDouble(0)
    val t1 = total(1); val t7 = total(7); val t32 = total(32)
    assert(t1 === t7 && t7 === t32, s"$t1 / $t7 / $t32 must be bit-identical")
  }

  test("realized variance is non-negative; jaccard of a set with itself is 1") {
    val px = sample(Gen.listOfN(60, Gen.choose(50.0, 150.0)), 7L)
    val df = px.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("seq", "px")
      .withColumn("sym", lit("A"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("sym").orderBy("seq")
    val prev = lag(col("px"), 1).over(w)
    val ret = when(col("px") > 0 && prev > 0, col("px") / prev - 1)
    val out = df.withColumn("rv", graft.book.SeriesMetrics.realizedVar(ret, w, 10)).collect()
    out.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("rv"))) assert(r.getDouble(r.fieldIndex("rv")) >= 0.0)
    }

    val docs = Seq((1L, "abcdefghij klmnop qrstuv")).toDF("doc_id", "text")
    val sh = graft.text.TextMetrics.shingles(8)
    val j = docs.select(graft.text.TextMetrics.jaccard(sh, sh).as("j")).collect()(0).getDouble(0)
    assert(j === 1.0)
  }
}
