package graft

import graft.rel.ExactQuantile
import org.apache.spark.sql.functions._

/** Pins the distributed exact-quantile operator bit-for-bit against
  * Spark's built-in `percentile` (which buffers whole groups — the
  * thing ExactQuantile exists to avoid) across group shapes the rank
  * arithmetic must survive: interpolated and exact positions, ties
  * straddling range-partition split points, singleton groups, and
  * groups interleaved across many input partitions.
  */
class ExactQuantileSpec extends SparkTestBase {

  private val ps = Seq(0.0, 0.25, 0.5, 0.77, 0.95, 1.0)

  private def check(df: org.apache.spark.sql.DataFrame, nPart: Int): Unit = {
    val got = ExactQuantile.perGroup(df, "g", "v", ps, nPart)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val aggs = ps.map(p => expr(s"percentile(v, ${p}d)").as(s"p$p"))
    val want = df.groupBy("g")
      .agg(aggs.head, aggs.tail: _*)
      .collect().flatMap { r =>
        ps.zipWithIndex.map { case (p, i) => (r.getString(0), p) -> r.getDouble(i + 1) }
      }.toMap
    assert(got.keySet === want.keySet)
    for (k <- want.keySet)
      assert(java.lang.Double.doubleToLongBits(got(k)) ===
        java.lang.Double.doubleToLongBits(want(k)), s"quantile $k must be bit-identical")
  }

  test("matches built-in percentile bit-for-bit on mixed groups") {
    val sess = spark
    import sess.implicits._
    // deterministic pseudo-random values, 3 uneven groups, many ties
    val df = (0 until 5000).map { i =>
      (s"g${i % 3}", ((i * 2654435761L) % 9973).toDouble / 7.0)
    }.toDF("g", "v").repartition(16)
    check(df, 32)
  }

  test("singleton and tiny groups (every position is an endpoint)") {
    val sess = spark
    import sess.implicits._
    val df = Seq(("a", 42.0), ("b", 1.0), ("b", 2.0), ("c", 5.0), ("c", 5.0), ("c", 9.0))
      .toDF("g", "v").repartition(8)
    check(df, 8)
  }

  test("massive ties across split points") {
    val sess = spark
    import sess.implicits._
    val df = (0 until 4000).map(i => ("only", (i % 4).toDouble)).toDF("g", "v")
      .repartition(16)
    check(df, 32)
  }

  test("more requested partitions than rows") {
    val sess = spark
    import sess.implicits._
    check(Seq(("a", 3.0), ("a", 1.0), ("a", 2.0)).toDF("g", "v"), 32)
  }

  test("all-NULL group emits NULL quantiles like the built-in percentile") {
    val sess = spark
    import sess.implicits._
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)),
        ("dead", None), ("dead", None), ("mixed", None), ("mixed", Some(7.0)))
      .toDF("g", "v").repartition(4)
    val got = ExactQuantile.perGroup(df, "g", "v", Seq(0.5), 8)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // `percentile` keeps the all-NULL group with a NULL result; so must we
    assert(got === Map(("a", 0.5) -> Some(2.0), ("dead", 0.5) -> None,
      ("mixed", 0.5) -> Some(7.0)))
  }
}
