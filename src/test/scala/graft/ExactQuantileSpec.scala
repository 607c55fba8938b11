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

  test("weighted: matches a driver-side reference fold; partition invariant") {
    val sess = spark
    import sess.implicits._
    val rnd = new scala.util.Random(41)
    val rows = (1 to 4000).map { i =>
      val g = s"g${i % 5}"
      (g, math.floor(rnd.nextDouble() * 50) / 10.0, rnd.nextInt(7).toLong) // ties + zero weights
    }
    val df = rows.toDF("g", "v", "w").repartition(13)
    val pms = Seq(500L, 900L, 990L)
    // reference: smallest v whose cumulative integer mass reaches ceil(pm*W/1000)
    def ref(g: String): Map[Long, Option[Double]] = {
      val vs = rows.filter(_._1 == g).sortBy(_._2)
      val w = vs.map(_._3).sum
      pms.map { pm =>
        val t = (pm * w + 999L) / 1000L
        var cum = 0L
        pm -> vs.collectFirst { case (_, v, wi) if { cum += wi; cum >= t } => v }
      }.toMap
    }
    def got(nPart: Int): Map[(String, Long), (Option[Double], Long, Long)] =
      ExactQuantile.perGroupWeighted(df, "g", "v", "w", pms, nPart)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          ((if (r.isNullAt(2)) None else Some(r.getDouble(2))),
            r.getLong(3), r.getLong(4))).toMap
    val a = got(32)
    (0 until 5).map(i => s"g$i").foreach { g =>
      val r = ref(g)
      pms.foreach { pm =>
        assert(a((g, pm))._1 === r(pm), s"weighted quantile ($g, $pm)")
      }
    }
    // partitioning must not change a single bit of the answer
    assert(a === got(3), "weighted quantiles must be partition-count invariant")
  }

  test("weighted: zero-weight rows carry no mass, zero-total group yields NULL") {
    val sess = spark
    import sess.implicits._
    val df = Seq(
      ("a", 1.0, 0L), ("a", 2.0, 5L), ("a", 3.0, 0L), ("a", 9.0, 5L),
      ("z", 1.0, 0L), ("z", 2.0, 0L)).toDF("g", "v", "w")
    val got = ExactQuantile.perGroupWeighted(df, "g", "v", "w", Seq(500L, 1000L))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // a: W=10, t(500)=5 -> v=2.0 (first run reaching mass 5); t(1000)=10 -> 9.0
    assert(got(("a", 500L)) === Some(2.0))
    assert(got(("a", 1000L)) === Some(9.0))
    // z: all-zero mass -> no target reachable -> NULL at every pm
    assert(got(("z", 500L)) === None && got(("z", 1000L)) === None)
  }
}
