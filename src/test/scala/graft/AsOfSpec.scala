package graft

import graft.impact.AsOf
import org.apache.spark.sql.functions._

/** Tie-rule semantics of the distributed nearest-|ts−t| as-of
  * ([[AsOf.nearest]]) against the reference pointer walk
  * (`impact_twap.py:174-188`): exact two-sided ties go forward, equal-ts
  * runs resolve to their last row, and out-of-range probes clamp to the
  * nearest end.
  */
class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val series = Seq(
    (0L, 10L, 1.0), (1L, 20L, 2.0), (2L, 20L, 3.0), (3L, 30L, 4.0))
    .toDF("ord", "ts", "v").withColumn("part", lit("s"))

  /** Reference pointer, transliterated for property comparison. */
  private def pointer(ts: Seq[Long], targets: Seq[Long]): Seq[Int] = {
    var j = 0
    targets.map { t =>
      while (j + 1 < ts.length && math.abs(ts(j + 1) - t) <= math.abs(ts(j) - t)) j += 1
      j
    }
  }

  test("tie rules: forward wins exact ties, equal-ts runs resolve to last row") {
    val probes = Seq((0L, 15L), (1L, 14L), (2L, 20L), (3L, 5L), (4L, 100L), (5L, 25L))
      .toDF("probe_id", "t").withColumn("part", lit("s"))
    val got = AsOf.nearest(series, "part", "ord", "ts", Seq("v"), probes, "probe_id", "t")
      .orderBy("probe_id")
      .collect().map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("matched_ord")).toMap
    assert(got === Map(
      0L -> 2L, // |20-15| = |10-15| → tie → forward, and last of the 20-run
      1L -> 0L, // 4 < 6 → backward
      2L -> 2L, // exact hit advances through the equal-ts run
      3L -> 0L, // before first row → forward clamp
      4L -> 3L, // after last row → backward clamp
      5L -> 3L)) // |30-25| = |20-25| → tie → forward
  }

  test("matches the reference pointer on monotone targets over a random walk") {
    val rng = new scala.util.Random(7)
    var t = 1000L
    val ts = (0 until 400).map { _ => t += rng.nextInt(5); t } // dup-heavy, monotone
    val df = ts.zipWithIndex.map { case (x, i) => (i.toLong, x) }
      .toDF("ord", "ts").withColumn("part", lit("s"))
    val targets = (0 until 50).map(_ => 990L + rng.nextInt(1050)).sorted
    val probes = targets.zipWithIndex.map { case (x, k) => (k.toLong, x) }
      .toDF("probe_id", "t").withColumn("part", lit("s"))
    val got = AsOf.nearest(df, "part", "ord", "ts", Seq.empty, probes, "probe_id", "t")
      .collect().map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("matched_ord")).toMap
    val want = pointer(ts, targets)
    // monotone targets: pointer ≡ independent nearest-last, no clamp needed
    (0 until 50).foreach { k =>
      assert(got(k.toLong) === want(k).toLong, s"target ${targets(k)} (probe $k)")
    }
  }

  test("TwapJob clamp reproduces the pointer on non-monotone jittered targets") {
    val rng = new scala.util.Random(11)
    var t = 1000L
    val ts = (0 until 300).map { _ => t += rng.nextInt(4); t }
    val df = ts.zipWithIndex.map { case (x, i) => (i.toLong, x) }
      .toDF("ord", "ts").withColumn("part", lit("s"))
    // jitter-like: roughly increasing with local inversions
    val targets = (0 until 40).map(k => 1000L + k * 12 + (rng.nextInt(21) - 10))
    val probes = targets.zipWithIndex.map { case (x, k) => (k.toLong, x) }
      .toDF("probe_id", "t").withColumn("part", lit("s"))
    val got = AsOf.nearest(df, "part", "ord", "ts", Seq.empty, probes, "probe_id", "t")
      .collect().map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("matched_ord")).toMap
    var j = 0L
    val clamped = (0 until 40).map { k => j = math.max(j, got(k.toLong)); j }
    assert(clamped === pointer(ts, targets).map(_.toLong))
  }
}
