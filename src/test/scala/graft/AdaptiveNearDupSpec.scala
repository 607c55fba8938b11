package graft

import graft.vec.VectorQueries
import org.apache.spark.sql.functions._

/** The scale-adaptive production twin of q72 (round-15 weak flag: fixed
  * 16-bit bands go quadratic at 2 M rows — 454× step — and the hot-bucket
  * cap starts silently truncating past ~10⁷). Pins the width law, the
  * exactness of the cap-truncation counter (no silent caps), and that at
  * the catalog's width the twin IS q72.
  */
class AdaptiveNearDupSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("width law: ceil(log2 N) holds occupancy ~1, clamped to [8, 32]") {
    assert(VectorQueries.adaptiveBandBits(1L) === 8)
    assert(VectorQueries.adaptiveBandBits(256L) === 8)
    assert(VectorQueries.adaptiveBandBits(257L) === 9)
    assert(VectorQueries.adaptiveBandBits(50000L) === 16)
    assert(VectorQueries.adaptiveBandBits(2000000L) === 21)
    assert(VectorQueries.adaptiveBandBits(10000000L) === 24)
    assert(VectorQueries.adaptiveBandBits(1000000000L) === 30)
    assert(VectorQueries.adaptiveBandBits(Long.MaxValue) === 32)
    // monotone: more corpus never means narrower codes
    val pts = Seq(1L, 100L, 10000L, 1000000L, 100000000L, 1L << 40)
      .map(VectorQueries.adaptiveBandBits)
    assert(pts === pts.sorted)
  }

  test("at the catalog width (16 bits) the twin IS q72") {
    val (pairs, _, bits) =
      VectorQueries.adaptiveNearDup(spark, dir, bitsOverride = Some(16))
    assert(bits === 16)
    val q72 = SparkEntry.queries("q72_embedding_neardup_wide")(spark, dir)
      .select("id_a", "id_b", "n_bands", "cos_sim")
    assert(pairs.except(q72).isEmpty && q72.except(pairs).isEmpty,
      "bitsOverride=16 must reproduce catalog q72 exactly")
    spark.catalog.clearCache()
  }

  test("cap counter is exact — a truncated bucket is never silent") {
    graft.functions.LshBandCodes.ensureRegistered(spark)
    val bits = 8
    val cap = 2
    val (_, audit, _) =
      VectorQueries.adaptiveNearDup(spark, dir, Some(bits), cap = cap)
    // independent recount: per band, sum over (band, code) buckets of
    // max(occupancy - cap, 0)
    val expected = Tables(spark, dir, "embeddings")
      .select(posexplode(expr(s"lsh_band_codes(embedding, 4, $bits)"))
        .as(Seq("band_idx", "code")))
      .groupBy("band_idx", "code").agg(count(lit(1)).as("c"))
      .withColumn("tr", greatest(col("c") - cap, lit(0L)))
      .groupBy("band_idx").agg(sum("tr").as("expected"))
      .filter(col("expected") > 0)
    val mismatch = audit
      .join(expected, Seq("band_idx"), "full")
      .filter(coalesce(col("rows_truncated"), lit(-1L)) =!=
        coalesce(col("expected"), lit(-1L)))
      .count()
    assert(mismatch === 0L, "rows_truncated must equal the recount per band")
    assert(audit.agg(sum("rows_truncated")).first().getLong(0) > 0L,
      "cap=2 at 8 bits must actually truncate on this corpus " +
        "(else the test proves nothing)")
    spark.catalog.clearCache()
  }

  test("law width at gate scale: audit empty, twin finds the q72 pairs' ids") {
    val (pairs, audit, bits) = VectorQueries.adaptiveNearDup(spark, dir)
    val n = Tables(spark, dir, "embeddings").count()
    assert(bits === VectorQueries.adaptiveBandBits(n))
    // occupancy-1 law + corpus smaller than the cap ⇒ nothing truncated
    assert(audit.count() === 0L,
      "at the law's width no bucket may exceed the hot-bucket cap here")
    assert(pairs.columns.toSeq ===
      Seq("id_a", "id_b", "n_bands", "cos_sim"))
    spark.catalog.clearCache()
  }
}
