package graft.vec

/** Receipt main for the scale-adaptive wide near-dup twin
  * ([[VectorQueries.adaptiveNearDup]]) — the resolution of the round-15
  * `weak` flag on q72 (fixed 16-bit bands → N²/2¹⁶ candidate volume →
  * 454× step at 2 M rows).
  *
  * Usage:
  *   tools/java_run.sh graft.vec.AdaptiveNearDupProbe <dir> [<dir> ...]
  *
  * Prints ONE JSON line per dir: corpus size, the width used, candidate
  * and verified-pair counts (precision = the fraction of verify work
  * that was real), wall seconds, and the hot-bucket cap-truncation
  * counts per band (the no-silent-caps contract — a nonzero count is
  * visible recall loss, not an invisible cap). Run on sf0.1 and a
  * target/scaleN corpus back-to-back: the pair of lines is the step
  * receipt. `SPARK_GRAFT_ADND_BITS` forces a fixed width (e.g. 16) so
  * the same corpus can be measured at the catalog width vs the law's.
  */
object AdaptiveNearDupProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: AdaptiveNearDupProbe <embeddingsDir> [<embeddingsDir> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val bitsOverride = sys.env.get("SPARK_GRAFT_ADND_BITS").map(_.trim.toInt)
    // "md5" (default: the independent plane family) or "lcg" (the
    // catalog family — run it to reproduce the degenerate baseline)
    val family = sys.env.getOrElse("SPARK_GRAFT_ADND_FAMILY", "md5")
    val spark = graft.Tables.localSession(cpus)
    // same fixed-width warmup shape as ScaleBench: JIT/codegen warm
    // before anything is timed. Warm the SAME plane family the probe
    // will measure (a default-family warmup would leave an lcg run's
    // first leg timing codegen cold — exactly the skew this probe
    // exists to rule out), on a small dir the box actually has.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_ADND_WARMUP_DIR",
      "/root/testdata/sf0.01")
    VectorQueries.adaptiveNearDup(spark, warmDir, family = family)._1
      .write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    args.foreach { dir =>
      val n = graft.Tables(spark, dir, "embeddings").count()
      val t0 = System.nanoTime()
      val (pairs, cand, capAudit, bits) = VectorQueries.adaptiveNearDup(
        spark, dir, bitsOverride, family = family)
      val nPairs = pairs.count()
      val nCand = cand.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val trunc = capAudit.collect()
        .map(r => s""""band_${r.getInt(0)}":${r.getLong(1)}""")
        .sortBy(identity).mkString("{", ",", "}")
      spark.catalog.clearCache()
      println(f"""{"probe":"adaptive_neardup","dir":"$dir","n":$n,""" +
        f""""family":"$family","bits":$bits,"n_cand":$nCand,"n_pairs":$nPairs,""" +
        f""""wall_sec":$wall%.1f,"cap_truncated":$trunc}""")
    }
    spark.stop()
  }
}
