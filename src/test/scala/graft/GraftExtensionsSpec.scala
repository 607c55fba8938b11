package graft

import org.apache.spark.sql.functions._

/** Wiring tests for the SparkSessionExtensions surface: every native
  * kernel must be reachable through `GraftExtensions` with the same
  * name and arity the library paths use, so a user enabling
  * `spark.sql.extensions=graft.GraftExtensions` gets the full function
  * set without touching graft internals.
  */
class GraftExtensionsSpec extends SparkTestBase {

  test("every kernel exposes a (identifier, info, builder) registration") {
    import graft.functions._
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = Seq[org.apache.spark.sql.catalyst.expressions.Expression](
      Literal(1), Literal(2), Literal(3), Literal(4))
    assert(DeepBookAgg.identifier.funcName === "deep_book_agg" &&
      DeepBookAgg.builder(e.take(3)).isInstanceOf[DeepBookAgg])
    assert(RollingHash.identifier.funcName === "rolling_hash" &&
      RollingHash.builder(e).isInstanceOf[RollingHash])
    assert(DecDot8.identifier.funcName === "dec_dot8" &&
      DecDot8.builder(e.take(2)).isInstanceOf[DecDot8])
    assert(SynthLadder.identifier.funcName === "synth_ladder" &&
      SynthLadder.builder(e).isInstanceOf[SynthLadder])
    assert(LshBandCodes.identifier.funcName === "lsh_band_codes" &&
      LshBandCodes.builder(e.take(3)).isInstanceOf[LshBandCodes])
    assert(ExactTopK.identifier.funcName === "exact_topk" &&
      ExactTopK.builder(e.take(2)).isInstanceOf[ExactTopK])
    assert(DecSum.registrations.map(_._1.funcName).toSet ===
      Set("dec_unscaled", "unscaled_dbl"))
    assert(TextKernels.registrations.nonEmpty)
  }

  test("the extension function set covers every name the library registers") {
    // names the per-session ensureRegistered hooks create — the
    // extension path must offer the same surface
    val viaExtensions = {
      val collected = scala.collection.mutable.Set.empty[String]
      import graft.functions._
      collected += DeepBookAgg.identifier.funcName
      collected += RollingHash.identifier.funcName
      collected += DecDot8.identifier.funcName
      collected += SynthLadder.identifier.funcName
      collected += LshBandCodes.identifier.funcName
      collected += ExactTopK.identifier.funcName
      DecSum.registrations.foreach(collected += _._1.funcName)
      TextKernels.registrations.foreach(collected += _._1.funcName)
      collected.toSet
    }
    val viaHooks = Set("deep_book_agg", "rolling_hash", "dec_dot8", "synth_ladder",
      "lsh_band_codes", "exact_topk", "dec_unscaled", "unscaled_dbl",
      "shingle_agg", "minhash_spans", "shingle_overlap")
    assert(viaHooks.subsetOf(viaExtensions),
      s"missing from extensions: ${viaHooks -- viaExtensions}")
  }
}
