package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: registers graft's native Catalyst
  * functions. Users opt in with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`); library code paths use
  * the idempotent per-session hooks (e.g.
  * [[functions.DeepBookAgg.ensureRegistered]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      functions.DeepBookAgg.identifier,
      functions.DeepBookAgg.info,
      functions.DeepBookAgg.builder))
    extensions.injectFunction((
      functions.RollingHash.identifier,
      functions.RollingHash.info,
      functions.RollingHash.builder))
    extensions.injectFunction((
      functions.DecDot8.identifier,
      functions.DecDot8.info,
      functions.DecDot8.builder))
    extensions.injectFunction((
      functions.SynthLadder.identifier,
      functions.SynthLadder.info,
      functions.SynthLadder.builder))
    extensions.injectFunction((
      functions.LshBandCodes.identifier,
      functions.LshBandCodes.info,
      functions.LshBandCodes.builder))
    extensions.injectFunction((
      functions.ExactTopK.identifier,
      functions.ExactTopK.info,
      functions.ExactTopK.builder))
    functions.DecSum.registrations.foreach(extensions.injectFunction)
    functions.TextKernels.registrations.foreach(extensions.injectFunction)
  }
}
