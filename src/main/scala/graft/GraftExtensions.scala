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
    functions.TextKernels.registrations.foreach(extensions.injectFunction)
  }
}
