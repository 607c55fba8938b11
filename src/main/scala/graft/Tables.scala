package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Engine-wide contract: `events.ts` is a LONG of epoch-nanoseconds.
  * The driver's parquet has carried two physical encodings across rounds —
  * TIMESTAMP(NANOS) (readable as LONG via
  * `spark.sql.legacy.parquet.nanosAsLong`) and TIMESTAMP(micros) (read as
  * timestamp/timestamp_ntz) — so [[apply]] normalizes any timestamp-typed
  * `ts` to epoch-nanos at load. DuckDB oracles keep using `epoch_us(ts)`
  * on the raw file, which agrees with `ts div 1000` here in both cases.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // every query path may use the Exact fast-sum / ordered-dot kernels;
    // registration is an idempotent registry put, so doing it here keeps
    // call sites clean
    graft.functions.DecSum.ensureRegistered(spark)
    graft.functions.OrdDot.ensureRegistered(spark)
    graft.functions.JaroWinkler.ensureRegistered(spark)
    normalizeTs(spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  /** Engine contract: `ts` is epoch-nano LONG. Converts a timestamp-typed
    * `ts` (micros-annotated parquet) to that contract; a no-op when the
    * column is already LONG (nanosAsLong path or our own writes) or
    * absent. timestamp_ntz carries no zone; the session runs UTC, so the
    * cast-to-timestamp reinterprets the same wall-clock micros. Works on
    * batch and streaming frames alike (pure projection).
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts") match {
      case Some(f) if f.dataType == TimestampType || f.dataType == TimestampNTZType =>
        df.withColumn(
          "ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case _ => df
    }

  /** Local session for tests/benchmarks: tuned for local[N] (shuffle
    * partitions = cores, AQE on, UTC). On a real cluster the same code
    * runs unchanged; only master/memory configs differ.
    */
  def localSession(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // superseded iterative-loop checkpoints are deleted as their RDDs
      // are GC'd (must be in the conf at context creation — see util.Ckpt)
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
