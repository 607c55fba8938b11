package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * `events.ts` is parquet TIMESTAMP(NANOS) which Spark cannot represent
  * natively; we read it as a LONG of epoch-nanoseconds via
  * `spark.sql.legacy.parquet.nanosAsLong` and expose `epochUs` helpers so
  * results line up with DuckDB's microsecond-truncated TIMESTAMP view of
  * the same file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // every query path may use the Exact fast-sum kernels; registration is
    // an idempotent registry put, so doing it here keeps call sites clean
    graft.functions.DecSum.ensureRegistered(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
