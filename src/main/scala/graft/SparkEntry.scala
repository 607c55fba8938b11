package graft

import graft.book.{BookMetrics, SeriesMetrics, SyntheticBook}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The operator inventory lives in [[catalog]]: each entry pairs a Spark
  * DataFrame program with (where SQL-expressible) a DuckDB oracle mirror.
  */
object SparkEntry {

  def catalog: Seq[Q] =
    rel.RelationalQueries.all ++
      book.BookQueries.all ++
      impact.ImpactQueries.all ++
      text.TextQueries.all ++
      text.PipelineQueries.all ++
      text.IndexQueries.all ++
      vec.VectorQueries.all ++
      multimodal.MultimodalQueries.all

  /** Flagship: full metrics-enrichment pipeline (mmt-metrics analog) on
    * the synthetic book — row metrics bundle + strict OFI + reset-on-gap
    * RV, per-symbol windows. Driver smoke-checks rows > 0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val depth = 5
    val bookDf = SyntheticBook.fromEvents(Tables(spark, "/root/testdata/sf0.001", "events"), depth)
    val w = SeriesMetrics.bySym()
    val withRow = bookDf.withColumns(BookMetrics.rowMetricsBundle(depth).toMap)
    val prevMid = lag(col("mid"), 1).over(w)
    val ret = when(col("mid") > 0 && prevMid > 0, col("mid") / prevMid - 1)
    withRow
      .withColumn("ofi_l1", SeriesMetrics.ofiL1Strict(w))
      .withColumn("ret_mid", ret)
      .withColumn("gap_grp", SeriesMetrics.gapGroup(col("ret_mid"), w))
      .withColumn("rv",
        SeriesMetrics.realizedVarResetOnGap(col("ret_mid"),
          org.apache.spark.sql.expressions.Window.partitionBy("sym", "gap_grp").orderBy("seq"), 20))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
