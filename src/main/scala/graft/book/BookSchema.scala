package graft.book

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The flat fixed-width snapshot schema (SURVEY §1.1, FIXTURES §F1):
  * 8 meta columns + 4K level columns for recording depth K
  * (`record.py:32-52`, asserted in `tests/test_record.py:76-99`).
  */
object BookSchema {

  val metaFields: Seq[StructField] = Seq(
    StructField("ts_ms", LongType),
    StructField("iso", StringType),
    StructField("exchange_id", StringType),
    StructField("symbol", StringType),
    StructField("book_level", StringType),
    StructField("raw_nonce", LongType),
    StructField("best_bid", DoubleType),
    StructField("best_ask", DoubleType))

  /** Wide interchange schema: 8 + 4K columns, bid/ask levels interleaved
    * per the reference's header order (all bids, then all asks).
    */
  def forDepth(k: Int): StructType = StructType(
    metaFields ++
      (1 to k).flatMap(i => Seq(
        StructField(s"bid${i}_price", DoubleType), StructField(s"bid${i}_size", DoubleType))) ++
      (1 to k).flatMap(i => Seq(
        StructField(s"ask${i}_price", DoubleType), StructField(s"ask${i}_size", DoubleType))))

  /** Typed CSV reader: blanks → NULL, numerics parsed (the CSV stores
    * 10-dp strings — S8 with an explicit schema instead of all-string).
    */
  def readCsv(spark: SparkSession, path: String, depth: Int): DataFrame =
    spark.read.option("header", "true").schema(forDepth(depth)).csv(path)

  /** S1/O3 book-level dispatch: truncate a depth-K frame to L1 (levels
    * beyond 1 nulled, book_level relabeled — `snapshot.py:69-71`).
    */
  def truncateToL1(df: DataFrame, depth: Int): DataFrame = {
    val nulled = (2 to depth).flatMap(k =>
      Seq(s"bid${k}_price", s"bid${k}_size", s"ask${k}_price", s"ask${k}_size"))
      .filter(df.columns.contains)
      .map(c => c -> lit(null).cast("double"))
    val out = df.withColumns(nulled.toMap)
    if (df.columns.contains("book_level")) out.withColumn("book_level", lit("L1")) else out
  }
}
