package graft

import graft.book.BookSchema
import org.apache.spark.sql.functions._

class BookSchemaSpec extends SparkTestBase {

  test("forDepth(K) is 8 + 4K columns in the reference's header order") {
    val s5 = BookSchema.forDepth(5)
    assert(s5.fields.length === 8 + 4 * 5)
    assert(s5.fieldNames.take(8).toSeq === Seq("ts_ms", "iso", "exchange_id", "symbol",
      "book_level", "raw_nonce", "best_bid", "best_ask"))
    assert(s5.fieldNames(8) === "bid1_price" && s5.fieldNames.last === "ask5_size")
  }

  test("typed CSV read parses 10-dp strings and blank NULLs") {
    val df = BookSchema.readCsv(spark,
      "/root/reference/data/ws_bybit_ETHUSDTUSDT_d5_5s_5hz.csv", depth = 5)
    assert(df.count() === 26)
    assert(df.schema("best_bid").dataType.typeName === "double")
    assert(df.filter(col("raw_nonce").isNull).count() === 26)
    assert(df.agg(min("best_bid")).collect()(0).getDouble(0) > 0)
  }

  test("truncateToL1 nulls deeper levels and relabels") {
    val df = BookSchema.readCsv(spark,
      "/root/reference/data/ws_bybit_ETHUSDTUSDT_d5_5s_5hz.csv", depth = 5)
    val l1 = BookSchema.truncateToL1(df, 5)
    assert(l1.filter(col("bid2_price").isNotNull || col("ask5_size").isNotNull).count() === 0)
    assert(l1.filter(col("bid1_price").isNull).count() === 0)
    assert(l1.select("book_level").distinct().collect()(0).getString(0) === "L1")
  }
}
