package graft

import graft.io.BookIO
import org.apache.spark.sql.functions._
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** S6↔S8 round trip: golden-format CSV written by the engine reads back
  * byte-compatibly (10-dp strings, blank-for-NULL ≡ NULL-on-read).
  */
class IoRoundTripSpec extends SparkTestBase {

  test("golden CSV write → read round trip preserves values and NULLs") {
    val src = BookIO.readFlatCsv(spark, "/root/reference/data/ws_bybit_ETHUSDTUSDT_d5_5s_5hz.csv")
    val out = Files.createTempDirectory("roundtrip").toString
    BookIO.writeGoldenCsv(src.coalesce(1), out)
    val back = BookIO.readFlatCsv(spark, out)
    assert(back.columns.toSeq === src.columns.toSeq)
    assert(back.count() === src.count())
    // cell-level equality incl. NULLs (raw_nonce column is all blank)
    assert(src.exceptAll(back).count() === 0 && back.exceptAll(src).count() === 0)
    val nulls = back.filter(col("raw_nonce").isNull).count()
    assert(nulls === back.count())
  }

  test("append summary sink: header only when new, rows accumulate across runs") {
    import spark.implicits._
    val path = Files.createTempDirectory("summary").toString + "/runs/summary.csv"
    val run1 = Seq(("buy", 50.0, 49.9)).toDF("side", "target_qty", "filled_qty")
    val run2 = Seq(("sell", 25.0, 25.0), ("buy", 10.0, 10.0))
      .toDF("side", "target_qty", "filled_qty")
    BookIO.appendSummaryCsv(run1, path)
    BookIO.appendSummaryCsv(run2, path)
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
    assert(lines.size === 4, "one header + three data rows")
    assert(lines.get(0) === "side,target_qty,filled_qty")
    assert(lines.get(1) === "buy,50.0,49.9")
    assert(lines.get(3) === "buy,10.0,10.0")
  }

  test("readAny dispatches by extension and rejects unknown ones") {
    assert(BookIO.readAny(spark, "/root/reference/data/ETH_bybit_L2_60s.parquet").count() === 60)
    intercept[IllegalArgumentException] {
      BookIO.readAny(spark, "/tmp/whatever.json")
    }
  }
}
