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

  test("readAny dispatches by extension and rejects unknown ones") {
    assert(BookIO.readAny(spark, "/root/reference/data/ETH_bybit_L2_60s.parquet").count() === 60)
    intercept[IllegalArgumentException] {
      BookIO.readAny(spark, "/tmp/whatever.json")
    }
  }
}
