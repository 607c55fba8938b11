package graft

import graft.text.TextQueries
import org.apache.spark.sql.functions._

/** q57 BPE-style regex tokenization invariants. The cross-engine value
  * equality is the DuckDB oracle's job; these tests pin the *semantics*:
  * the pattern partitions the text exactly, the token classes are
  * exhaustive and mutually exclusive, and a hand-tokenized sentence
  * comes out token-for-token.
  */
class BpeTokensSpec extends SparkTestBase {

  private lazy val out = TextQueries.q57.run(spark, "/root/testdata/sf0.001").cache()

  test("token classes are exhaustive and mutually exclusive") {
    val bad = out.filter(
      col("n_word") + col("n_number") + col("n_punct") + col("n_contraction") + col("n_ws")
        =!= col("n_bpe_tokens"))
    assert(bad.count() === 0)
    assert(out.count() === 500)
    assert(out.filter(col("n_distinct") > col("n_bpe_tokens")).count() === 0)
  }

  test("tokens partition the text: concatenation reconstructs every document") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("toks", regexp_extract_all(col("text"), lit(TextQueries.bpePat), lit(0)))
    val broken = docs.filter(concat_ws("", col("toks")) =!= col("text"))
    assert(broken.count() === 0)
  }

  test("hand-tokenized sentence matches token-for-token") {
    val sess = spark; import sess.implicits._
    val toks = Seq("I'll have 2 apples, don't I?").toDF("text")
      .select(regexp_extract_all(col("text"), lit(TextQueries.bpePat), lit(0)))
      .collect()(0).getSeq[String](0)
    assert(toks === Seq("I", "'ll", " have", " 2", " apples", ",", " don", "'t", " I", "?"))
  }
}
