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

  test("q163 BPE training: hand-computed merges on a crafted corpus") {
    val sess = spark; import sess.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe-train").toString
    // words: aaab ×2, ab ×1
    Seq((0L, "aaab aaab", "en", "s0", 9L), (1L, "ab", "en", "s0", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q163_bpe_merge_train")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    // round 1: (a,a) count 4 (two occurrences per "aaab" — classic BPE
    // overcounting on overlaps; the greedy merge applies once):
    //   aaab → (aa, a, b, </w>), ab unchanged → tokens 4·2 + 3 = 11
    // round 2: (a,b)=3 ties (b,</w>)=3 → lexicographic → (a,b):
    //   aaab → (aa, ab, </w>), ab → (ab, </w>) → tokens 3·2 + 2 = 8
    // round 3: (ab,</w>)=3 beats (aa,ab)=2:
    //   aaab → (aa, ab</w>), ab → (ab</w>) → tokens 2·2 + 1 = 5
    assert(out === Array(
      (1L, "a", "a", 4L, 11L),
      (2L, "a", "b", 3L, 8L),
      (3L, "ab", "</w>", 3L, 5L)))
  }
}
