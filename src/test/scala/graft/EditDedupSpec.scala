package graft

import java.nio.file.Files

/** LevBytes kernel parity + the q121/q122 fixtures. */
class EditDedupSpec extends SparkTestBase {

  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("graft-edit").toFile.getAbsolutePath
    rows.map { case (id, text, lang, source) => (id, text, lang, source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(2).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("lev_bytes matches DuckDB's byte-edit convention") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    // DuckDB (measured): levenshtein('héllo','hello') = 2, '中文字' vs '中文' = 3
    assert(functions.LevBytes.compute(u("héllo"), u("hello")) === 2)
    assert(functions.LevBytes.compute(u("中文字"), u("中文")) === 3)
    assert(functions.LevBytes.compute(u(""), u("abc")) === 3)
    assert(functions.LevBytes.compute(u("abc"), u("")) === 3)
    assert(functions.LevBytes.compute(u("kitten"), u("sitting")) === 3)
    assert(functions.LevBytes.compute(u("same"), u("same")) === 0)
  }

  test("q122: agreement and jaccard-only cells land where constructed") {
    val x = Seq.tabulate(150)(i => s"wx$i").mkString(" ") // ~900 chars
    val y = Seq.tabulate(18)(i => s"zy$i").mkString(" ")  // ~100 chars
    val dir = docsDir(Seq(
      (0L, x + " " + y, "en", "s0"),
      (1L, x + " " + y, "en", "s0"),            // exact dup of 0: both verdicts 1
      (2L, y + " " + x, "en", "s0"),            // block reorder: jaccard high, edit low
      (3L, Seq.fill(100)("unrelated words entirely").mkString(" "), "en", "s1")))
    val rows = text.TextQueries.q122.run(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(4)))).toMap
    // exact dup pair: jacc 1000, edit 1000
    assert(rows.contains((1, 1)) && rows((1, 1))._1 >= 1L)
    assert(rows((1, 1))._2 === 1000L)
    // reordered-block pairs: jaccard keeps them, edit similarity drops below 900
    assert(rows.contains((1, 0)), s"expected a jacc-only cell, got ${rows.keySet}")
    assert(rows((1, 0))._2 < 900L)
  }

  test("q121: target-vocab docs outscore disjoint-vocab sources") {
    // src0 speaks alpha/beta; src1 shares the target vocab; src2 disjoint
    val dir = docsDir(Seq(
      (0L, Seq.fill(30)("alpha beta").mkString(" "), "en", "src0"),
      (1L, Seq.fill(30)("alpha beta").mkString(" "), "en", "src0"),
      (2L, Seq.fill(30)("alpha beta").mkString(" "), "en", "src1"),
      (3L, Seq.fill(30)("omega psi chi phi").mkString(" "), "en", "src2")))
    val rows = text.IndexQueries.q121.run(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows("src0")._1 === 2L)
    // src1 shares the target profile: same mean weight as src0 docs
    assert(rows("src1")._2 === rows("src0")._2)
    // disjoint vocab scores strictly lower
    assert(rows("src2")._2 < rows("src0")._2)
    // with < 100 docs everything is inside the global top-100
    assert(rows.values.forall(v => v._3 === v._1))
  }
}
