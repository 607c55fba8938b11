package graft

import graft.text.TextQueries
import org.apache.spark.sql.functions._

/** Sketch-audit operators: winnowing fingerprint overlap (q108) and the
  * count–min heavy-hitter audit (q109). Each is pinned against an
  * independent pure-Scala recompute of its core primitive on the
  * sf0.001 fixture, not just shape checks.
  */
class SketchAuditSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  /** Pure-Scala mirror of the q108 fingerprint set: Rabin window-8
    * hashes (B=131, M=1e9+7), then distinct minima of width-4 hash
    * windows — the same greatest(n-7,1)/greatest(nw-3,1) edge handling
    * as the kernel and the oracle.
    */
  private def winnowFps(text: String): Set[Long] = {
    val codes = text.map(_.toLong)
    val n = codes.length
    val wins = (0 until math.max(n - 7, 1)).map { i =>
      codes.slice(i, i + 8).foldLeft(0L)((acc, c) => (acc * 131 + c) % 1000000007L)
    }
    (0 until math.max(wins.length - 3, 1))
      .map(j => wins.slice(j, j + 4).min).toSet
  }

  private lazy val docs = Tables(spark, dir, "documents")
    .select("doc_id", "text").collect()
    .map(r => r.getLong(0) -> r.getString(1)).toMap

  private lazy val q108Out = TextQueries.q108.run(spark, dir).cache()

  test("q108: pair rows are well-formed (a<b, threshold, containment bound)") {
    assert(q108Out.where(col("doc_a") >= col("doc_b")).count() === 0)
    assert(q108Out.where(col("n_shared") < 5).count() === 0)
    assert(q108Out.where(col("containment_permille") > 1000).count() === 0)
    assert(q108Out.count() > 0, "fixture corpus contains overlapping docs")
  }

  test("q108: n_shared never exceeds the raw fingerprint intersection") {
    // the reported count is post-stop-fingerprint-filter, so for any pair
    // it is ≤ the pure-Scala intersection of the two full fingerprint sets
    val top = q108Out.orderBy(desc("n_shared"), col("doc_a"), col("doc_b"))
      .limit(20).collect()
    top.foreach { r =>
      val (a, b, shared) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val inter = (winnowFps(docs(a)) intersect winnowFps(docs(b))).size
      assert(shared <= inter, s"pair ($a,$b): reported $shared > true intersection $inter")
      assert(inter >= 5, s"pair ($a,$b) reported but true intersection only $inter")
    }
  }

  test("q108: per-doc fingerprint count matches the pure-Scala winnowing") {
    val nf = q108Out.select(col("doc_a").as("d"), col("fp_a").as("nf"))
      .union(q108Out.select(col("doc_b"), col("fp_b")))
      .distinct().collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(nf.nonEmpty)
    nf.take(50).foreach { case (d, n) =>
      assert(n === winnowFps(docs(d)).size.toLong, s"doc $d fingerprint count")
    }
  }

  private lazy val q109Out = TextQueries.q109.run(spark, dir).cache()

  test("q109: CMS never undercounts and the audit columns are consistent") {
    val rows = q109Out.collect()
    assert(rows.length > 0 && rows.length <= 50)
    rows.foreach { r =>
      val (exact, est, over, err) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(est >= exact, s"token ${r.getString(0)}: CMS undercounted")
      assert(over === est - exact)
      assert(err === over * 1000 / exact)
    }
  }

  test("q109: exact counts match a pure-Scala tokenize over the corpus") {
    val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    docs.values.foreach { t =>
      val tr = t.trim.toLowerCase
      if (tr.nonEmpty) tr.split("\\s+").foreach(tok => counts(tok) += 1)
    }
    q109Out.collect().foreach { r =>
      assert(r.getLong(1) === counts(r.getString(0)), s"token ${r.getString(0)}")
    }
    // and the frame really is the top of the distribution
    val reported = q109Out.collect().map(_.getLong(1)).min
    val missed = counts.values.count(_ > reported)
    assert(missed <= 50, "no token above the reported floor is missing")
  }

  test("q164: KMV Jaccard estimator is bounded, consistent, and accurate in the mean") {
    val df = SparkEntry.queries("q164_kmv_source_overlap")(spark, "/root/testdata/sf0.001")
    val rows = df.collect().toIndexedSeq
    df.unpersist()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (k, c) = (r.getAs[Long]("k_used"), r.getAs[Long]("n_common"))
      assert(k >= 1 && k <= 256 && c >= 0 && c <= k)
      val est = r.getAs[Double]("est_jaccard")
      assert(est >= 0.0 && est <= 1.0)
      assert(math.abs(est - c.toDouble / k) < 1e-15)
      // exact side must agree with the estimator's own frame arithmetic
      val (na, nb, ex) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Double]("exact_jaccard"))
      assert(ex >= 0.0 && ex <= 1.0 && na > 0 && nb > 0)
    }
    // unbiasedness in the mean: K=256 over ~190 pairs — the average
    // SIGNED permille error should sit near zero even though single
    // pairs wander (sf0.01 measured mean +0.9, |err| mean 7)
    val errs = rows.map(_.getAs[Long]("err_permille").toDouble)
    assert(math.abs(errs.sum / errs.size) <= 15,
      s"KMV estimator looks biased: mean signed err ${errs.sum / errs.size} permille")
  }
}
