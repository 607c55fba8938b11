package graft

import org.apache.spark.sql.functions._

/** Pins the scale-corpus generator's DESIGN INVARIANTS — the round-12
  * t3-transcription bug (t3 computed, t2 written) shipped a corpus that
  * silently violated them for a full round; these assertions make that
  * class of regression a test failure instead of a forensic discovery.
  */
class ScaleBenchGenSpec extends SparkTestBase {

  test("all 1000 composite text permutations are distinct") {
    val perms = (0 until 1000).map(ScaleBench.textPermutation)
    assert(perms.distinct.size === 1000,
      "the 1000x corpus must carry 1000 DISTINCT transforms - a collision " +
        "means exact cross-copy twins (the round-12 buggy-corpus structure)")
  }

  test("k < 100 keeps the third stage an identity (10x/100x corpora byte-stable)") {
    def firstTwoOnly(k: Int): Map[Char, Char] = {
      require(k < 100)
      ScaleBench.textPermutation(k)
    }
    // for k < 100 the composite must depend on (k%10, k/10) alone: the
    // permutation for k equals the one for k+0 with no hundreds action —
    // verified structurally by checking k and k (trivial) plus the
    // hundreds-digit ACTION: k and k+100 must differ for every k < 100
    (0 until 100).foreach { k =>
      assert(ScaleBench.textPermutation(k) !== ScaleBench.textPermutation(k + 100),
        s"hundreds digit must act on copy $k")
    }
    assert(firstTwoOnly(0) === ScaleBench.textPermutation(0))
  }

  test("driver map matches the generator's actual translate chain") {
    val s = spark
    import s.implicits._
    val sample = "the quiet brown fox landed on a mossy stone, humming"
    val alphabet = "etaoinsrhl"
    val alphabet2 = "dcumfpgwyb"
    def rotated(a: String, k: Int): String =
      a.drop(k % a.length) + a.take(k % a.length)
    Seq(0, 7, 42, 123, 905).foreach { k =>
      // the gen() column chain, reproduced verbatim
      val t1 = if (k % 10 == 0) col("text")
        else translate(col("text"), alphabet, rotated(alphabet, k % 10))
      val t2 = if ((k / 10) % 10 == 0) t1
        else translate(t1, alphabet2, rotated(alphabet2, (k / 10) % 10))
      val ab = alphabet + alphabet2
      val t3 = if (k / 100 == 0) t2
        else translate(t2, ab, rotated(ab, 2 * (k / 100)))
      val got = Seq(sample).toDF("text").select(t3).first().getString(0)
      val m = ScaleBench.textPermutation(k)
      val want = sample.map(c => m.getOrElse(c, c))
      assert(got === want, s"copy $k: column chain and driver map disagree")
    }
  }

  test("embedding transforms: exactly 448 distinct at 1000x; copy 0 has no twin") {
    // driver-side twin of the gen() rotate+flip chain: the transform of
    // copy k is fully described by (rot, flip-mask-bit or -1)
    def sig(k: Int): (Int, Int) = {
      val rot = k % 64
      val j = k / 64
      (rot, if (j == 0) -1 else (j - 1) % 6)
    }
    val sigs = (0 until 1000).map(sig)
    assert(sigs.distinct.size === 448,
      "64 rotations x (identity + 6 single-bit flip masks) = 448 - a " +
        "change here alters which shared-label copies are exact twins")
    // the probe set (copy 0, identity transform) must remain twin-free
    assert(sigs.zipWithIndex.count(_._1 == sig(0)) === 1,
      "copy 0's transform must be unique: recall probes assume no exact twin")
  }

  test("signs decor: in-copy isometry, twin-breaking, default untouched") {
    val sess = spark
    import sess.implicits._
    import org.apache.spark.sql.functions.col
    val dim = 8
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0)),
      (2L, Seq(2.0, 1.0, -1.0, 3.0, -2.0, 4.0, 0.0, 5.0))
    ).toDF("vec_id", "embedding")
    def out(k: Int, decor: String): Map[Long, Seq[Double]] =
      df.select(col("vec_id"),
          ScaleBench.embTransform(k, dim, decor)(col("embedding")).as("e"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    // k=100 and k=148 share (rot=4, flip class 5) at dim=8: exact twins
    // under the default 6-mask family — the 448-ceiling in miniature
    assert(out(100, "flips") === out(148, "flips"),
      "default mode must keep the documented twin structure")
    // the signs mode breaks the twin (md5 sign vectors are per-copy) ...
    val s100 = out(100, "signs"); val s148 = out(148, "signs")
    assert(s100 !== s148, "signs mode must break the 448-transform ceiling")
    // ... while staying an ISOMETRY: signed permutation preserves every
    // in-copy dot product (integer-valued comps -> exact in double)
    val base = df.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(dot(s100(1L), s100(2L)) === dot(base(1L), base(2L)),
      "in-copy dot products must be preserved exactly")
    assert(s100(1L).map(math.abs).sorted === base(1L).map(math.abs).sorted,
      "signed permutation: components preserved up to order and sign")
    // identity copies (k < dim * 1) are untouched in both modes
    assert(out(0, "signs") === base && out(0, "flips") === base)
  }
}
