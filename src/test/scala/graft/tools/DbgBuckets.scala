package graft.tools

import org.apache.spark.sql.functions._

/** Scratch: inspect hot (band, code) buckets of lsh_band_codes at a
  * given width on a corpus dir. */
object DbgBuckets {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val bits = args(1).toInt
    val spark = graft.Tables.localSession(16)
    graft.functions.LshBandCodes.ensureRegistered(spark)
    val eb = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        posexplode(expr(s"lsh_band_codes(embedding, 4, $bits)"))
          .as(Seq("band_idx", "code")))
    val hot = eb.groupBy("band_idx", "code").count()
      .orderBy(desc("count")).limit(10)
    println("== top buckets:")
    hot.show(10, false)
    val h = hot.collect().head
    val (b, c) = (h.getInt(0), h.getLong(1))
    println(s"== sample members of band=$b code=$c (binary ${c.toBinaryString}):")
    val mem = eb.filter(col("band_idx") === b && col("code") === c)
      .select("vec_id", "embedding").limit(5).collect()
    mem.foreach { r =>
      val e = r.getSeq[Float](1).take(8)
      println(s"vec ${r.getLong(0)} head=${e.mkString(",")}")
    }
    // pairwise cosine of the sample
    val vs = mem.map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
    for (i <- vs.indices; j <- i + 1 until vs.length) {
      val (a, x) = vs(i); val (bb, y) = vs(j)
      val dot = x.zip(y).map { case (p, q) => p * q }.sum
      val na = math.sqrt(x.map(v => v * v).sum); val nb = math.sqrt(y.map(v => v * v).sum)
      println(f"cos($a, $bb) = ${dot / (na * nb)}%.4f")
    }
    spark.stop()
  }
}
