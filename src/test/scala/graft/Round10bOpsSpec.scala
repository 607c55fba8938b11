package graft

import org.apache.spark.sql.functions._

/** Round-10 second-wave operator properties the oracle cannot see:
  * q174 fusion arithmetic/leg-consistency, q175 byte conservation and
  * bin-count bounds against an independent manifest recompute, q176
  * OHLC ordering invariants.
  */
class Round10bOpsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q174: RRF arithmetic, leg bounds, and rank monotonicity") {
    val rows = SparkEntry.queries("q174_hybrid_rrf_fusion")(spark, dir)
      .collect().toIndexedSeq
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet === Set(1L, 2L, 3L))
    byQ.foreach { case (_, qr) =>
      val sorted = qr.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")) === (1L to sorted.size).toIndexedSeq)
      // fused score recomputes from the leg ranks, and is non-increasing
      val scores = sorted.map { r =>
        val lex = Option(r.getAs[java.lang.Long]("lex_rnk")).map(_.toLong)
        val dense = Option(r.getAs[java.lang.Long]("dense_rnk")).map(_.toLong)
        assert(lex.isDefined || dense.isDefined, "row in neither leg's top-k")
        lex.foreach(v => assert(v >= 1 && v <= 50))
        dense.foreach(v => assert(v >= 1 && v <= 50))
        val expect = lex.map(v => 1000000L / (60 + v)).getOrElse(0L) +
          dense.map(v => 1000000L / (60 + v)).getOrElse(0L)
        assert(r.getAs[Long]("rrf_scaled") === expect)
        expect
      }
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      // a doc ranked top-1 in BOTH legs would dominate: fused top-1 must
      // score at least any single-leg maximum (1000000/61)
      assert(scores.head >= 1000000L / 61 || scores.head > 0)
    }
  }

  test("q174: rrfFuse is leg-agnostic — a truncated-dim dense leg swaps in unchanged") {
    import graft.text.PipelineQueries
    val full = SparkEntry.queries("q174_hybrid_rrf_fusion")(spark, dir)
      .collect().toIndexedSeq
    // the SAME fusion body consuming a 16-dim approximate dense leg
    val approx = PipelineQueries.rrfFuse(
      PipelineQueries.lexTopK(spark, dir, 50),
      PipelineQueries.denseTopK(spark, dir, 50, Some(16)))
      .collect().toIndexedSeq
    // well-formed under the swapped leg: per-query rank sequence + the
    // fusion arithmetic hold exactly as with the exact leg
    approx.groupBy(_.getAs[Long]("query_id")).foreach { case (_, qr) =>
      val sorted = qr.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")) === (1L to sorted.size).toIndexedSeq)
      sorted.foreach { r =>
        val lex = Option(r.getAs[java.lang.Long]("lex_rnk")).map(_.toLong)
        val dn = Option(r.getAs[java.lang.Long]("dense_rnk")).map(_.toLong)
        val expect = lex.map(v => 1000000L / (60 + v)).getOrElse(0L) +
          dn.map(v => 1000000L / (60 + v)).getOrElse(0L)
        assert(r.getAs[Long]("rrf_scaled") === expect)
      }
    }
    // the approximation is a real approximation of the full fusion: the
    // per-query top-10 sets overlap substantially (deterministic data,
    // floor pinned below the measured overlap)
    def sets(rows: Seq[org.apache.spark.sql.Row]) =
      rows.groupBy(_.getAs[Long]("query_id"))
        .view.mapValues(_.map(_.getAs[Long]("doc_id")).toSet).toMap
    val f = sets(full); val a = sets(approx)
    assert(f.keySet === a.keySet)
    f.keySet.foreach { q =>
      val overlap = (f(q) & a(q)).size
      assert(overlap >= 4, s"query $q: top-10 overlap $overlap under the 16-dim leg")
    }
  }

  test("q175: byte conservation vs independent manifest, bin bounds") {
    val out = SparkEntry.queries("q175_compaction_planner")(spark, dir)
      .collect().toIndexedSeq
    assert(out.nonEmpty)
    // independent manifest recompute (different plan shape: no window)
    val li = Tables(spark, dir, "lineitem")
    val expect = li
      .groupBy((year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).cast("long").as("part"),
        (col("l_suppkey") % 16).as("fk"))
      .agg((count(lit(1)) * 64 + sum(col("l_quantity").cast("long"))).as("bytes"))
      .groupBy("part")
      .agg(count(lit(1)).as("nf"), sum("bytes").as("bt"))
      .collect().map(r => r.getAs[Long]("part") -> (r.getAs[Long]("nf"), r.getAs[Long]("bt")))
      .toMap
    assert(out.size === expect.size)
    out.foreach { r =>
      val part = r.getAs[Long]("part")
      val (nf, bt) = expect(part)
      assert(r.getAs[Long]("n_files") === nf)
      assert(r.getAs[Long]("bytes_total") === bt)
      val nBins = r.getAs[Long]("n_bins")
      val target = r.getAs[Long]("target_bytes")
      assert(nBins >= 1 && nBins <= nf)
      // offset-striping: bin ids live in [0, (bytes_total-1) div target]
      assert(nBins <= (bt - 1) / target + 1)
      assert(r.getAs[Long]("max_bin_bytes") <= bt)
      assert(r.getAs[Long]("min_bin_bytes") >= 1)
      assert(r.getAs[Long]("n_small_files") <= nf)
    }
    // the plan must actually compact somewhere at this SF, else vacuous
    assert(out.exists(r => r.getAs[Long]("n_bins") < r.getAs[Long]("n_files")))
  }

  test("q178: frame energies match a direct byte fold; sampling geometry holds") {
    val rows = SparkEntry.queries("q178_frame_sample_scenes")(spark, dir)
      .collect().toIndexedSeq
    assert(rows.nonEmpty)
    // independent recompute: payload bytes folded directly (no frame
    // model, no hex nibbles) for every asset
    val expect = Tables(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 2)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("t"))
      .collect().map { r =>
        val bytes = r.getAs[String]("t").getBytes("UTF-8")
        val nFrames = (bytes.length + 15) / 16
        val sampled = (0 until nFrames).filter(_ % 4 == 0)
        val energies = sampled.map { f =>
          bytes.slice(16 * f, math.min(16 * f + 16, bytes.length))
            .map(_ & 0xffL).sum
        }
        r.getAs[Long]("doc_id") -> (nFrames.toLong, sampled.size.toLong, energies.sum)
      }.toMap
    assert(rows.size === expect.size)
    rows.foreach { r =>
      val (nf, ns, se) = expect(r.getAs[Long]("asset_id"))
      assert(r.getAs[Long]("n_frames") === nf)
      assert(r.getAs[Long]("n_sampled") === ns)
      assert(r.getAs[Long]("sampled_energy") === se)
      val cuts = r.getAs[Long]("n_cuts")
      assert(cuts >= 0 && cuts < math.max(ns, 1L))
      Option(r.getAs[java.lang.Long]("first_cut_frame")).foreach { f =>
        assert(cuts >= 1 && f % 4 === 0)
      }
    }
    // the detector must fire somewhere at this SF, else the cut leg is vacuous
    assert(rows.exists(_.getAs[Long]("n_cuts") > 0))
  }

  test("q179: classification matches the closed-form lifetime predicate; mass conserves") {
    val rows = SparkEntry.queries("q179_vacuum_audit")(spark, dir)
      .collect().toIndexedSeq
    assert(rows.size === 8)
    // independent recompute: closed-form lifetime predicate instead of
    // the manifest explode (a file is referenced iff removed > 5, since
    // added <= 7 by construction)
    val ledger = Tables(spark, dir, "orders")
      .groupBy(expr("o_orderkey div 5").as("file_id"))
      .agg(((count(lit(1)) * 128) +
        sum(expr("cast(round(o_totalprice * 100, 0) as bigint)"))).as("bytes"))
      .collect().map(r => r.getAs[Long]("file_id") -> r.getAs[Long]("bytes")).toMap
    case class Agg(var objs: Long = 0, var live: Long = 0, var exp: Long = 0,
                   var orph: Long = 0, var bLive: Long = 0, var bRec: Long = 0)
    val agg = scala.collection.mutable.Map.empty[Long, Agg]
    ledger.foreach { case (fid, bytes) =>
      val added = fid % 8
      val removed = added + 1 + fid % 5
      val a = agg.getOrElseUpdate(added, Agg())
      a.objs += 1
      if (removed > 5) { a.live += 1; a.bLive += bytes }
      else { a.exp += 1; a.bRec += bytes }
      if (fid % 11 == 3) { a.objs += 1; a.orph += 1; a.bRec += bytes }
    }
    rows.foreach { r =>
      val a = agg(r.getAs[Long]("cohort"))
      assert(r.getAs[Long]("n_objects") === a.objs)
      assert(r.getAs[Long]("n_live") === a.live)
      assert(r.getAs[Long]("n_expired") === a.exp)
      assert(r.getAs[Long]("n_orphans") === a.orph)
      assert(r.getAs[Long]("bytes_live") === a.bLive)
      assert(r.getAs[Long]("bytes_reclaimable") === a.bRec)
    }
    // all three outcome classes must occur at this SF, else vacuous
    assert(rows.map(_.getAs[Long]("n_live")).sum > 0)
    assert(rows.map(_.getAs[Long]("n_expired")).sum > 0)
    assert(rows.map(_.getAs[Long]("n_orphans")).sum > 0)
  }

  test("q180: resize kernel matches a direct 2x2 box filter; octaves partition assets") {
    val rows = SparkEntry.queries("q180_image_resize_audit")(spark, dir)
      .collect().toIndexedSeq
    assert(rows.nonEmpty)
    // independent recompute of the whole rollup from raw text bytes
    val docs = Tables(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 0)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("t"))
      .collect().map { r =>
        val b = r.getAs[String]("t").getBytes("UTF-8")
        val n = math.min(b.length, 4096)
        def px(rr: Int, cc: Int): Long = {
          val i = rr * 64 + cc; if (i < n) b(i) & 0xffL else 0L
        }
        var cs = 0L; var sm = 0L
        for (rr <- 0 until 32; cc <- 0 until 32) {
          val v = (px(2 * rr, 2 * cc) + px(2 * rr, 2 * cc + 1) +
            px(2 * rr + 1, 2 * cc) + px(2 * rr + 1, 2 * cc + 1)) / 4
          cs += v * (rr * 32 + cc + 1); sm += v
        }
        (n.toLong, cs, sm / 1024)
      }
    def octave(m: Long): Long =
      if (m >= 128) 7 else if (m >= 64) 6 else if (m >= 32) 5 else if (m >= 16) 4
      else if (m >= 8) 3 else if (m >= 4) 2 else if (m >= 2) 1 else 0
    val expect = docs.groupBy(d => octave(d._3)).map { case (o, as) =>
      o -> (as.size.toLong, as.map(_._1).sum, as.map(_._2).sum,
        as.map(_._2).min, as.map(_._2).max)
    }
    assert(rows.size === expect.size)
    rows.foreach { r =>
      val e = expect(r.getAs[Long]("octave"))
      assert(r.getAs[Long]("n_assets") === e._1)
      assert(r.getAs[Long]("bytes_used") === e._2)
      assert(r.getAs[Long]("checksum_mass") === e._3)
      assert(r.getAs[Long]("min_checksum") === e._4)
      assert(r.getAs[Long]("max_checksum") === e._5)
    }
    assert(rows.map(_.getAs[Long]("n_assets")).sum === docs.size.toLong)
  }

  test("q181: VPIN recomputes from a direct per-sym fold; toxicity bounded") {
    val rows = SparkEntry.queries("q181_vpin_toxicity")(spark, dir)
      .collect().toIndexedSeq
    assert(rows.nonEmpty)
    // independent recompute: sequential fold over each sym's ticks
    // (tick rule, carried direction, cumulative-volume striping)
    val ticks = graft.book.SyntheticBook
      .fromEvents(Tables(spark, dir, "events"), 5)
      .withColumn("mid", graft.book.BookMetrics.mid(col("best_bid"), col("best_ask")))
      .filter(col("mid").isNotNull)
      .select(col("sym"), col("seq"), col("mid"),
        (coalesce(col("bid1_size"), lit(0.0)) + coalesce(col("ask1_size"), lit(0.0)))
          .cast("long").as("vol"))
      .collect().map(r => (r.getAs[String]("sym"), r.getAs[Long]("seq"),
        r.getAs[Double]("mid"), r.getAs[Long]("vol")))
    val expect = ticks.groupBy(_._1).flatMap { case (sym, ts) =>
      var dir = 1; var prev = Double.NaN; var cum = 0L
      val agg = scala.collection.mutable.Map.empty[Long, (Long, Long)]
      ts.sortBy(_._2).foreach { case (_, _, mid, vol) =>
        if (!prev.isNaN) {
          if (mid > prev) dir = 1 else if (mid < prev) dir = -1
        }
        prev = mid
        val bucket = cum / 256
        cum += vol
        val (b, s2) = agg.getOrElse(bucket, (0L, 0L))
        if (dir == 1) agg(bucket) = (b + vol, s2) else agg(bucket) = (b, s2 + vol)
      }
      agg.map { case (bk, (b, s2)) => (sym, bk) -> (b, s2) }
    }
    rows.foreach { r =>
      val key = (r.getAs[String]("sym"), r.getAs[Long]("bucket"))
      val (b, s2) = expect(key)
      assert(r.getAs[Long]("buy_vol") === b, s"buy_vol at $key")
      assert(r.getAs[Long]("sell_vol") === s2, s"sell_vol at $key")
      assert(r.getAs[Long]("imbalance") === math.abs(b - s2))
      Option(r.getAs[java.lang.Long]("vpin_permille")).foreach { v =>
        assert(v >= 0L && v <= 1000L)
      }
    }
    assert(rows.size === expect.size)
  }

  test("q176: OHLC ordering invariants and volume-weighted mean range") {
    val rows = SparkEntry.queries("q176_ohlc_bars")(spark, dir)
      .collect().toIndexedSeq
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"))
      assert(l <= o && o <= h)
      assert(l <= c && c <= h)
      assert(r.getAs[Long]("n_ticks") >= 1)
      val vol = r.getAs[Long]("l1_volume")
      assert(vol >= 0)
      val vwap = Option(r.getAs[java.lang.Double]("bar_vwap"))
      if (vol > 0) {
        // weighted mean of in-bar mids: inside [low, high] up to the
        // 1e-6 decimal grid of the exact-sum recipe
        assert(vwap.isDefined)
        assert(vwap.get >= l - 1e-6 && vwap.get <= h + 1e-6)
      } else assert(vwap.isEmpty)
    }
    // bars per symbol are disjoint and cover the filtered tick count
    val n = rows.map(_.getAs[Long]("n_ticks")).sum
    val ticks = graft.book.SyntheticBook
      .fromEvents(Tables(spark, dir, "events"), 5)
      .withColumn("mid", graft.book.BookMetrics.mid(col("best_bid"), col("best_ask")))
      .filter(col("mid").isNotNull).count()
    assert(n === ticks)
  }
}
