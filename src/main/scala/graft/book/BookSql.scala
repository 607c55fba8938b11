package graft.book

/** DuckDB SQL mirrors of [[BookMetrics]] expressions over the wide book
  * layout. Every string here MUST be the exact expression tree of the
  * corresponding Column builder (operand order and association included)
  * so doubles match bit-for-bit — edit the two files together.
  */
object BookSql {

  val spread = "(best_ask - best_bid)"
  val mid = "(0.5::DOUBLE * (best_bid + best_ask))"

  val relSpreadBpsStrict: String =
    "CASE WHEN best_bid > 0 AND best_ask > 0 AND best_ask > best_bid " +
      s"THEN 10000.0::DOUBLE * (best_ask - best_bid) / $mid END"

  val relSpreadBpsVector: String =
    "CASE WHEN best_bid + best_ask > 0 " +
      "THEN 20000.0::DOUBLE * (best_ask - best_bid) / (best_bid + best_ask) END"

  val spreadBpsEvent: String =
    "CASE WHEN best_bid > 0 AND best_ask > 0 " +
      s"THEN (best_ask - best_bid) / $mid * 10000.0::DOUBLE END"

  private def coal(c: String) = s"COALESCE($c, 0.0::DOUBLE)"

  val imbalanceL1: String = {
    val b = coal("bid1_size"); val a = coal("ask1_size")
    s"CASE WHEN $b + $a > 0 THEN $b / ($b + $a) END"
  }

  def imbalanceDepthK(depth: Int): String = {
    val b = (1 to depth).map(k => coal(s"bid${k}_size")).mkString(" + ")
    val a = (1 to depth).map(k => coal(s"ask${k}_size")).mkString(" + ")
    s"CASE WHEN ($b) + ($a) > 0 THEN ($b) / (($b) + ($a)) END"
  }

  val microprice: String =
    "CASE WHEN bid1_size + ask1_size > 0 " +
      "THEN (best_ask * bid1_size + best_bid * ask1_size) / (bid1_size + ask1_size) END"

  val micropriceImbalanceBps: String =
    s"CASE WHEN $mid > 0 THEN 10000.0::DOUBLE * ($microprice - $mid) / $mid END"

  def notionalDepth(side: String, depth: Int): String = {
    val terms = (1 to depth).map { k =>
      s"CASE WHEN $side${k}_price IS NOT NULL AND $side${k}_size IS NOT NULL " +
        s"THEN $side${k}_price * $side${k}_size ELSE 0.0::DOUBLE END"
    }.mkString(" + ")
    val anyValid = (1 to depth)
      .map(k => s"($side${k}_price IS NOT NULL AND $side${k}_size IS NOT NULL)")
      .mkString(" OR ")
    s"CASE WHEN $anyValid THEN $terms END"
  }

  /** Slope helper CTE layers (mirrors [[BookMetrics.bookSlope]]'s fold):
    * layer 1 adds per-level validity/masked-size/first-price columns,
    * layer 2 adds x_i and masked cumulative y_i, the returned final
    * expression computes the OLS slope from them. `pfx` ∈ {bid, ask}.
    */
  def slopeLayer1(pfx: String, depth: Int): String = {
    val cols = (1 to depth).flatMap { k =>
      Seq(
        s"CASE WHEN ($pfx${k}_price IS NOT NULL AND $pfx${k}_size IS NOT NULL) THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS ${pfx}_v$k",
        s"CASE WHEN ($pfx${k}_price IS NOT NULL AND $pfx${k}_size IS NOT NULL) THEN $pfx${k}_size ELSE 0.0::DOUBLE END AS ${pfx}_s$k")
    }
    val p0 = (1 to depth)
      .map(k => s"CASE WHEN ($pfx${k}_price IS NOT NULL AND $pfx${k}_size IS NOT NULL) THEN $pfx${k}_price END")
      .mkString("COALESCE(", ", ", ")")
    (cols :+ s"$p0 AS ${pfx}_p0").mkString(",\n    ")
  }

  def slopeLayer2(pfx: String, depth: Int): String = {
    val xs = (1 to depth).map { k =>
      s"CASE WHEN ${pfx}_v$k = 1.0 THEN abs($pfx${k}_price - ${pfx}_p0) ELSE 0.0::DOUBLE END AS ${pfx}_x$k"
    }
    // y_k raw = left fold (0.0 + s1) + s2 + ... + sk, matching scanLeft
    val ys = (1 to depth).map { k =>
      val fold = (1 to k).foldLeft("0.0::DOUBLE")((acc, j) => s"($acc + ${pfx}_s$j)")
      s"CASE WHEN ${pfx}_v$k = 1.0 THEN $fold ELSE 0.0::DOUBLE END AS ${pfx}_y$k"
    }
    (xs ++ ys).mkString(",\n    ")
  }

  def slopeFinal(pfx: String, depth: Int): String = {
    val n = (1 to depth).map(k => s"${pfx}_v$k").mkString(" + ")
    val sx = (1 to depth).map(k => s"${pfx}_x$k").mkString(" + ")
    val sy = (1 to depth).map(k => s"${pfx}_y$k").mkString(" + ")
    val sxy = (1 to depth).map(k => s"${pfx}_x$k * ${pfx}_y$k").mkString(" + ")
    val sxx = (1 to depth).map(k => s"${pfx}_x$k * ${pfx}_x$k").mkString(" + ")
    s"CASE WHEN ($n) >= 2 AND (($sxx) - ($sx) * ($sx) / ($n)) > 0 " +
      s"THEN (($sxy) - ($sx) * ($sy) / ($n)) / (($sxx) - ($sx) * ($sx) / ($n)) END"
  }

  /** OFI mirrors — assume a `lagged` CTE exposing prev-row columns
    * pb (bid1_price lag), sb (bid1_size lag), pa, sa and `rn`.
    */
  val lagLayer: String =
    """LAG(bid1_price, 1) OVER w AS pb, LAG(bid1_size, 1) OVER w AS sb,
    LAG(ask1_price, 1) OVER w AS pa, LAG(ask1_size, 1) OVER w AS sa,
    ROW_NUMBER() OVER w AS rn"""

  val ofiL1Strict: String =
    """CASE WHEN bid1_price IS NOT NULL AND bid1_size IS NOT NULL
           AND ask1_price IS NOT NULL AND ask1_size IS NOT NULL
           AND pb IS NOT NULL AND sb IS NOT NULL AND pa IS NOT NULL AND sa IS NOT NULL
      THEN (CASE WHEN bid1_price > pb THEN bid1_size - sb
                 WHEN bid1_price < pb THEN -sb ELSE 0.0::DOUBLE END)
         + (CASE WHEN ask1_price < pa THEN ask1_size - sa
                 WHEN ask1_price > pa THEN -sa ELSE 0.0::DOUBLE END)
      END"""

  val ofiEvent: String = {
    val qb = coal("bid1_size"); val qbPrev = coal("sb")
    val qa = coal("ask1_size"); val qaPrev = coal("sa")
    val geB = "CASE WHEN pb IS NULL THEN 1.0::DOUBLE WHEN bid1_price >= pb THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END"
    val leB = "CASE WHEN pb IS NULL THEN 1.0::DOUBLE WHEN bid1_price <= pb THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END"
    val leA = "CASE WHEN pa IS NULL THEN 1.0::DOUBLE WHEN ask1_price <= pa THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END"
    val geA = "CASE WHEN pa IS NULL THEN 1.0::DOUBLE WHEN ask1_price >= pa THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END"
    s"CASE WHEN rn = 1 THEN 0.0::DOUBLE ELSE (($geB) * $qb - ($leB) * $qbPrev) - (($leA) * $qa - ($geA) * $qaPrev) END"
  }

  val ofiLobster: String =
    "COALESCE(CASE WHEN bid1_price > pb THEN bid1_size END, 0.0::DOUBLE)" +
      " - COALESCE(CASE WHEN bid1_price < pb THEN sb END, 0.0::DOUBLE)" +
      " - COALESCE(CASE WHEN ask1_price > pa THEN sa END, 0.0::DOUBLE)" +
      " + COALESCE(CASE WHEN ask1_price < pa THEN ask1_size END, 0.0::DOUBLE)"
}
