package graft.rel

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import scala.collection.mutable

/** Distributed EXACT per-group quantiles — the scale path for what
  * Spark's built-in `percentile` does with a per-group value buffer.
  *
  * `percentile` is an ObjectHashAggregate: every value of a group is
  * collected into ONE reducer's in-memory map, so a 100 TB group
  * cannot be computed at all. This operator never materializes a group
  * anywhere:
  *
  *   1. range-partition by VALUE (Spark samples split points), sort
  *      within partitions — a global sort, the thing a cluster is good
  *      at;
  *   2. one pass counts rows per (partition, group) — the only data
  *      the driver ever sees is that `nPartitions × nGroups` count
  *      grid plus the picked interpolation rows (2 per quantile);
  *   3. prefix sums over the grid give each partition its per-group
  *      starting rank; a second pass emits exactly the rows whose
  *      global rank is an interpolation endpoint.
  *
  * Interpolation matches `percentile`/`quantile_cont`:
  * `v_lo·(hi − pos) + v_hi·(pos − lo)` at `pos = p·(n−1)` — the same
  * IEEE ops, so results are bit-identical to the built-in (pinned by
  * ExactQuantileSpec) and to the DuckDB oracle.
  *
  * Ties across partition split points are harmless: ranks among equal
  * values are arbitrary, but the VALUES at any rank are then equal.
  */
object ExactQuantile {

  /** Per-group exact quantiles of `valueCol`.
    *
    * NULL semantics match the built-in `percentile`: NULL values are
    * ignored, and a group whose values are ALL NULL still emits its
    * `(g, p, NULL)` rows (found via a map-side-combinable distinct over
    * the group column — bounded by the groups-are-tiny contract this
    * operator already carries for its count grid).
    *
    * @return one row per (group, p): `(g, p, q)` — tiny (groups ×
    *         quantiles), safe to broadcast-join back to group stats
    */
  def perGroup(df: DataFrame, groupCol: String, valueCol: String,
               ps: Seq[Double], nPart: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val allGroups: Array[String] = df
      .select(col(groupCol).cast("string").as("g")).distinct()
      .as[String].collect()
    val base = df.select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull).as[(String, Double)]
    val parted = base.repartitionByRange(nPart, col("v"))
      .sortWithinPartitions("v")
      // two passes (count grid, rank pick) over the same sorted layout;
      // at cluster scale use DISK_ONLY or recompute — the sort is the cost
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // pass 1: the (partition, group) count grid — bounded driver data
      val grid: Array[(Int, String, Long)] = parted.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        val m = mutable.HashMap.empty[String, Long]
        it.foreach { case (g, _) => m.update(g, m.getOrElse(g, 0L) + 1L) }
        m.iterator.map { case (g, c) => (pid, g, c) }
      }.collect()
      val totals: Map[String, Long] =
        grid.groupBy(_._2).map { case (g, rows) => g -> rows.map(_._3).sum }
      // interpolation endpoints per group: global 0-based ranks to fetch
      val wanted: Map[String, Set[Long]] = totals.map { case (g, n) =>
        g -> ps.flatMap { p =>
          val pos = p * (n - 1)
          Seq(math.floor(pos).toLong, math.ceil(pos).toLong)
        }.toSet
      }
      // per-partition per-group starting rank (prefix sums over pid order)
      val starts: Map[(Int, String), Long] = {
        val acc = mutable.HashMap.empty[String, Long]
        val out = Map.newBuilder[(Int, String), Long]
        grid.sortBy(_._1).foreach { case (pid, g, c) =>
          val s = acc.getOrElse(g, 0L)
          out += ((pid, g) -> s)
          acc.update(g, s + c)
        }
        out.result()
      }
      val wantedB = spark.sparkContext.broadcast(wanted)
      val startsB = spark.sparkContext.broadcast(starts)
      // pass 2: emit only the endpoint rows (≤ 2·|ps| per group)
      val picked: Array[(String, Long, Double)] = parted.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        val cur = mutable.HashMap.empty[String, Long]
        val want = wantedB.value
        it.flatMap { case (g, v) =>
          val i = cur.getOrElse(g, startsB.value.getOrElse((pid, g), 0L))
          cur.update(g, i + 1)
          if (want.getOrElse(g, Set.empty).contains(i)) Iterator((g, i, v))
          else Iterator.empty
        }
      }.collect()
      val byRank: Map[(String, Long), Double] =
        picked.map { case (g, i, v) => (g, i) -> v }.toMap
      val rows = for {
        (g, n) <- totals.toSeq
        p <- ps
      } yield {
        val pos = p * (n - 1)
        val lo = math.floor(pos).toLong
        val hi = math.ceil(pos).toLong
        val vLo = byRank((g, lo))
        val vHi = byRank((g, hi))
        // the built-in percentile's exact expression (two products, one
        // add — NOT v_lo + d·Δ, which differs in the last ulp)
        val q = if (hi == lo) vLo else vLo * (hi - pos) + vHi * (pos - lo)
        (g, p, Option(q))
      }
      // groups present in the input but erased by the NULL filter keep
      // their rows with NULL quantiles, exactly as `percentile` does
      val nullRows = for {
        g <- allGroups.toSeq if !totals.contains(g)
        p <- ps
      } yield (g, p, Option.empty[Double])
      (rows ++ nullRows).toDF("g", "p", "q")
    } finally parted.unpersist(blocking = false)
  }

  /** Per-group exact WEIGHTED quantiles — the mass-based complement of
    * [[perGroup]] (curation wants "the price below which half the
    * QUANTITY sits", not half the rows). Same two-pass rank-pick
    * architecture: range-partition by value, count-grid → prefix
    * offsets → targeted second pass; a group is never materialized on
    * one node and no per-group window exists anywhere.
    *
    * Weights are LONGS by contract, and that is what makes the result
    * engine- and partitioning-exact: cumulative INTEGER weight is
    * permutation-invariant, so although the range partitioner may split
    * a run of tied values arbitrarily, the run whose end-cum first
    * reaches the target — and therefore the emitted VALUE — is unique.
    * (Double weights would make the crossing comparison depend on
    * float add order — the reason this contract exists.)
    *
    * Quantiles are permilles; target mass = ⌈pm·W/1000⌉ in integer
    * arithmetic. Definition: the lower weighted quantile — smallest v
    * with cumWeight(≤ v) ≥ target. Null values/weights are dropped.
    *
    * @return (g, pm, wq, target_w, total_w) — tiny (groups × permilles)
    */
  def perGroupWeighted(df: DataFrame, groupCol: String, valueCol: String,
                       weightCol: String, pms: Seq[Long],
                       nPart: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("v"),
        col(weightCol).cast("long").as("w"))
      .filter(col("v").isNotNull && col("w").isNotNull)
      .as[(String, Double, Long)]
    val parted = base.repartitionByRange(nPart, col("v"))
      .sortWithinPartitions("v")
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // pass 1: (partition, group) → weight mass; bounded driver grid
      val grid: Array[(Int, String, Long)] = parted.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        val m = mutable.HashMap.empty[String, Long]
        it.foreach { case (g, _, w) => m.update(g, m.getOrElse(g, 0L) + w) }
        m.iterator.map { case (g, ws) => (pid, g, ws) }
      }.collect()
      val totals: Map[String, Long] =
        grid.groupBy(_._2).map { case (g, rows) => g -> rows.map(_._3).sum }
      val targets: Map[String, Seq[(Long, Long)]] = totals.map { case (g, tw) =>
        g -> pms.map(pm => pm -> ((pm * tw + 999L) / 1000L))
      }
      val starts: Map[(Int, String), Long] = {
        val acc = mutable.HashMap.empty[String, Long]
        val out = Map.newBuilder[(Int, String), Long]
        grid.sortBy(_._1).foreach { case (pid, g, ws) =>
          val s = acc.getOrElse(g, 0L)
          out += ((pid, g) -> s)
          acc.update(g, s + ws)
        }
        out.result()
      }
      val targetsB = spark.sparkContext.broadcast(targets)
      val startsB = spark.sparkContext.broadcast(starts)
      // pass 2: emit the first row whose running mass reaches each
      // target (≤ |pms| rows per group per partition)
      val picked: Array[(String, Long, Double, Long)] =
        parted.mapPartitions { it =>
          val pid = TaskContext.getPartitionId()
          val cum = mutable.HashMap.empty[String, Long]
          it.flatMap { case (g, v, w) =>
            val before = cum.getOrElse(g, startsB.value.getOrElse((pid, g), 0L))
            val after = before + w
            cum.update(g, after)
            targetsB.value.getOrElse(g, Seq.empty).collect {
              case (pm, t) if before < t && t <= after => (g, pm, v, after)
            }
          }
        }.collect()
      // a target can be crossed in several partitions' local view only
      // if starts already exceed it — the guard `before < t` admits
      // exactly one row globally per (g, pm); keep min v defensively
      val rows = for {
        (g, tw) <- totals.toSeq
        (pm, t) <- targets(g)
      } yield {
        val hit = picked.filter(r => r._1 == g && r._2 == pm)
          .sortBy(_._3).headOption
        (g, pm, hit.map(_._3), t, tw)
      }
      rows.toDF("g", "pm", "wq", "target_w", "total_w")
    } finally parted.unpersist(blocking = false)
  }
}
