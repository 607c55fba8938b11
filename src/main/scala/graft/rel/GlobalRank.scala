package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global row-numbering.
  *
  * `row_number().over(Window.orderBy(keys))` funnels the whole input
  * through ONE partition — the classic scale cliff. This helper computes
  * the identical rank with no global shuffle point:
  *
  *   1. `repartitionByRange(keys)` — each partition holds a contiguous
  *      key range, and partition ids are ordered by range;
  *   2. per-partition row counts → cumulative offsets (a frame of
  *      `numPartitions` rows — the only single-partition window, over
  *      ~32 rows);
  *   3. `row_number` PARTITIONED by partition id (parallel) + offset.
  *
  * The result equals the single-partition global rank whenever `keys`
  * form a total order (include a unique tiebreak column — every caller
  * here ends keys with `doc_id`/primary key). This is the same
  * physical strategy a 100 TB zone-map rewrite uses
  * (`repartitionByRange(...).sortWithinPartitions(...)`), so the audit
  * measures the layout it would actually produce.
  */
object GlobalRank {

  /** Append 0-based global rank of `keys`-order as column `outCol`.
    *
    * The ranged frame is persisted (memory-and-disk) before both
    * consumers: the offsets branch and the rank branch must see the
    * IDENTICAL partitioning, and without the persist each branch
    * re-executes the range exchange independently — AQE is then free to
    * coalesce the two executions differently, `spark_partition_id`
    * diverges between them, and the offset join mis-assigns ranks
    * (observed at sf0.1: one phantom extra block in q115). At fleet
    * scale this materialization is not overhead — a layout job writes
    * the range-sorted table anyway. The harness clears the cache per
    * query; long-lived callers own the unpersist.
    */
  def withGlobalRank(df: DataFrame, keys: Seq[Column], outCol: String,
                     numPartitions: Int = 0): DataFrame =
    withGlobalRankHooked(df, keys, outCol, numPartitions)._1

  /** As [[withGlobalRank]], but also hands back the unpersist hook for
    * the internal ranged frame. The Verify/Bench harness clears the
    * whole cache per query, so the plain variant is fine there; a
    * long-lived caller (library use, a multi-query session) calls the
    * hook once the result — and anything derived from it — has been
    * materialized, or it accumulates one cached copy of the input per
    * rank call.
    */
  def withGlobalRankHooked(df: DataFrame, keys: Seq[Column], outCol: String,
                           numPartitions: Int = 0): (DataFrame, () => Unit) = {
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, keys: _*)
      .withColumn("_gr_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val offsets = ranged.groupBy("_gr_pid").agg(count(lit(1)).as("_gr_n"))
      .withColumn("_gr_off", coalesce(
        sum("_gr_n").over(Window.orderBy("_gr_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_gr_pid", "_gr_off")
    val out = ranged.join(broadcast(offsets), "_gr_pid")
      .withColumn(outCol,
        row_number().over(
          Window.partitionBy("_gr_pid").orderBy(keys: _*)).cast("long")
          - lit(1L) + col("_gr_off"))
      .drop("_gr_pid", "_gr_off")
    (out, () => { ranged.unpersist(); () })
  }
}
