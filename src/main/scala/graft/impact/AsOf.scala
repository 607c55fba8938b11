package graft.impact

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed nearest-|ts−t| as-of matching (J2 generalized): the
  * semantics of the reference's monotone pointer walk
  * (`impact_twap.py:174-188`) — advance while `|ts[j+1]−t| ≤ |ts[j]−t|` —
  * re-derived as a per-probe rule: the match is the LAST row (max ord)
  * among those minimizing `|ts−t|`; on an exact two-sided tie the later
  * (forward) row wins, and within an equal-ts run the last row wins.
  *
  * Implementation is the scalable two-pass union trick: series ∪ probes,
  * one ascending window pass for the backward candidate (last row with
  * ts ≤ t, max ord on equal ts) and one descending pass for the forward
  * candidate (first ts > t, max ord within that ts), then an O(1)
  * distance compare per probe. Two sorts over N+S rows per partition key —
  * no N×S join, no driver materialization of the series.
  */
object AsOf {

  /** @param series   rows carrying `partCol`, `ordCol` (unique tiebreak
    *                 order within partition), `tsCol`, and `payloadCols`
    * @param probes   rows carrying `partCol`, `probeIdCol`, `tCol`
    * @return one row per probe: part, probeId, t, matched_ord, matched_ts,
    *         and `matched_<payload>` for each payload column
    */
  def nearest(series: DataFrame, partCol: String, ordCol: String, tsCol: String,
              payloadCols: Seq[String],
              probes: DataFrame, probeIdCol: String, tCol: String): DataFrame = {
    val bkStruct = struct(
      col(ordCol).cast("long").as("ord") +:
        col(tsCol).cast("long").as("mts") +:
        payloadCols.map(c => col(c).as(c)): _*)
    val bkType = {
      val tmp = series.select(bkStruct.as("bk"))
      tmp.schema("bk").dataType.sql
    }
    val bk = series.select(col(partCol).as("part"), col(tsCol).cast("long").as("ts"),
      lit(0).as("is_q"), col(ordCol).cast("long").as("ord"), bkStruct.as("bk"),
      lit(null).cast("long").as("probe_id"))
    val pr = probes.select(col(partCol).as("part"), col(tCol).cast("long").as("ts"),
      lit(1).as("is_q"), col(probeIdCol).cast("long").as("ord"),
      expr(s"CAST(NULL AS $bkType)").as("bk"), col(probeIdCol).cast("long").as("probe_id"))
    val tagged = bk.unionByName(pr)

    // backward: ts ≤ t (book-before-probe on equal ts), last = max ord
    val wB = Window.partitionBy("part")
      .orderBy(col("ts").asc, col("is_q").asc, col("ord").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward: strictly ts > t (probe-before-book on equal ts in the
    // descending scan); equal-ts run ordered ord ASC so the running last
    // lands on its max ord
    val wF = Window.partitionBy("part")
      .orderBy(col("ts").desc, col("is_q").desc, col("ord").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val dB = col("ts") - col("back.mts")
    val dF = col("fwd.mts") - col("ts")
    val pickFwd = col("back").isNull || (col("fwd").isNotNull && dF <= dB)
    val matched = tagged
      .withColumn("back", last("bk", ignoreNulls = true).over(wB))
      .withColumn("fwd", last("bk", ignoreNulls = true).over(wF))
      .filter(col("is_q") === 1)
      .withColumn("m", when(pickFwd, col("fwd")).otherwise(col("back")))
    matched.select(
      col("part").as(partCol) +: col("probe_id").as(probeIdCol) +: col("ts").as(tCol) +:
        col("m.ord").as("matched_ord") +: col("m.mts").as("matched_ts") +:
        payloadCols.map(c => col(s"m.$c").as(s"matched_$c")): _*)
  }
}
