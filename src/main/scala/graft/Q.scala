package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a Spark DataFrame program plus (when the semantics
  * are ANSI-SQL-expressible) its DuckDB oracle mirror. Every float the
  * query emits must be cross-engine-deterministic (see [[Exact]]).
  *
  * @param headline included in the Bench headline set
  */
case class Q(name: String,
             run: (SparkSession, String) => DataFrame,
             oracle: Option[String],
             headline: Boolean = false)

object Q {

  /** Deterministic presentation sort over an EXPENSIVE computed result.
    *
    * A trailing global `orderBy` range-samples its child, which executes
    * the whole upstream plan a second time — for window/aggregation
    * pipelines that doubles the query. Caching the computed result first
    * means the sampling pass populates the cache and the output pass
    * reads it: one real execution plus one in-memory write/read of the
    * (already reduced) result. The harness (Bench/Verify) clears the
    * cache after every query, so nothing leaks across measurements; on a
    * real cluster the presentation sort itself is the thing you'd drop —
    * results this shape are written partitioned, not totally ordered.
    */
  def presentSorted(df: DataFrame, keys: String*): DataFrame =
    df.cache().orderBy(keys.map(org.apache.spark.sql.functions.col): _*)
}
