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
