package graft

import graft.rel.GlobalRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GlobalRankSpec extends SparkTestBase {

  test("range-partitioned global rank equals the single-window global rank") {
    val sess = spark
    import sess.implicits._
    // keys deliberately skewed (many duplicate first-key values) with a
    // unique tiebreak, spread across several input partitions
    val df = (0 until 10000).map(i => ((i * 7919) % 13, i.toLong))
      .toDF("grp", "id").repartition(8)
    val viaHelper = GlobalRank.withGlobalRank(df, Seq(col("grp"), col("id")), "rn")
    val viaWindow = df.withColumn("rn",
      row_number().over(Window.orderBy(col("grp"), col("id"))).cast("long") - 1L)
    assert(viaHelper.select("grp", "id", "rn").except(
      viaWindow.select("grp", "id", "rn")).count() === 0)
    assert(viaHelper.count() === 10000)
  }

  test("global rank plan has no unpartitioned window over the input") {
    val sess = spark
    import sess.implicits._
    val df = (0 until 1000).map(i => (i.toLong, i % 5)).toDF("id", "grp")
    val ranked = GlobalRank.withGlobalRank(df, Seq(col("id")), "rn", numPartitions = 6)
    // the only Window in the plan partitions by the range-partition id;
    // the offsets frame (6 rows) is the lone single-partition window
    val plan = ranked.queryExecution.executedPlan.toString
    assert(plan.contains("_gr_pid"), "rank window must partition by range pid")
    val expected = (0 until 1000).map(_.toLong)
    val got = ranked.orderBy("rn").select("rn").as[Long].collect().toSeq
    assert(got === expected)
  }

  test("edge cases: empty frame and more partitions than rows") {
    val sess = spark
    import sess.implicits._
    val empty = GlobalRank.withGlobalRank(
      Seq.empty[Long].toDF("id"), Seq(col("id")), "rn")
    assert(empty.count() === 0 && empty.columns.contains("rn"))
    // 3 rows across 16 range partitions: most partitions are empty and
    // must not perturb the offsets
    val tiny = GlobalRank.withGlobalRank(
      Seq(30L, 10L, 20L).toDF("id"), Seq(col("id")), "rn", numPartitions = 16)
    assert(tiny.orderBy("rn").select("id").as[Long].collect().toSeq
      === Seq(10L, 20L, 30L))
  }
}
