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

  test("rank stays correct under forced AQE coalescing; ranged frame is persisted") {
    val sess = spark
    import sess.implicits._
    // Adversarial conf: AQE free to coalesce shuffle reads with a tiny
    // advisory size — the regime where, WITHOUT the persist, the offsets
    // branch and the rank branch re-executed the range exchange and AQE
    // could coalesce them differently, diverging spark_partition_id
    // between the two consumers (observed at sf0.1 in q115, round 7).
    val keys = Seq("spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1b",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "48b")
    val saved = keys.map { case (k, _) => k -> sess.conf.getOption(k) }
    keys.foreach { case (k, v) => sess.conf.set(k, v) }
    try {
      val df = (0 until 5000).map(i => ((i * 2654435761L) % 17, i.toLong))
        .toDF("grp", "id").repartition(11)
      val (ranked, unpersist) = GlobalRank.withGlobalRankHooked(
        df, Seq(col("grp"), col("id")), "rn", numPartitions = 13)
      // the persist is the mechanism that pins both consumers to one
      // physical partitioning — assert it's actually in the plan
      assert(ranked.queryExecution.optimizedPlan.toString
        .contains("InMemoryRelation"),
        "ranged frame must be persisted (AQE-consistency mechanism)")
      val viaWindow = df.withColumn("rn",
        row_number().over(Window.orderBy(col("grp"), col("id"))).cast("long") - 1L)
      assert(ranked.select("grp", "id", "rn")
        .except(viaWindow.select("grp", "id", "rn")).count() === 0)
      unpersist()
    } finally saved.foreach {
      case (k, Some(v)) => sess.conf.set(k, v)
      case (k, None) => sess.conf.unset(k)
    }
  }

  test("two concurrent GlobalRank consumers in one session stay independent") {
    val sess = spark
    import sess.implicits._
    val base = (0 until 4000).map(i => (i.toLong, (i * 31) % 7)).toDF("id", "grp")
      .repartition(6)
    val (r1, un1) = GlobalRank.withGlobalRankHooked(
      base, Seq(col("id")), "rn", numPartitions = 8)
    val (r2, un2) = GlobalRank.withGlobalRankHooked(
      base.filter(col("id") % 2 === 0), Seq(col("grp"), col("id")), "rn",
      numPartitions = 5)
    // drive both rank pipelines from concurrent threads against the one
    // shared session (each persists its own ranged frame; neither may
    // see the other's cached partitioning)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val f1 = Future(r1.orderBy("rn").select("id").as[Long].collect().toSeq)
    val f2 = Future(r2.orderBy("rn").select("id").as[Long].collect().toSeq)
    val (got1, got2) = (Await.result(f1, 120.seconds), Await.result(f2, 120.seconds))
    assert(got1 === (0L until 4000L))
    val expected2 = (0 until 4000).map(i => (i.toLong, (i * 31) % 7))
      .filter(_._1 % 2 == 0).sortBy { case (id, g) => (g, id) }.map(_._1)
    assert(got2 === expected2)
    un1(); un2()
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
