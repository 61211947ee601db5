package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.model.Tables

/** Pins the two Catalyst runtime-pruning features the 100 TB plan relies
  * on (config-only, so a silent conf regression would cost a full fact
  * scan at scale while every correctness test stays green):
  *
  *   - runtime bloom filter: a selective dim predicate is pushed to the
  *     fact side of a shuffle join as a `might_contain` pre-filter, so
  *     fact rows that cannot join are dropped BEFORE the shuffle;
  *   - dynamic partition pruning: a partitioned fact scan joined on its
  *     partition column reads only the partitions the dim side selects.
  *
  * Size thresholds are lowered to make the features fire on test-scale
  * data; the assertions are on plan structure, not timing.
  */
class RuntimeFilterSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective dim predicate becomes a runtime bloom pre-filter on the fact scan") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB") {
      val fact = Tables.lineitem(spark, sfDir)
      val dim = Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val optimized = j.queryExecution.optimizedPlan.toString
      withClue(optimized) {
        optimized should include("might_contain")
      }
      j.collect().length shouldBe 1
    }
  }

  test("AQE splits a skewed join partition instead of serializing on the hot key") {
    import spark.implicits._
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB") {
      // one hot key carrying ~90% of the rows on the left side
      val left = ((1 to 18000).map(_ => 1L) ++ (1L to 2000L))
        .toDF("k").withColumn("pad", expr("repeat('x', 64)"))
      val right = (1L to 2000L).toDF("k").withColumn("v", col("k") * 2)
      val j = left.join(right, "k").agg(count(lit(1)))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      withClue(plan) {
        plan should include("skew=true") // SortMergeJoin(skew=true)
        plan should include("coalesced and skewed") // the split shuffle read
      }
    }
  }

  test("join on the partition column dynamically prunes the partitioned scan") {
    val dir = Files.createTempDirectory("dpp").toString + "/fact"
    val s = spark
    import s.implicits._
    (for { day <- 1 to 8; i <- 0 until 50 }
      yield (f"2024-01-0$day", i.toLong, day * 1.0 + i))
      .toDF("day", "k", "v")
      .write.partitionBy("day").mode("overwrite").parquet(dir)
    // the dim must be a real scan with a Filter node — a constant-folded
    // local relation loses the selective predicate DPP keys on
    val dimDir = Files.createTempDirectory("dpp").toString + "/dim"
    (1 to 8).map(d => (f"2024-01-0$d", if (d == 3 || d == 5) "keep" else "drop"))
      .toDF("day", "tag")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("tag") === "keep")
    val q = spark.read.parquet(dir).join(dim, Seq("day"))
      .agg(count(lit(1)).as("n"))
    q.as[Long].head() shouldBe 100L
    val plan = q.queryExecution.executedPlan.toString
    withClue(plan) {
      plan.toLowerCase should include("dynamicpruning")
    }
  }
}
