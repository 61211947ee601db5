package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** samplePerGroup vs the naive full-window answer on a skewed frame —
  * the oracle data has no hot groups, so the threshold path (phase 2)
  * is pinned here: a 20k-row group must pass through the candidate
  * filter and still yield exactly the k hash-smallest rows.
  */
class ShardingSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // one hot group (20k rows), one exactly-k group, one smaller-than-k
  private def frame = {
    val rows =
      (0L until 20000L).map(i => (i, "hot")) ++
        (20000L until 20016L).map(i => (i, "exact")) ++
        (30000L until 30005L).map(i => (i, "tiny"))
    rows.toDF("doc_id", "grp")
  }

  private def naive(k: Int) = {
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("__hv"), col("doc_id"))
    frame
      .withColumn("__hv", expr("md5p60(CAST(doc_id AS STRING))"))
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
      .drop("__hv")
      .select("doc_id", "grp", "sample_rank")
  }

  test("hot-group threshold path equals the naive window answer") {
    val k = 16
    val expected = naive(k).as[(Long, String, Long)].collect().toSet
    for (parts <- Seq(1, 13)) {
      val got = Sharding
        .samplePerGroup(frame.repartition(parts), "doc_id", Seq("grp"), k)
        .select("doc_id", "grp", "sample_rank")
        .as[(Long, String, Long)].collect().toSet
      got shouldBe expected
    }
  }

  test("group sizes at and below k keep every row, ranked 1..n_g") {
    val got = Sharding.samplePerGroup(frame, "doc_id", Seq("grp"), 16)
      .groupBy("grp").agg(count(lit(1)).as("n"), max("sample_rank").as("mx"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    got("hot") shouldBe ((16L, 16L))
    got("exact") shouldBe ((16L, 16L))
    got("tiny") shouldBe ((5L, 5L))
  }
}
