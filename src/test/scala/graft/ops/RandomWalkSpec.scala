package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Random-walk generator invariants: walks follow real edges, start at
  * the seeds, end early at sinks, and — the core contract — are a pure
  * function of the graph (identical output under repartitioning, since
  * the next hop is chosen by (node, step, dst)-seeded hash argmin, not
  * by execution order).
  */
class RandomWalkSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val edges = Seq(
    ("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "a"),
    ("c", "d"), ("d", "a"), ("d", "b"), ("e", "f") // f is a sink
  ).toDF("src", "dst")

  test("every hop follows an existing edge and step 0 is the seed") {
    val seeds = Seq("a", "b", "e").toDF("node")
    val walks = RandomWalk.run(edges, seeds, steps = 5)
    val rows = walks.as[(String, Int, String)].collect().toSeq
    rows.filter(_._2 == 0).map(r => (r._1, r._3)).toSet shouldBe
      Set(("a", "a"), ("b", "b"), ("e", "e"))
    val edgeSet = edges.as[(String, String)].collect().toSet
    val byWalk = rows.groupBy(_._1)
    byWalk.foreach { case (_, steps) =>
      val sorted = steps.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Seq((_, s1, u), (_, s2, v)) =>
          s2 shouldBe s1 + 1
          edgeSet should contain((u, v))
        case _ => ()
      }
    }
  }

  test("walks end at sink nodes instead of emitting phantom hops") {
    val seeds = Seq("e").toDF("node")
    val walks = RandomWalk.run(edges, seeds, steps = 5)
    // e -> f (sink): exactly steps 0 and 1, nothing after
    walks.count() shouldBe 2
    walks.filter(col("step") === 1).select("node").as[String]
      .collect() shouldBe Array("f")
  }

  test("output is identical under repartitioning (hash-argmin determinism)") {
    val seeds = Seq("a", "b", "c", "d").toDF("node")
    val w1 = RandomWalk.run(edges, seeds, steps = 6)
      .orderBy("walk_id", "step").collect()
    val w2 = RandomWalk.run(edges.repartition(7), seeds.repartition(3), steps = 6)
      .orderBy("walk_id", "step").collect()
    w1 should contain theSameElementsInOrderAs w2
    // fully-connected component: every walk runs the full length
    w1.length shouldBe 4 * 7
  }
}
