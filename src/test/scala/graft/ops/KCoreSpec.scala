package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** k-core peeling semantics: cliques survive, trees/chains vanish,
  * cascading pendant chains peel one layer per round, and the fixed
  * round count reaches the fixpoint (one more peel changes nothing)
  * on the query's own graph at the gate scale.
  */
class KCoreSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def nodes(edges: Seq[(Long, Long)], k: Int, rounds: Int = 8): Set[Long] =
    KCore.coreNodes(edges.toDF("a", "b"), k, rounds).as[Long].collect().toSet

  test("a triangle is a 2-core; any tree has an empty 2-core") {
    nodes(Seq((1L, 2L), (2L, 3L), (1L, 3L)), k = 2) shouldBe Set(1L, 2L, 3L)
    nodes(Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 5L)), k = 2) shouldBe empty
  }

  test("pendant chain hanging off a clique peels away layer by layer") {
    val clique = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val chain = Seq((3L, 10L), (10L, 11L), (11L, 12L))
    // one round only removes the chain TIP's end; full rounds clear it
    nodes(clique ++ chain, k = 2, rounds = 1) should contain allOf (1L, 2L, 3L)
    nodes(clique ++ chain, k = 2, rounds = 1) should contain (10L)
    nodes(clique ++ chain, k = 2, rounds = 8) shouldBe Set(1L, 2L, 3L)
  }

  test("K4 survives the 3-core; K4 plus a triangle appendage loses the appendage") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    nodes(k4, k = 3) shouldBe Set(1L, 2L, 3L, 4L)
    val tri = Seq((4L, 8L), (8L, 9L), (4L, 9L)) // triangle members have deg 2 < 3
    nodes(k4 ++ tri, k = 3) shouldBe Set(1L, 2L, 3L, 4L)
  }

  test("the q_kcore graph reaches its fixpoint within the configured 8 rounds") {
    val d = "/root/testdata/sf0.001"
    val li = graft.model.Tables.lineitem(spark, d)
      .select($"l_orderkey", $"l_partkey").distinct()
    val e = li.select($"l_orderkey", $"l_partkey".as("a"))
      .join(li.select($"l_orderkey", $"l_partkey".as("b")), "l_orderkey")
      .filter($"a" < $"b")
      .groupBy($"a", $"b").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("sup"))
      .filter($"sup" >= 2).select($"a", $"b")
    val at8 = KCore.coreNodes(e, k = 2, rounds = 8).as[Long].collect().toSet
    val at9 = KCore.coreNodes(e, k = 2, rounds = 9).as[Long].collect().toSet
    at8 shouldBe at9
  }
}
