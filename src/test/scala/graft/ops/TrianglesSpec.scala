package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Triangle enumeration against hand-counted graphs and a naive
  * all-triples reference, plus the orientation invariants that make the
  * degree-ordered algorithm correct (acyclic total order, each triangle
  * found exactly once from its lowest vertex).
  */
class TrianglesSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naiveCount(edges: Set[(Long, Long)]): Long = {
    val und = edges.flatMap { case (a, b) => Set((a, b), (b, a)) }
    val nodes = und.map(_._1).toSeq.sorted
    (for {
      a <- nodes; b <- nodes if a < b && und((a, b))
      c <- nodes if b < c && und((b, c)) && und((a, c))
    } yield 1).size.toLong
  }

  test("K4 has 4 triangles, a 4-cycle has none, K4 + pendant unchanged") {
    val k4 = Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val tri = Triangles.triangles(k4.toSeq.toDF("a", "b"))
    tri.count() shouldBe 4
    // every triangle reported once, as an ordered vertex triple
    tri.select($"x", $"y", $"z").as[(Long, Long, Long)].collect()
      .map { case (x, y, z) => Set(x, y, z) }.distinct.length shouldBe 4

    val c4 = Set((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    Triangles.triangles(c4.toSeq.toDF("a", "b")).count() shouldBe 0

    val pendant = k4 + ((4L, 9L))
    Triangles.triangles(pendant.toSeq.toDF("a", "b")).count() shouldBe 4
  }

  test("matches the naive all-triples count on a deterministic random graph") {
    val rnd = new scala.util.Random(42)
    val edges = (0 until 400).map { _ =>
      val a = rnd.nextInt(40).toLong; val b = rnd.nextInt(40).toLong; (a, b)
    }.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val df = edges.toSeq.toDF("a", "b")
    Triangles.triangles(df).count() shouldBe naiveCount(edges)
    // per-node counts sum to 3x the triangle count
    Triangles.perNode(df).agg(sum($"n_tri")).as[Long].head() shouldBe
      3 * naiveCount(edges)
  }

  test("orientation is a total order: no directed 2-cycles, out-edges point up the (deg, id) order") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val de = Triangles.orient(edges)
    val pairs = de.as[(Long, Long)].collect().toSet
    pairs.size shouldBe 5
    for ((s, t) <- pairs) pairs should not contain ((t, s))
  }
}
