package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Link-prediction scores against hand-computed neighborhoods, a naive
  * set-algebra reference on a random graph, and the hub-cap exclusion
  * that keeps wedge fan-out bounded.
  */
class LinkPredSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Naive reference: score all non-adjacent pairs with >= 1 common
    * neighbor via explicit neighbor sets (no hub cap).
    */
  private def naive(edges: Set[(Long, Long)]): Map[(Long, Long), (Long, Long, Long)] = {
    val und = edges.flatMap { case (a, b) => Set((a, b), (b, a)) }
    val nodes = und.map(_._1)
    val nbr = nodes.map(v => v -> und.filter(_._1 == v).map(_._2)).toMap
    (for {
      a <- nodes.toSeq.sorted; b <- nodes.toSeq.sorted
      if a < b && !edges((a, b))
      common = nbr(a) intersect nbr(b)
      if common.nonEmpty
    } yield {
      val cn = common.size.toLong
      val ra = common.toSeq.map(z => 1000000000000L / nbr(z).size).sum
      val jac = cn * 1000000L / (nbr(a).size + nbr(b).size - cn)
      (a, b) -> ((cn, ra, jac))
    }).toMap
  }

  test("path graph 1-2-3: endpoints are the one candidate, through the middle") {
    // deg(2) = 2, so ra = floor(1e12/2); jaccard = 1/(1+1-1) = 1
    val out = LinkPred.scores(Seq((1L, 2L), (2L, 3L)).toDF("a", "b"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    out shouldBe Set((1L, 3L, 1L, 500000000000L, 1000000L))
  }

  test("existing edges are never candidates (triangle has no output)") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    LinkPred.scores(tri).count() shouldBe 0
  }

  test("matches the naive set-algebra reference on a deterministic random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 300).map { _ =>
      val a = rnd.nextInt(30).toLong; val b = rnd.nextInt(30).toLong; (a, b)
    }.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val got = LinkPred.scores(edges.toSeq.toDF("a", "b"), hubCap = 1000L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (a, b, cn, ra, j) => (a, b) -> ((cn, ra, j)) }.toMap
    got shouldBe naive(edges)
  }

  test("hub cap: wedges through a super-hub are excluded, others survive") {
    // star through hub 100 (degree 5) + a path a-z-b (deg(z) = 2)
    val star = (1L to 5L).map(i => (i, 100L))
    val path = Seq((10L, 50L), (11L, 50L))
    val df = (star ++ path).toDF("a", "b")
    // cap 4 excludes the hub's C(5,2) = 10 wedge pairs; z = 50 survives
    val capped = LinkPred.scores(df, hubCap = 4L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    capped shouldBe Set((10L, 11L, 1L, 500000000000L, 1000000L))
    // without the cap the hub pairs appear too
    LinkPred.scores(df, hubCap = 1000L).count() shouldBe 11
  }
}
