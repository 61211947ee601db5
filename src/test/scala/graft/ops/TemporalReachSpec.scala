package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Temporal reachability invariants: time-respecting semantics (a
  * backwards-in-time edge sequence is NOT a path), earliest arrival vs
  * a serial reference, the relaxation subtlety (an earlier arrival
  * unlocks earlier outgoing edges in later rounds), and layout
  * independence.
  */
class TemporalReachSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Serial reference: Bellman-Ford over time-respecting paths. */
  private def serialReach(
      edges: Seq[(String, String, Long)], seeds: Set[String],
      rounds: Int): Map[String, Long] = {
    var arr = seeds.map(_ -> -1L).toMap
    for (_ <- 1 to rounds) {
      val relaxed = edges.flatMap { case (u, v, d) =>
        arr.get(u).filter(d >= _).map(_ => v -> d)
      }
      arr = (arr.toSeq ++ relaxed).groupBy(_._1)
        .map { case (n, vs) => n -> vs.map(_._2).min }
    }
    arr
  }

  private def run(edges: Seq[(String, String, Long)], seeds: Seq[String],
      rounds: Int = 4, parts: Int = 4): Map[String, Long] =
    TemporalReach.run(edges.toDF("src", "dst", "day").repartition(parts),
        seeds.toDF("node"), rounds)
      .as[(String, Long)].collect().toMap

  test("a backwards-in-time chain is unreachable; forward chain arrives") {
    val edges = Seq(
      ("s", "a", 10L), ("a", "b", 5L),  // b only via day-5 edge AFTER day 10
      ("s", "c", 3L), ("c", "d", 7L))   // forward in time
    val got = run(edges, Seq("s"))
    got.get("b") shouldBe None
    got("d") shouldBe 7L
    got("a") shouldBe 10L
    got("c") shouldBe 3L
    got("s") shouldBe -1L
  }

  test("matches the serial reference on a dense temporal graph") {
    val rnd = new scala.util.Random(5)
    val edges = (0 until 120).map { _ =>
      (s"n${rnd.nextInt(15)}", s"n${rnd.nextInt(15)}", rnd.nextInt(30).toLong)
    }.filter { case (u, v, _) => u != v }
    val seeds = Set("n0", "n7")
    run(edges, seeds.toSeq, rounds = 5) shouldBe
      serialReach(edges, seeds, rounds = 5)
  }

  test("an earlier arrival found later unlocks an earlier ongoing edge") {
    // s -> m day 9 (1 hop); s -> x day 1 -> m day 2 (arrives day 2);
    // m -> t exists only on day 4: reachable ONLY via the day-2 arrival,
    // which itself needs 2 relaxation rounds — then day 4 >= 2 fires
    val edges = Seq(
      ("s", "m", 9L), ("s", "x", 1L), ("x", "m", 2L), ("m", "t", 4L))
    val got = run(edges, Seq("s"), rounds = 4)
    got("m") shouldBe 2L
    got("t") shouldBe 4L
    // round 1 only reaches m at day 9 (via the direct edge) and x at 1;
    // round 2 improves m to day 2 via x; round 3 finally unlocks m->t
    val oneRound = run(edges, Seq("s"), rounds = 1)
    oneRound("m") shouldBe 9L
    oneRound.get("t") shouldBe None
    val twoRounds = run(edges, Seq("s"), rounds = 2)
    twoRounds("m") shouldBe 2L
    twoRounds.get("t") shouldBe None
  }

  test("identical under repartitioning and duplicate edges") {
    val edges = Seq(("s", "a", 2L), ("a", "b", 3L), ("s", "b", 9L))
    run(edges ++ edges, Seq("s"), parts = 7) shouldBe run(edges, Seq("s"))
  }
}
