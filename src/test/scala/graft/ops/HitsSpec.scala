package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** HITS invariants on hand-analyzable graphs, plus parity with a serial
  * integer reference (the same max-normalized recurrence computed in
  * plain Scala) and physical-layout independence.
  */
class HitsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Scale = 1000000L

  /** Serial reference: identical integer recurrence. */
  private def serialHits(
      edges: Set[(String, String)], iters: Int): Map[String, (Long, Long)] = {
    val e = edges.filter { case (a, b) => a != b }
    val nodes = e.flatMap { case (a, b) => Seq(a, b) }
    var hub = nodes.map(_ -> Scale).toMap
    var auth = hub
    for (_ <- 1 to iters) {
      val ar = nodes.map(n => n -> e.filter(_._2 == n).toSeq.map(x => hub(x._1)).sum).toMap
      val am = math.max(ar.values.max, 1L)
      auth = ar.map { case (n, v) => n -> v * Scale / am }
      val hr = nodes.map(n => n -> e.filter(_._1 == n).toSeq.map(x => auth(x._2)).sum).toMap
      val hm = math.max(hr.values.max, 1L)
      hub = hr.map { case (n, v) => n -> v * Scale / hm }
    }
    nodes.map(n => n -> (hub(n), auth(n))).toMap
  }

  private def run(edges: Seq[(String, String)], parts: Int = 4): Map[String, (Long, Long)] =
    Hits.run(edges.toDF("src", "dst").repartition(parts))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("star: the center is the unique top hub, leaves are the authorities") {
    val edges = (1 to 5).map(i => ("hub", s"leaf$i"))
    val got = run(edges)
    got("hub")._1 shouldBe Scale // max-normalized top hub
    for (i <- 1 to 5) {
      got(s"leaf$i")._2 shouldBe Scale // symmetric authorities all at max
      got(s"leaf$i")._1 shouldBe 0L // leaves point at nothing
    }
    got("hub")._2 shouldBe 0L // nothing points at the center
  }

  test("matches the serial integer recurrence on a mixed digraph") {
    val edges = Set(
      ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"),
      ("d", "b"), ("e", "a"), ("b", "e"))
    run(edges.toSeq) shouldBe serialHits(edges, 5)
  }

  test("results are identical under repartitioning and input duplication") {
    val edges = Seq(("x", "y"), ("y", "z"), ("x", "z"), ("z", "x"))
    val dup = edges ++ edges ++ edges.map(identity)
    run(edges, parts = 1) shouldBe run(dup, parts = 7)
  }
}
