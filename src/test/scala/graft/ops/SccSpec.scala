package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Pointer-doubling SCC vs a serial brute force (walk every node's rho)
  * on planted functional graphs.
  */
class SccSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  /** Serial reference: follow succ from each node, split cycle/tail. */
  private def serial(n: Long, succ: Long => Long)
      : Map[Long, (Long, Boolean, Long)] = {
    // cycle nodes: iterate n steps to land on the cycle, then walk it
    val onCycle = (0L until n).flatMap { v =>
      var x = v
      (0L until n).foreach(_ => x = succ(x))
      // x is on a cycle; collect it
      val cyc = scala.collection.mutable.ArrayBuffer(x)
      var y = succ(x)
      while (y != x) { cyc += y; y = succ(y) }
      cyc
    }.toSet
    (0L until n).map { v =>
      if (onCycle(v)) {
        var x = succ(v)
        val cyc = scala.collection.mutable.ArrayBuffer(v)
        while (x != v) { cyc += x; x = succ(x) }
        (v, (cyc.min, true, cyc.size.toLong))
      } else (v, (v, false, 1L))
    }.toMap
  }

  test("quadratic map matches the serial reference exactly") {
    import spark.implicits._
    val n = 300L
    def succ(k: Long): Long = (k * k + 1) % n
    val nodes = (0L until n).toDF("v")
    val got = Scc.run(spark, nodes,
      (k, m) => (k * k + org.apache.spark.sql.functions.lit(1L)) %
        org.apache.spark.sql.functions.lit(m))
      .as[(Long, Long, Boolean, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    got shouldBe serial(n, succ)
    // the rho shape is non-trivial: some cycles, some tails
    got.values.count(_._2) should be > 0
    got.values.count(!_._2) should be > 0
  }

  test("pure permutation: every node cyclic, singleton tails absent") {
    import spark.implicits._
    val n = 64L
    def succ(k: Long): Long = (k + 17) % n // bijective shift: one cycle
    val nodes = (0L until n).toDF("v")
    val got = Scc.run(spark, nodes,
      (k, m) => (k + org.apache.spark.sql.functions.lit(17L)) %
        org.apache.spark.sql.functions.lit(m))
      .as[(Long, Long, Boolean, Long)].collect()
    got.foreach { case (_, sccId, onCycle, size) =>
      onCycle shouldBe true
      sccId shouldBe 0L
      size shouldBe n
    }
  }

  test("all self-loops: every node its own cyclic singleton SCC") {
    import spark.implicits._
    val n = 10L
    val nodes = (0L until n).toDF("v")
    val got = Scc.run(spark, nodes, (k, _) => k)
      .as[(Long, Long, Boolean, Long)].collect()
    got.foreach { case (v, sccId, onCycle, size) =>
      sccId shouldBe v
      onCycle shouldBe true
      size shouldBe 1L
    }
  }

  test("runFull: term_id is the downstream cycle's id for every node") {
    import spark.implicits._
    val n = 300L
    def succ(k: Long): Long = (k * k + 1) % n
    // serial terminal id: walk n steps (lands on the cycle), then take
    // the min over that cycle
    def termOf(v: Long): Long = {
      var x = v
      (0L until n).foreach(_ => x = succ(x))
      var mn = x
      var y = succ(x)
      while (y != x) { mn = math.min(mn, y); y = succ(y) }
      mn
    }
    val nodes = (0L until n).toDF("v")
    val got = Scc.runFull(spark, nodes,
      (k, m) => (k * k + org.apache.spark.sql.functions.lit(1L)) %
        org.apache.spark.sql.functions.lit(m))
      .select("node", "on_cycle", "scc_id", "term_id")
      .as[(Long, Boolean, Long, Long)].collect()
    got.foreach { case (v, onCycle, sccId, termId) =>
      termId shouldBe termOf(v)
      if (onCycle) termId shouldBe sccId
    }
  }
}
