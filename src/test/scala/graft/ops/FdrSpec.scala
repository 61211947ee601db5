package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Exact sign-test p-values + BH step-up: p matches the closed-form
  * binomial tail, strong effects are rejected while nulls survive, and
  * the BH rejection set is a prefix of the p-ranked order.
  */
class FdrSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(cells: Seq[(String, Long, Long, Long)]) =
    Fdr.bh(cells.toDF("k1", "k2", "n", "k"))
      .orderBy("rk")
      .as[(String, Long, Long, Long, Long, Long, Int)]
      .collect()

  private def pExact(n: Int, k: Int): Long = {
    val j = math.min(k, n - k)
    val s = (0 to j).map(i =>
      (BigInt(1) to BigInt(i)).foldLeft(BigInt(1))((a, x) =>
        a * (n - x.toInt + 1) / x)).sum
    (BigInt(2) * s * 1000000 / (BigInt(1) << n)).min(1000000).toLong
  }

  test("p_fp equals the exact two-sided binomial tail") {
    val cells = Seq(("a", 0L, 10L, 8L), ("b", 0L, 40L, 40L),
      ("c", 0L, 7L, 3L), ("d", 0L, 40L, 20L))
    val out = run(cells)
    val byKey = out.map(r => r._1 -> r._5).toMap
    byKey("a") shouldBe pExact(10, 8) // = 109375
    byKey("a") shouldBe 109375L
    byKey("b") shouldBe pExact(40, 40) // ~ 2/2^40 * 1e6 -> 0
    byKey("b") shouldBe 0L
    byKey("c") shouldBe pExact(7, 3)
    byKey("d") shouldBe 1000000L // k = n/2 caps at 1
  }

  test("strong effects reject, nulls survive, rejections are a " +
    "rank prefix") {
    val effects = (0 until 3).map(i => (s"eff$i", i.toLong, 40L, 40L))
    val nulls = (0 until 50).map(i => (s"null$i", i.toLong, 40L, 20L))
    val out = run(effects ++ nulls)
    out.filter(_._1.startsWith("eff")).map(_._7).sum shouldBe 3
    out.filter(_._1.startsWith("null")).map(_._7).sum shouldBe 0
    // prefix property: once a row is not rejected, no later rank is
    val rejectsByRank = out.sortBy(_._6).map(_._7)
    rejectsByRank.zip(rejectsByRank.tail).count {
      case (a, b) => b > a } shouldBe 0
  }

  test("BH is more permissive than Bonferroni but still rank-limited") {
    // 10 cells with p ~ 0.038 each (n=40, k=27 -> j=13): Bonferroni at
    // 0.05/10 = 0.005 rejects none; BH rejects all ten iff
    // p <= 0.05 * 10/10 = 0.05 -> all rejected.
    val cells = (0 until 10).map(i => (s"c$i", i.toLong, 40L, 27L))
    val out = run(cells)
    all(out.map(_._7)) shouldBe 1
    out.head._5 should be > 5000L // would fail Bonferroni
  }

  test("empty-effect grid rejects nothing") {
    val out = run((0 until 20).map(i => (s"n$i", i.toLong, 30L, 15L)))
    out.map(_._7).sum shouldBe 0
  }
}
