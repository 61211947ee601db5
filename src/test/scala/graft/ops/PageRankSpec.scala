package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Exact integer fixed-point PageRank: hand-computed recurrence values,
  * structural invariants (mass conservation up to floor loss, ring
  * uniformity), and determinism across partitioning.
  */
class PageRankSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def ranks(edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    import spark.implicits._
    PageRank.run(edges.toDF("src", "dst"), iters = iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("one dangling-node iteration matches the hand-computed recurrence") {
    // A -> B, n=2: B is dangling with mass 1e9 -> 5e8 per node.
    // r'(A) = 15e7 + (85 * (0    + 5e8)) div 100 = 575_000_000
    // r'(B) = 15e7 + (85 * (1e9  + 5e8)) div 100 = 1_425_000_000
    val r = ranks(Seq("A" -> "B"), iters = 1)
    r("A") shouldBe 575000000L
    r("B") shouldBe 1425000000L
    r.values.sum shouldBe 2000000000L // full mass conserved here (no floor loss)
  }

  test("a directed ring stays exactly uniform at every iteration") {
    // outdeg=1 everywhere: r' = 15e7 + 85*r div 100 has fixpoint r = scale
    val ring = (0 until 7).map(i => s"n$i" -> s"n${(i + 1) % 7}")
    val r = ranks(ring, iters = 4)
    r.values.toSet shouldBe Set(1000000000L)
  }

  test("mass is conserved up to integer floor loss on a skewed graph") {
    // star + chain + dangling sink: floor ops only ever LOSE mass, at
    // most ~100 units per node per round (div 100 truncation + split)
    val edges = Seq(
      "h" -> "a", "h" -> "b", "h" -> "c", "a" -> "h", "b" -> "h",
      "c" -> "sink", "x" -> "h")
    val n = 6
    val total = n * 1000000000L
    val r = ranks(edges, iters = 10)
    val sum = r.values.sum
    sum should be <= total
    sum should be > (total - 10L * n * 200L)
    // the hub out-ranks every spoke
    r("h") should be > r("a")
    r("a") shouldBe r("b") // symmetric spokes tie exactly
  }

  test("TrustRank: one seeded iteration matches the hand-computed recurrence") {
    import spark.implicits._
    // A -> B, seeds={A}: base(A) = (15*2*1e9) div 100 = 3e8, base(B)=0;
    // all dangling mass (B's 1e9) teleports to A
    // r'(A) = 3e8 + (85 * (0   + 1e9)) div 100 = 1_150_000_000
    // r'(B) = 0   + (85 * (1e9 + 0  )) div 100 =   850_000_000
    val r = PageRank.run(
      Seq("A" -> "B").toDF("src", "dst"), iters = 1,
      seeds = Some(Seq("A").toDF("node")))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    r("A") shouldBe 1150000000L
    r("B") shouldBe 850000000L
  }

  test("TrustRank with seeds = all nodes degenerates to uniform PageRank") {
    import spark.implicits._
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c", "d" -> "a")
    val uniform = ranks(edges, iters = 6)
    val allSeeds = Seq("a", "b", "c", "d").toDF("node")
    val seeded = PageRank.run(
      edges.toDF("src", "dst"), iters = 6, seeds = Some(allSeeds))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    seeded shouldBe uniform
  }

  test("TrustRank: trust decays with distance from the seed") {
    import spark.implicits._
    // chain s -> m -> t plus a back edge t -> s keeping the graph live
    val edges = Seq("s" -> "m", "m" -> "t", "t" -> "s")
    val r = PageRank.run(
      edges.toDF("src", "dst"), iters = 12,
      seeds = Some(Seq("s").toDF("node")))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    r("s") should be > r("m")
    r("m") should be > r("t")
  }

  test("result is bit-identical across input partitioning") {
    import spark.implicits._
    val edges = (0 until 200).map(i => s"v${i % 37}" -> s"v${(i * 13) % 41}")
    val one = PageRank.run(edges.toDF("src", "dst").repartition(1), iters = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    val many = PageRank.run(edges.toDF("src", "dst").repartition(17), iters = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    one shouldBe many
  }
}
