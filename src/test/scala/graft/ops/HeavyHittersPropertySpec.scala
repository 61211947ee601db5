package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Misra-Gries invariants under randomized streams and ARBITRARY merge
  * trees (Spark's partial-aggregate merge order is nondeterministic, so
  * the bounds must hold for any split of the stream and any merge
  * order — the Agarwal et al. mergeable-summaries result the
  * `Aggregator` relies on). Driver-side only: the distributed path is
  * pinned in HeavyHittersSpec; this pins the algebra.
  */
class HeavyHittersPropertySpec extends AnyFunSuite with Matchers {

  private val streamGen: Gen[List[String]] = for {
    n <- Gen.choose(50, 2000)
    toks <- Gen.listOfN(n, Gen.frequency(
      4 -> Gen.oneOf("h1", "h2", "h3"),
      6 -> Gen.choose(0, 400).map(i => s"t$i")))
  } yield toks

  private def checkBounds(
      sketch: Map[String, Long], exact: Map[String, Long],
      n: Long, k: Int, clue: String): Unit = {
    withClue(clue) {
      sketch.size should be <= k - 1
      for ((t, c) <- exact if c > n / k) sketch.keySet should contain(t)
      for ((t, est) <- sketch) {
        est should be <= exact(t)
        est should be >= exact(t) - n / k
      }
    }
  }

  test("bounds hold for sequential folds and random merge trees (40 seeded streams x 3 k)") {
    for (seed <- 0 until 40; k <- Seq(4, 8, 16)) {
      val toks = streamGen(Gen.Parameters.default, Seed(seed.toLong))
        .getOrElse(fail("gen"))
      val mg = new HeavyHitters.MisraGries(k)
      val exact = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val n = toks.size.toLong

      val sequential = toks.foldLeft(mg.zero)(mg.reduce)
      checkBounds(sequential, exact, n, k, s"sequential seed=$seed k=$k")

      // random partition of the stream, random merge order
      val rnd = new scala.util.Random(seed * 31 + k)
      val parts = {
        val cuts = Seq.fill(rnd.nextInt(5))(rnd.nextInt(toks.size)).sorted
        (0 +: cuts :+ toks.size).sliding(2)
          .map { case Seq(a, b) => toks.slice(a, b) }
          .filter(_.nonEmpty).toList
      }
      val sketches = rnd.shuffle(parts.map(_.foldLeft(mg.zero)(mg.reduce)))
      val merged = sketches.reduceLeft(mg.merge)
      checkBounds(merged, exact, n, k, s"merged seed=$seed k=$k parts=${parts.size}")
    }
  }
}
