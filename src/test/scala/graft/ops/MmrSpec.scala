package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** MMR greedy selection: the diversity trade-off on a hand case, and
  * exact parity with a serial reference implementation.
  */
class MmrSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def run(
      cand: Seq[(Long, Long, Long)], sims: Seq[(Long, Long, Long, Long)],
      k: Int): Seq[(Long, Long, Int)] = {
    import spark.implicits._
    Mmr.rerank(
      cand.toDF("q_id", "c_id", "rel_fp"),
      sims.toDF("q_id", "a", "b", "s_fp"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sortBy(x => (x._1, x._3))
  }

  /** Serial greedy reference: argmax(rel - max-sim-to-selected), ties by id. */
  private def serial(
      cand: Seq[(Long, Long)], sim: Map[(Long, Long), Long],
      k: Int): Seq[Long] = {
    val picked = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (picked.length < k && picked.length < cand.length) {
      val best = cand.filterNot(c => picked.contains(c._1)).map {
        case (id, rel) =>
          val msim =
            if (picked.isEmpty) 0L
            else picked.map(p => sim((id, p))).max
          (id, if (picked.isEmpty) (rel, -id) else (rel - msim, -id))
      }.maxBy(_._2)
      picked += best._1
    }
    picked.toSeq
  }

  test("near-duplicate runner-up is displaced by a diverse lower-relevance candidate") {
    // A=.99, B=.98 but sim(A,B)=.95 (near-copies); C=.70, dissimilar.
    // Pure relevance: A,B,C. MMR(1/2): A, then C (.70-.10 > .98-.95), then B.
    val cand = Seq((0L, 1L, 990000L), (0L, 2L, 980000L), (0L, 3L, 700000L))
    val sims = for {
      (a, b, s) <- Seq((1L, 2L, 950000L), (1L, 3L, 100000L), (2L, 3L, 100000L))
      row <- Seq((0L, a, b, s), (0L, b, a, s))
    } yield row
    run(cand, sims, 3).map(_._2) shouldBe Seq(1L, 3L, 2L)
  }

  test("matches the serial greedy reference on a deterministic synthetic instance") {
    val cand = for (q <- 0L until 4L; c <- 0L until 15L)
      yield (q, c, ((c * 7919 + q * 104729) % 1000000))
    val sims = for {
      q <- 0L until 4L; a <- 0L until 15L; b <- 0L until 15L if a != b
    } yield {
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      (q, a, b, ((lo * 31 + hi * 17 + q * 7) % 900000))
    }
    val got = run(cand.toSeq, sims.toSeq, 5)
    for (q <- 0L until 4L) {
      val simMap = sims.collect { case (`q`, a, b, s) => (a, b) -> s }.toMap
      val expect = serial(
        cand.collect { case (`q`, c, r) => (c, r) }.toSeq, simMap.toMap, 5)
      got.filter(_._1 == q).sortBy(_._3).map(_._2) shouldBe expect
    }
  }
}
