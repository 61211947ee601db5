package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Fellegi-Sunter EM on a planted pattern-count frame: duplicates agree
  * on (almost) every field, non-matches on (almost) none — EM must
  * separate them, the weight must be monotone in agreement count along
  * a chain, and all fitted parameters must respect the clamps.
  */
class LinkageEmSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** (a1, a2, a3, cnt): 100 planted duplicates at (1,1,1), 30 near-dups
    * at (1,1,0), a 5000-pair non-match mass at (0,0,0) and thin
    * accidental-agreement tails — the classic bimodal linkage shape.
    */
  private lazy val out = LinkageEm.run(Seq(
    (1L, 1L, 1L, 100L), (1L, 1L, 0L, 30L), (1L, 0L, 0L, 200L),
    (0L, 1L, 0L, 150L), (0L, 0L, 1L, 120L), (0L, 0L, 0L, 5000L))
    .toDF("a1", "a2", "a3", "cnt"))
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
      (r.getLong(4), r.getLong(11)))
    .toMap // pattern -> (w_fp, p_fp)

  test("full agreement scores near 1e6, full disagreement near 0") {
    out((1L, 1L, 1L))._1 should be > 900000L
    out((0L, 0L, 0L))._1 should be < 100000L
  }

  test("weight is monotone in agreements along a chain") {
    out((1L, 1L, 1L))._1 should be > out((1L, 1L, 0L))._1
    out((1L, 1L, 0L))._1 should be > out((1L, 0L, 0L))._1
    out((1L, 0L, 0L))._1 should be > out((0L, 0L, 0L))._1
  }

  test("fitted p respects the clamps and the planted match share") {
    val p = out.values.head._2
    p should be >= 10000L
    p should be <= 990000L
    // ~130 true matches of 5600 pairs ≈ 2.3%; EM should land well under
    // the 50% init and above the floor
    p should be < 200000L
  }
}
