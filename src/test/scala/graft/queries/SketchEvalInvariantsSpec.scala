package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, TestSpark}

/** Semantic invariants of the round-7 sketch-quality tier, checked on
  * the real sf0.001 fixtures THROUGH the registry (the oracle gate
  * proves cross-engine equality; these pin that what both engines agree
  * on is also CORRECT sketch behavior).
  */
class SketchEvalInvariantsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("theta intersection: sketch bounds and small-set exactness") {
    val rows = SparkEntry.queries("q_theta_intersect")(spark, sf).collect()
    rows should not be empty
    val K = graft.ops.Kmv.K
    val full = 1152921504606846976L // 2^60
    rows.foreach { r =>
      val nCommon = r.getAs[Long]("n_common")
      val theta = r.getAs[Long]("theta_min")
      val est = r.getAs[Long]("est_inter")
      val exact = r.getAs[Long]("n_exact")
      nCommon should be <= K.toLong
      theta should be <= full
      // when both sketches retained everything (theta = 2^60) the
      // estimate IS the exact intersection
      if (theta == full) est shouldBe exact
      // estimate is nonnegative and zero only with zero evidence
      est should be >= 0L
      if (nCommon > 0) est should be > 0L
      // K = 64 KMV intersection has ~1/sqrt(K) relative error; allow a
      // generous 5x band — a violation means broken algebra, not noise
      if (exact >= 20)
        math.abs(est - exact).toDouble / exact should be < 0.75
    }
  }

  test("bloom eval: no false negatives, counts consistent") {
    val r = SparkEntry.queries("q_bloom_eval")(spark, sf).collect().head
    val nUniverse = r.getAs[Long]("n_universe")
    val nMembers = r.getAs[Long]("n_members")
    val bitsSet = r.getAs[Long]("bits_set")
    val nPass = r.getAs[Long]("n_pass")
    val nFp = r.getAs[Long]("n_false_pos")
    // every member's own bits are in the filter: members always pass
    nPass should be >= nMembers
    nFp shouldBe (nPass - nMembers)
    nPass should be <= nUniverse
    // 3 hashes per member, minus collisions
    bitsSet should be <= 3 * nMembers
    bitsSet should be > 0L
  }

  test("LSH S-curve: monotone-consistent with the analytic curve") {
    val rows = SparkEntry.queries("q_lsh_scurve")(spark, sf)
      .collect().sortBy(_.getAs[Long]("bucket"))
    rows should not be empty
    rows.foreach { r =>
      val nPairs = r.getAs[Long]("n_pairs")
      val nCand = r.getAs[Long]("n_cand")
      nCand should be <= nPairs
    }
    val lo = rows.head
    val hi = rows.last
    // the corpus is bimodal: the bottom bucket collides ~never, the top
    // bucket ~always — and the analytic curve agrees directionally
    lo.getAs[Long]("bucket") shouldBe 0L
    hi.getAs[Long]("bucket") should be >= 8L
    lo.getAs[Long]("emp_rate_fp") should be < 50000L // < 5%
    hi.getAs[Long]("emp_rate_fp") should be > 900000L // > 90%
    lo.getAs[Long]("analytic_fp") should be < hi.getAs[Long]("analytic_fp")
  }

  test("james-stein: shrunk means lie between arm mean and grand mean") {
    val rows = SparkEntry.queries("q_james_stein")(spark, sf).collect()
    rows.length should be >= 4 // k >= 4 arms for the estimator to apply
    val grandApprox = rows.map(_.getAs[Long]("mean_fp")).sum / rows.length
    rows.foreach { r =>
      val mean = r.getAs[Long]("mean_fp")
      val shrunk = r.getAs[Long]("shrunk_fp")
      val c = r.getAs[Long]("c_fp")
      c should be >= 0L
      c should be <= 1000000L
      // shrunk value is a convex combination: between the arm mean and
      // (approximately) the grand mean, so within the span (pad 1 fp
      // unit for the floor quantization)
      val loB = math.min(mean, grandApprox) - 1
      val hiB = math.max(mean, grandApprox) + 1
      shrunk should be >= loB
      shrunk should be <= hiB
    }
  }
}
