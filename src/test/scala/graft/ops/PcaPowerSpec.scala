package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Fixed-point PCA: the integer power iteration must agree with a
  * double-precision reference on data with a known dominant direction
  * (up to sign — eigenvectors are direction-only), and be bit-identical
  * under repartitioning (exact integer arithmetic everywhere).
  */
class PcaPowerSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val d = 8
  // 200 points stretched along a fixed unit direction + small noise:
  // the principal component is unambiguous
  private val dir = {
    val raw = Array(0.5, -0.3, 0.2, 0.6, -0.1, 0.4, 0.2, -0.2)
    val n = math.sqrt(raw.map(x => x * x).sum)
    raw.map(_ / n)
  }
  private val rnd = new scala.util.Random(42)
  private val data: Seq[(Long, Seq[Float])] = (0 until 200).map { i =>
    val t = rnd.nextGaussian() * 3.0
    val v = (0 until d).map(k => (t * dir(k) + rnd.nextGaussian() * 0.05).toFloat)
    (i.toLong, v)
  }

  test("projections correlate ~1 with the exact principal projection") {
    val emb = data.toDF("vec_id", "embedding")
    val got = PcaPower.project(emb, d, iters = 8)
      .as[(Long, Long)].collect().toMap
    // double-precision reference: project on the known direction after
    // centering (the noise floor is 1e-3 of the signal, so the true PC1
    // and `dir` are interchangeable at the asserted tolerance)
    val mean = (0 until d).map(k => data.map(_._2(k).toDouble).sum / data.size)
    val ref = data.map { case (id, v) =>
      id -> (0 until d).map(k => (v(k) - mean(k)) * dir(k)).sum
    }.toMap
    val ids = got.keySet.toSeq
    val xs = ids.map(i => got(i).toDouble)
    val ys = ids.map(i => ref(i))
    def corr(a: Seq[Double], b: Seq[Double]): Double = {
      val ma = a.sum / a.size; val mb = b.sum / b.size
      val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      val sa = math.sqrt(a.map(x => (x - ma) * (x - ma)).sum)
      val sb = math.sqrt(b.map(x => (x - mb) * (x - mb)).sum)
      cov / (sa * sb)
    }
    math.abs(corr(xs, ys)) should be > 0.999
    got.size shouldBe 200
  }

  test("bit-identical under repartitioning") {
    val emb = data.toDF("vec_id", "embedding")
    val a = PcaPower.project(emb, d, iters = 6).orderBy("vec_id").collect()
    val b = PcaPower.project(emb.repartition(7), d, iters = 6)
      .orderBy("vec_id").collect()
    a should contain theSameElementsInOrderAs b
  }

  test("deflation recovers a second orthogonal direction") {
    // two orthogonal planted directions with distinct variances
    val d1 = Array(1.0, 0, 0, 0, 1.0, 0, 0, 0).map(_ / math.sqrt(2))
    val d2 = Array(0, 1.0, 0, 0, 0, -1.0, 0, 0).map(_ / math.sqrt(2))
    val rnd2 = new scala.util.Random(9)
    val pts = (0 until 300).map { i =>
      val t1 = rnd2.nextGaussian() * 5.0
      val t2 = rnd2.nextGaussian() * 2.0
      val v = (0 until d).map(k =>
        (t1 * d1(k) + t2 * d2(k) + rnd2.nextGaussian() * 0.02).toFloat)
      (i.toLong, v, t1, t2)
    }
    val emb = pts.map(p => (p._1, p._2)).toDF("vec_id", "embedding")
    val got = PcaPower.projectTop2(emb, d, iters = 10)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    def corr(a: Seq[Double], b: Seq[Double]): Double = {
      val ma = a.sum / a.size; val mb = b.sum / b.size
      val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      cov / (math.sqrt(a.map(x => (x - ma) * (x - ma)).sum) *
        math.sqrt(b.map(x => (x - mb) * (x - mb)).sum))
    }
    val ids = pts.map(_._1)
    val t1s = pts.map(_._3); val t2s = pts.map(_._4)
    val p1 = ids.map(i => got(i)._1.toDouble)
    val p2 = ids.map(i => got(i)._2.toDouble)
    math.abs(corr(p1, t1s)) should be > 0.99
    math.abs(corr(p2, t2s)) should be > 0.99
    // and the two scores are (near-)uncorrelated with the other factor
    math.abs(corr(p2, t1s)) should be < 0.1
  }

  test("looped deflation recovers three planted directions in variance order") {
    val d1 = Array(1.0, 0, 0, 0, 1.0, 0, 0, 0).map(_ / math.sqrt(2))
    val d2 = Array(0, 1.0, 0, 0, 0, -1.0, 0, 0).map(_ / math.sqrt(2))
    val d3 = Array(0, 0, 1.0, 1.0, 0, 0, 0, 0).map(_ / math.sqrt(2))
    val rnd3 = new scala.util.Random(17)
    val pts = (0 until 300).map { i =>
      val t1 = rnd3.nextGaussian() * 7.0
      val t2 = rnd3.nextGaussian() * 3.0
      val t3 = rnd3.nextGaussian() * 1.2
      val v = (0 until d).map(k =>
        (t1 * d1(k) + t2 * d2(k) + t3 * d3(k) + rnd3.nextGaussian() * 0.02).toFloat)
      (i.toLong, v, t1, t2, t3)
    }
    val emb = pts.map(p => (p._1, p._2)).toDF("vec_id", "embedding")
    val got = PcaPower.projectTopK(emb, d, k = 3, iters = 10)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    def corr(a: Seq[Double], b: Seq[Double]): Double = {
      val ma = a.sum / a.size; val mb = b.sum / b.size
      val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      cov / (math.sqrt(a.map(x => (x - ma) * (x - ma)).sum) *
        math.sqrt(b.map(x => (x - mb) * (x - mb)).sum))
    }
    val ids = pts.map(_._1)
    val facs = Seq(pts.map(_._3), pts.map(_._4), pts.map(_._5))
    val projs = Seq(
      ids.map(i => got(i)._1.toDouble),
      ids.map(i => got(i)._2.toDouble),
      ids.map(i => got(i)._3.toDouble))
    for (c <- 0 until 3) {
      math.abs(corr(projs(c), facs(c))) should be > 0.99
      // each later component is deflated clean of the earlier factors
      for (prev <- 0 until c)
        math.abs(corr(projs(c), facs(prev))) should be < 0.1
    }
  }
}
