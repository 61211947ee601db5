package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** k-center invariants: parity with a serial farthest-point reference,
  * planted-cluster coverage (one pick per well-separated cluster before
  * any second pick inside one), and no re-picking.
  */
class KCenterSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    def dot(x: Seq[Float], y: Seq[Float]) =
      x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  }

  /** Serial farthest-point traversal under the same tie rules. */
  private def serialKCenter(
      vecs: Seq[(Long, Seq[Float])], k: Int): Seq[Long] = {
    var picks = Vector(vecs.minBy(_._1))
    var best = vecs.map(v => v._1 -> cos(v._2, picks.head._2)).toMap
    for (_ <- 2 to k) {
      val next = vecs.minBy(v => (best(v._1), v._1))
      picks :+= next
      best = vecs.map(v =>
        v._1 -> math.max(best(v._1), cos(v._2, next._2))).toMap
    }
    picks.map(_._1)
  }

  private def run(vecs: Seq[(Long, Seq[Float])], k: Int): Seq[Long] =
    KCenter.select(vecs.toDF("vec_id", "embedding").repartition(3), k)
      .as[(Int, Long)].collect().sortBy(_._1).map(_._2).toSeq

  test("matches the serial farthest-point reference") {
    val rnd = new scala.util.Random(17)
    val vecs = (1L to 60L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 2f - 1f)))
    run(vecs, 6) shouldBe serialKCenter(vecs, 6)
  }

  test("three well-separated clusters are each covered before any repeat") {
    // clusters along three orthogonal axes with small jitter
    def cluster(axis: Int, base: Long) = (0 until 10).map { j =>
      val v = Array.fill(6)(0.01f * ((j + axis) % 3))
      v(axis * 2) = 1f
      (base + j, v.toSeq)
    }
    val vecs = cluster(0, 100L) ++ cluster(1, 200L) ++ cluster(2, 300L)
    val picks = run(vecs, 3)
    picks.map(_ / 100).toSet shouldBe Set(1L, 2L, 3L) // one per cluster
  }

  test("no point is picked twice") {
    val rnd = new scala.util.Random(3)
    val vecs = (1L to 20L).map(i => (i, Seq.fill(4)(rnd.nextFloat())))
    val picks = run(vecs, 8)
    picks.distinct.length shouldBe picks.length
  }
}
