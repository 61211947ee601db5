package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

// top-level: Spark encoders cannot instantiate test-class-nested case
// classes (outer-scope capture)
case class LttbSpecPoint(sym: String, t: Timestamp, id: Long, v: Double)

class LttbSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private type P = LttbSpecPoint
  private def P(sym: String, t: Timestamp, id: Long, v: Double): P =
    LttbSpecPoint(sym, t, id, v)

  /** Straight-line single-threaded LTTB with the op's exact integer
    * conventions — the independent reference the distributed pick must
    * equal bit-for-bit.
    */
  private def referenceLttb(
      points: Seq[P], b: Int, yScale: Long): Seq[(String, Long, Timestamp, Double)] =
    points.groupBy(_.sym).toSeq.flatMap { case (sym, ps0) =>
      val ps = ps0.sortBy(p => (p.t.getTime, p.id))
      val n = ps.length
      if (n < b + 2) ps.zipWithIndex.map { case (p, i) => (sym, i.toLong, p.t, p.v) }
      else {
        val minx = ps.map(p => Math.floorDiv(p.t.getTime, 1000L)).min
        def x(p: P) = Math.floorDiv(p.t.getTime, 1000L) - minx
        def y(p: P) = math.floor(p.v * yScale).toLong
        val interior = ps.slice(1, n - 1)
        val m = interior.length
        val bucket = (0 until b).map(k => interior.zipWithIndex.collect {
          case (p, i) if i.toLong * b / m == k => p
        })
        var prev = ps.head
        val picks = (0 until b).map { k =>
          val nxt = if (k == b - 1) Seq(ps.last) else bucket(k + 1)
          val (sx, sy, cnt) =
            (nxt.map(x).sum, nxt.map(y).sum, nxt.length.toLong)
          val sel = bucket(k).minBy { c =>
            val a = math.abs(
              (x(prev) * cnt - sx) * (y(c) - y(prev)) -
                (x(prev) - x(c)) * (sy - y(prev) * cnt))
            (-a, x(c), c.id)
          }
          prev = sel
          sel
        }
        (sym, 0L, ps.head.t, ps.head.v) +:
          picks.zipWithIndex.map { case (p, k) => (sym, k + 1L, p.t, p.v) } :+
          (sym, b + 1L, ps.last.t, ps.last.v)
      }
    }

  private def mkPoints(syms: Seq[String], n: Int): Seq[P] =
    for (s <- syms; i <- 0 until n) yield {
      // deterministic wavy series with jittered spacing and a spike
      val t = new Timestamp(1700000000000L + i * 9000L + (i * 37 % 5) * 250L)
      val v = math.floor((50 + 30 * math.sin(i * 0.7) +
        (if (i % 17 == 0) 40 else 0) + s.length) * 100) / 100.0
      P(s, t, i.toLong, v)
    }

  private def run(points: Seq[P], b: Int, parts: Int) = {
    import spark.implicits._
    Lttb.downsample(
      points.toDF("sym", "t", "id", "v").repartition(parts),
      "sym", "t", "id", "v", buckets = b)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
  }

  test("matches the single-threaded reference exactly (multi-symbol)") {
    val pts = mkPoints(Seq("aa", "bbb"), 60)
    run(pts, b = 6, parts = 5) shouldBe
      referenceLttb(pts, 6, 100L).sortBy(t => (t._1, t._2))
  }

  test("endpoints are always kept; output is buckets + 2 per long series") {
    val pts = mkPoints(Seq("s"), 40)
    val out = run(pts, b = 4, parts = 3)
    out should have length 6
    out.head._3 shouldBe pts.minBy(_.id).t // sel_idx 0 = first point
    out.last._3 shouldBe pts.maxBy(_.id).t // sel_idx B+1 = last point
    out.map(_._2) shouldBe (0L to 5L)
  }

  test("short series pass through untouched") {
    val pts = mkPoints(Seq("tiny"), 5)
    val out = run(pts, b = 6, parts = 2)
    out should have length 5
    out.map(_._4) shouldBe pts.sortBy(_.id).map(_.v)
  }

  test("partition-invariant (exact integer argmax, unique tie-break)") {
    val pts = mkPoints(Seq("p", "qq", "rrr"), 45)
    run(pts, 5, parts = 1) shouldBe run(pts, 5, parts = 11)
  }

  test("flat series: ties fall to the earliest (x, id) candidate") {
    val pts = (0 until 20).map(i =>
      P("flat", new Timestamp(1700000000000L + i * 1000L), i.toLong, 7.0))
    val out = run(pts, b = 3, parts = 4)
    // all areas are 0 -> each bucket keeps its first point
    out shouldBe referenceLttb(pts, 3, 100L).sortBy(t => (t._1, t._2))
  }
}
