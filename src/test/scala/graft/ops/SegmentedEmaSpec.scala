package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.functions.EwmAvg.ewmAvg

/** Equivalence of the segmented (intra-key parallel) EMA with the
  * sequential [[graft.functions.EwmAvg]] window function, per the FP
  * contract documented on [[SegmentedEma]]: bit-for-bit when the
  * arithmetic is exact or the series is one segment; <= 1e-12 relative
  * everywhere (boundary rounding contracts at (1-alpha)/row).
  */
class SegmentedEmaSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  /** Reference: EwmAvg over the equivalent window. */
  private def reference(rows: Seq[SegmentedEma.In], span: Int): Map[(String, Long, Long), Option[Double]] = {
    import spark.implicits._
    val w = Window.partitionBy(col("sym")).orderBy(col("ord"), col("tie"))
    rows.toDF()
      .withColumn("ema", ewmAvg(col("v"), span).over(w))
      .collect()
      .map(r => (r.getAs[String]("sym"), r.getAs[Long]("ord"), r.getAs[Long]("tie")) ->
        Option(r.getAs[java.lang.Double]("ema")).map(_.doubleValue()))
      .toMap
  }

  private def segmented(rows: Seq[SegmentedEma.In], span: Int): Map[(String, Long, Long), Option[Double]] = {
    import spark.implicits._
    SegmentedEma.ema(rows.toDS(), span).collect()
      .map(o => (o.sym, o.ord, o.tie) -> o.ema).toMap
  }

  test("dyadic arithmetic (span=3, integer values): bit-for-bit equal across random splits") {
    // alpha = 1/2: every recursion step is exact in binary FP, so the
    // affine composition and the sequential fold hit the same rationals
    val rows = for {
      sym <- Seq("A", "B"); i <- 0 until 60
    } yield SegmentedEma.In(sym, i / 13, i.toLong, i.toLong,
      if (sym == "B" && i % 11 == 0) None else Some(((i * 7 + sym.hashCode) % 16).abs.toDouble))
    val ref = reference(rows, span = 3)
    val got = segmented(rows, span = 3)
    got.keySet shouldBe ref.keySet
    for (k <- ref.keySet) withClue(s"row $k:") {
      // Option[Double] equality here is EXACT double equality
      got(k) shouldBe ref(k)
    }
  }

  test("single segment: replay IS the sequential recursion — bit-for-bit on arbitrary doubles") {
    val rows = (0 until 40).map(i =>
      SegmentedEma.In("X", 0L, i.toLong, 0L, Some(math.sin(i * 1.7) * 1000 + 0.123456789)))
    val ref = reference(rows, span = 10)
    segmented(rows, span = 10) shouldBe ref
  }

  test("property: ADVERSARIAL magnitudes (1e-300..1e300) stay within 1e-12 of EwmAvg, scaled to the series") {
    // guards the recursive/affine-summary equivalence where FP is most
    // fragile: values spanning the whole double exponent range, mixed
    // signs, random nulls and random segment boundaries. The sound
    // error yardstick at these magnitudes is the series' max |v| (the
    // EMA is a sub-convex combination, so both the value and the
    // accumulated rounding are bounded by that scale) — relative-to-
    // result would blow up whenever huge terms cancel to a tiny EMA.
    val gen: Gen[(Int, List[(Double, Boolean)])] = for {
      n <- Gen.choose(12, 60)
      chunk <- Gen.choose(1, 16)
      vals <- Gen.listOfN(n, for {
        e <- Gen.choose(-300, 300)
        m <- Gen.chooseNum(1.0, 10.0)
        neg <- Gen.oneOf(true, false)
      } yield (if (neg) -m else m) * math.pow(10.0, e.toDouble))
      nulls <- Gen.listOfN(n, Gen.prob(0.15))
    } yield (chunk, vals.zip(nulls))
    for (i <- 0 until 12) {
      val (chunk, data) = gen(Gen.Parameters.default, Seed(1000L + i)).get
      val rows = data.zipWithIndex.map { case ((v, isNull), j) =>
        SegmentedEma.In("P", (j / chunk).toLong, j.toLong, 0L,
          if (isNull) None else Some(v))
      }
      val scale = data.collect { case (v, false) => math.abs(v) }
        .foldLeft(1.0)(math.max)
      val ref = reference(rows, span = 10)
      val got = segmented(rows, span = 10)
      got.keySet shouldBe ref.keySet
      for (k <- ref.keySet) {
        (ref(k), got(k)) match {
          case (Some(a), Some(b)) =>
            withClue(s"seed $i row $k: $a vs $b (scale $scale)") {
              math.abs(a - b) should be <= 1e-12 * scale
            }
          case (a, b) => withClue(s"seed $i row $k nullness:") { a shouldBe b }
        }
      }
    }
  }

  test("property: random series + random segmentation stay within 1e-12 relative of EwmAvg") {
    val gen: Gen[(Int, List[(Double, Boolean)])] = for {
      n <- Gen.choose(12, 80)
      chunk <- Gen.choose(1, 20)
      vals <- Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6))
      nulls <- Gen.listOfN(n, Gen.prob(0.1))
    } yield (chunk, vals.zip(nulls))
    for (i <- 0 until 12) {
      val (chunk, data) = gen(Gen.Parameters.default, Seed(i.toLong)).get
      val rows = data.zipWithIndex.map { case ((v, isNull), j) =>
        SegmentedEma.In("P", (j / chunk).toLong, j.toLong, 0L,
          if (isNull) None else Some(v))
      }
      val ref = reference(rows, span = 10)
      val got = segmented(rows, span = 10)
      got.keySet shouldBe ref.keySet
      for (k <- ref.keySet) {
        (ref(k), got(k)) match {
          case (Some(a), Some(b)) =>
            val tol = 1e-12 * math.max(1.0, math.abs(a))
            withClue(s"seed $i row $k: $a vs $b") { math.abs(a - b) should be <= tol }
          case (a, b) => withClue(s"seed $i row $k nullness:") { a shouldBe b }
        }
      }
    }
  }
}
