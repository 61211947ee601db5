package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.TestSpark

/** Token LCS: known values, edges, a brute-force property (the rolling
  * DP must agree with enumerating all subsequences of the shorter side),
  * and SQL-registration / codegen agreement.
  */
class LcsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sqlLcs(a: Seq[String], b: Seq[String]): Long = {
    val df = Seq((a, b)).toDF("a", "b")
      .select(expr("lcs_len(a, b)").as("s"))
    df.as[Long].head()
  }

  test("known values") {
    sqlLcs(Seq("a", "b", "c", "d"), Seq("a", "x", "c", "y")) shouldBe 2L
    sqlLcs(Seq("the", "cat", "sat"), Seq("the", "dog", "sat")) shouldBe 2L
    sqlLcs(Seq("a", "b", "c"), Seq("a", "b", "c")) shouldBe 3L
    sqlLcs(Seq("a", "b", "c"), Seq("c", "b", "a")) shouldBe 1L
    // subsequence need not be contiguous
    sqlLcs(Seq("a", "x", "b", "y", "c"), Seq("a", "b", "c")) shouldBe 3L
  }

  test("edges: empty sides, repeated tokens") {
    sqlLcs(Seq.empty, Seq("a")) shouldBe 0L
    sqlLcs(Seq("a"), Seq.empty) shouldBe 0L
    sqlLcs(Seq.empty, Seq.empty) shouldBe 0L
    sqlLcs(Seq("a", "a", "a"), Seq("a", "a")) shouldBe 2L
    sqlLcs(Seq("a", "b", "a", "b"), Seq("b", "a", "b", "a")) shouldBe 3L
  }

  test("null element poisons to null (vec_dot convention)") {
    val df = Seq(1).toDF("i")
      .select(expr("lcs_len(array('a', cast(null as string)), array('a'))")
        .as("s"))
    df.collect().head.isNullAt(0) shouldBe true
  }

  /** Exponential reference: longest common subsequence by enumerating
    * subsequences of the shorter side, longest-first.
    */
  private def bruteLcs(a: Seq[String], b: Seq[String]): Int = {
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    def isSubseq(x: Seq[String], y: Seq[String]): Boolean = {
      var i = 0
      y.foreach { tok => if (i < x.length && x(i) == tok) i += 1 }
      i == x.length
    }
    // enumerate INDEX combinations, not element combinations — Scala's
    // Seq.combinations regroups duplicate elements by first appearance,
    // which fabricates non-subsequences and misses real ones
    (s.length to 0 by -1).find { k =>
      s.indices.combinations(k).exists(idx => isSubseq(idx.map(s), t))
    }.get
  }

  test("property: DP agrees with brute force on 60 seeded random pairs") {
    // batch all pairs through ONE DataFrame pass (per-pair head() would
    // pay 60 jobs), compare against the exponential reference
    val tokGen = Gen.oneOf("a", "b", "c", "d")
    val pairGen = for {
      n <- Gen.choose(0, 7); a <- Gen.listOfN(n, tokGen)
      m <- Gen.choose(0, 7); b <- Gen.listOfN(m, tokGen)
    } yield (a, b)
    val pairs = (0 until 60).map { seed =>
      pairGen(Gen.Parameters.default, Seed(seed.toLong)).getOrElse(fail("gen"))
    }
    val got = pairs.toDF("a", "b")
      .select(expr("lcs_len(a, b)").as("s")).as[Long].collect()
    got.zip(pairs).foreach { case (g, (a, b)) =>
      withClue(s"a=$a b=$b") { g shouldBe bruteLcs(a, b).toLong }
    }
  }

  test("column API matches SQL registration") {
    val df = Seq((Seq("p", "q", "r"), Seq("p", "r"))).toDF("a", "b")
    df.select(Lcs.lcsLen(col("a"), col("b")).as("s")).as[Long].head() shouldBe
      sqlLcs(Seq("p", "q", "r"), Seq("p", "r"))
  }
}
