package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Prefix-doubling suffix array vs a serial reference (sort the actual
  * suffix strings, dense-rank): exact rank parity incl. duplicate
  * documents (equal suffixes share ranks), the proper-prefix-first
  * order, and repartition bit-identity.
  */
class SuffixArraySpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def serial(docs: Seq[(Long, String)]): Map[(Long, Long), Long] = {
    val sfx = for {
      (id, t) <- docs
      p <- 1 to t.length
    } yield ((id, p.toLong), t.substring(p - 1))
    val rankOf = sfx.map(_._2).distinct.sorted.zipWithIndex
      .map { case (s, i) => s -> (i + 1L) }.toMap
    sfx.map { case (k, s) => k -> rankOf(s) }.toMap
  }

  private def build(docs: Seq[(Long, String)]) =
    SuffixArray.build(docs.toDF("id", "text"))
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("matches the serial reference on shared substrings and " +
    "duplicate documents") {
    val docs = Seq(
      (1L, "banana"), (2L, "bandana"), (3L, "banana"), // 3 == 1 exactly
      (4L, "an"), (5L, "a"), (6L, "nabanana"))
    val got = build(docs)
    got shouldBe serial(docs)
    // duplicate docs: every suffix of doc 1 shares its rank with doc 3
    (1 to 6).foreach { p =>
      got((1L, p.toLong)) shouldBe got((3L, p.toLong))
    }
    // proper prefix sorts first: "a" (5,1) < "an" (4,1) < "anana" (1,2)
    got((5L, 1L)) should be < got((4L, 1L))
    got((4L, 1L)) should be < got((1L, 2L))
  }

  test("single repeated character exercises deep doubling rounds") {
    // suffixes of "aaaa...a" are strictly ordered by length (shorter
    // first); ranks must be the exact length order
    val docs = Seq((1L, "a" * 70), (2L, "a" * 35))
    val got = build(docs)
    got shouldBe serial(docs)
    // suffix at pos p of doc1 has length 71-p: longer = later rank
    got((1L, 70L)) should be < got((1L, 1L))
    // doc2's suffix of length 35 == doc1's suffix of length 35
    got((2L, 1L)) shouldBe got((1L, 36L))
  }

  test("bit-identical under repartitioning and at different widths") {
    val rnd = new scala.util.Random(5)
    val docs = (1L to 40L).map(i =>
      (i, (0 until 30 + rnd.nextInt(40))
        .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString))
    val df = docs.toDF("id", "text")
    val a = SuffixArray.build(df).orderBy("id", "pos").collect()
    val b = SuffixArray.build(df.repartition(13)).orderBy("id", "pos").collect()
    a should contain theSameElementsInOrderAs b
  }

  test("empty and 1-char documents") {
    val docs = Seq((1L, ""), (2L, "x"), (3L, "x"))
    val got = build(docs)
    got.keySet shouldBe Set((2L, 1L), (3L, 1L))
    got((2L, 1L)) shouldBe got((3L, 1L))
  }
}
