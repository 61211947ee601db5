package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Repeated-span removal semantics on hand-computable corpora, plus a
  * reference-implementation property check on random word-soup (the same
  * keep-first n-gram marking computed serially in Scala).
  */
class SpanDedupSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val N = 4 // span granularity for the tests (shorter docs)

  private def spans(docs: Seq[(Long, String)]): Set[(Long, Int, Int)] =
    SpanDedup
      .removalSpans(docs.toDF("doc_id", "text"), "doc_id", "text", N)
      .select("doc_id", "span_start", "span_end")
      .as[(Long, Int, Int)].collect().toSet

  test("no duplicated n-grams -> no spans; whole-doc dup marked except first") {
    val unique = Seq(
      0L -> "a b c d e f g h",
      1L -> "p q r s t u v w")
    spans(unique) shouldBe empty

    // doc 1 repeats doc 0 verbatim: every 4-gram duplicated, keep-first
    // leaves doc 0 intact and marks all of doc 1 as one merged span
    val dup = Seq(0L -> "a b c d e f", 1L -> "a b c d e f")
    spans(dup) shouldBe Set((1L, 0, 5))
  }

  test("within-doc repetition marks the second occurrence only") {
    // "w x y z" occurs at positions 0 and 4 of the same doc
    val docs = Seq(0L -> "w x y z w x y z")
    spans(docs) shouldBe Set((0L, 4, 7))
  }

  test("adjacent and overlapping marks merge into one island") {
    // doc 1 contains two COPIES of doc-0 spans back to back: the marked
    // 4-gram occurrences overlap and chain into a single merged span
    val docs = Seq(
      0L -> "a b c d x1 x2 x3 x4",
      1L -> "p p2 a b c d a b c d q")
    val got = spans(docs)
    got.map(_._1) shouldBe Set(1L)
    // positions 2..9 of doc 1 are the two copies; one merged island
    got shouldBe Set((1L, 2, 9))
  }

  test("removeSpans reconstructs untouched docs and empties full dups") {
    val docs = Seq(
      0L -> "a b c d e f",
      1L -> "a b c d e f",
      2L -> "k l m") // shorter than N: passes through
    val got = SpanDedup
      .removeSpans(docs.toDF("doc_id", "text"), "doc_id", "text", N)
      .select("doc_id", "n_toks", "n_kept", "clean_text")
      .as[(Long, Int, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    got(0L) shouldBe ((0L, 6, 6L, "a b c d e f"))
    got(1L) shouldBe ((1L, 6, 0L, ""))
    got(2L) shouldBe ((2L, 3, 3L, "k l m"))
  }

  test("property: spans match a serial reference on random word-soup") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs: Seq[(Long, String)] = (0L until 40L).map { id =>
      val n = 6 + rnd.nextInt(20)
      id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }

    // serial reference: mark all non-first occurrences, merge intervals
    val occ = docs.flatMap { case (id, text) =>
      val t = text.split(" ")
      (0 to t.length - N).map(s => (t.slice(s, s + N).mkString(" "), id, s))
    }
    val marked = occ
      .groupBy(_._1).values.filter(_.size >= 2)
      .flatMap(g => g.sortBy(o => (o._2, o._3)).tail)
      .map(o => (o._2, o._3, o._3 + N - 1)).toSeq
    val expected = marked
      .groupBy(_._1).flatMap { case (id, ss) =>
        val sorted = ss.sortBy(_._2)
        val islands = sorted.tail.foldLeft(List(sorted.head)) {
          case (acc @ h :: t, s) =>
            if (s._2 <= h._3 + 1) (h._1, h._2, math.max(h._3, s._3)) :: t
            else s :: acc
          case (Nil, s) => List(s)
        }
        islands.map(i => (id, i._2, i._3))
      }.toSet

    spans(docs) shouldBe expected
  }
}
