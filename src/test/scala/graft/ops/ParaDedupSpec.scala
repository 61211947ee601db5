package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

class ParaDedupSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def run(rows: Seq[(Long, String)], parts: Int = 1) = {
    import spark.implicits._
    ParaDedup
      .dedupParagraphs(
        rows.toDF("id", "body").repartition(parts), "id", "body")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
  }

  test("keeps only the globally first occurrence of each paragraph") {
    val out = run(Seq(
      1L -> "A\n\nB\n\nA", // A repeats inside one doc
      2L -> "B\n\nC", // B already seen in doc 1
      3L -> "A\n\nB" // fully boilerplate -> empty
    ))
    out(1L) shouldBe ((3L, 2L, "A\n\nB"))
    out(2L) shouldBe ((2L, 1L, "C"))
    out(3L) shouldBe ((2L, 0L, ""))
  }

  test("untouched documents pass through whole, single-paragraph included") {
    val out = run(Seq(1L -> "only one", 2L -> "two\n\nparas"))
    out(1L) shouldBe ((1L, 1L, "only one"))
    out(2L) shouldBe ((2L, 2L, "two\n\nparas"))
  }

  test("first occurrence is ordered by (doc_id, position), not arrival") {
    // doc 5 holds X later than doc 2 does positionally, but doc 2 < 5
    // globally; within doc 2, position breaks the tie
    val out = run(Seq(
      5L -> "X\n\nY",
      2L -> "Z\n\nX\n\nX"))
    out(2L) shouldBe ((3L, 2L, "Z\n\nX"))
    out(5L) shouldBe ((2L, 1L, "Y")) // X dropped: first at (2, 1)
  }

  test("partition-invariant (exact set algebra, no order dependence)") {
    val rows = (0L until 40L).map(i =>
      i -> s"header ${i % 3}\n\nbody $i\n\ncommon footer")
    run(rows, parts = 1) shouldBe run(rows, parts = 13)
    // exactly one header per residue class + one footer survive
    val out = run(rows, parts = 13)
    out.values.count(_._3.contains("common footer")) shouldBe 1
    out.values.count(_._3.contains("header 1")) shouldBe 1
    out(0L)._2 shouldBe 3L // first doc keeps everything
  }

  test("custom separator is treated literally") {
    import spark.implicits._
    val out = ParaDedup
      .dedupParagraphs(
        Seq(1L -> "a|+|b", 2L -> "b|+|c").toDF("id", "t"),
        "id", "t", sep = "|+|")
      .collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    out(1L) shouldBe "a|+|b"
    out(2L) shouldBe "c"
  }
}
