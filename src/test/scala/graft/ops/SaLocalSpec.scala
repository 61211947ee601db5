package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** The r10 suffix-array local tail (SaLocal) must be INVISIBLE:
  * forcing the distributed doubling (spark.graft.sa.localChars=0) and
  * the local path (default bound) on the same corpora yields identical
  * (id, pos, sfx_rank) ranks and identical RepeatedSpans pair rows —
  * including duplicated documents (equal suffixes must share a dense
  * rank) and shared tails (prefix-sorts-first).
  */
class SaLocalSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withLimit[T](v: String)(body: => T): T = {
    val key = "spark.graft.sa.localChars"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, v)
    try body
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  private def corpus(seed: Int, n: Int) = {
    val r = new scala.util.Random(seed)
    val words = Array("alpha", "beta", "gamma", "delta", "epsi")
    val base = (0 until n).map { i =>
      val len = 3 + r.nextInt(10)
      (i.toLong, (0 until len).map(_ => words(r.nextInt(words.length)))
        .mkString(" "))
    }
    // duplicates + shared tails + an empty-ish doc
    (base :+ (n.toLong, base.head._2) :+ (n + 1L, base.head._2.drop(7))
      :+ (n + 2L, "x"))
      .toDF("id", "text")
  }

  test("local suffix ranks == distributed doubling ranks") {
    val docs = corpus(7, 30)
    val local = SuffixArray.build(docs)
      .as[(Long, Long, Long)].collect().toSet
    val dist = withLimit("0") {
      SuffixArray.build(docs).as[(Long, Long, Long)].collect().toSet
    }
    local shouldBe dist
  }

  test("local neighbor-scan spans == distributed RepeatedSpans") {
    val docs = corpus(11, 40)
    val local = RepeatedSpans.find(docs, minLen = 8, cap = 24)
      .as[(Long, Long, Long, Long, Long, String)].collect().toSet
    val dist = withLimit("0") {
      RepeatedSpans.find(docs, minLen = 8, cap = 24)
        .as[(Long, Long, Long, Long, Long, String)].collect().toSet
    }
    local shouldBe dist
    local should not be empty // duplicated docs guarantee repeats
  }

  test("SaDedup.clean identical through the local tail") {
    val docs = corpus(13, 25)
    val local = SaDedup.clean(docs, minLen = 8, cap = 24)
      .as[(Long, Long, Long, String)].collect().toSet
    val dist = withLimit("0") {
      SaDedup.clean(docs, minLen = 8, cap = 24)
        .as[(Long, Long, Long, String)].collect().toSet
    }
    local shouldBe dist
  }
}
