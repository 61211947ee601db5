package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** WordPiece: the pointer-doubling walk must equal a serial greedy
  * longest-match reference run over the same inventory, including the
  * truncation window and the frequency threshold.
  */
class WordPieceSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Serial reference: greedy longest-match over an explicit vocab. */
  private def serial(w: String, vocab: Set[String]): Seq[String] = {
    var p = 0
    val out = Seq.newBuilder[String]
    while (p < w.length) {
      val l = (4 to 1 by -1).find(l =>
        p + l <= w.length && vocab(w.substring(p, p + l))).get
      out += w.substring(p, p + l)
      p += l
    }
    out.result()
  }

  /** Rebuild the op's inventory rule in plain Scala. */
  private def inventory(words: Map[String, Long]): Set[String] = {
    val grams = for {
      (w, c) <- words.toSeq; l <- 2 to 4; p <- 0 to w.length - l
    } yield (w.substring(p, p + l), c)
    val v24 = grams.groupBy(_._1).filter(_._2.map(_._2).sum >= 50).keySet
    val v1 = words.keys.flatMap(_.toSeq.map(_.toString)).toSet
    v24 ++ v1
  }

  test("doubling walk equals the serial greedy reference") {
    // 'interesting' appears 60x -> its 2..4-grams clear the threshold;
    // 'rare' appears once -> only single chars cover it
    val corpus = (Seq.fill(60)("interesting") ++ Seq.fill(60)("interested") ++
      Seq("rare", "ingest")).mkString(" ")
    val docs = Seq((0L, corpus)).toDF("doc_id", "text")
    val got = WordPiece.run(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getString(3))).toMap

    val counts = corpus.split(" ").groupBy(identity)
      .map { case (w, xs) => w -> xs.length.toLong }
    val vocab = inventory(counts)
    for ((w, _) <- counts) {
      val ref = serial(w, vocab)
      withClue(s"word=$w vocabHit=${vocab.contains(w.take(4))} ") {
        got(w)._1 shouldBe ref.length.toLong
        got(w)._2 shouldBe ref.mkString("|")
      }
    }
  }

  test("truncation window caps the walk") {
    val long = "a" * 40 // truncated to MaxLen chars
    val docs = Seq((0L, Seq.fill(60)(long).mkString(" ")))
      .toDF("doc_id", "text")
    val row = WordPiece.run(docs).collect().head
    row.getString(0).length shouldBe WordPiece.MaxLen
    // 'aaaa' clears the threshold -> 24 chars = 6 pieces of 'aaaa'
    row.getLong(2) shouldBe (WordPiece.MaxLen / 4).toLong
  }
}
