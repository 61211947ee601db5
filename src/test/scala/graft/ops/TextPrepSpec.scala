package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Structural invariants of the shared token-window chunker — properties
  * that hold for ANY document, pinned over generated corpora:
  * every token is covered, consecutive chunks overlap by exactly
  * size-stride (until the tail), and stride-prefixes reconstruct the
  * original document.
  */
class TextPrepSpec extends AnyFunSuite with Matchers {
  private lazy val spark = graft.TestSpark.spark

  private val SizeT = 32
  private val Stride = 24

  private def chunksOf(texts: Seq[String]): Map[Long, Seq[(Long, String, Long)]] = {
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    TextPrep.chunkDocs(df, SizeT, Stride)
      .select("doc_id", "chunk_id", "chunk_text", "n_chunk_tokens")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1)
      .map { case (d, rs) =>
        d -> rs.sortBy(_._2).map(r => (r._2, r._3, r._4)).toSeq
      }
  }

  test("property: coverage, overlap, and reconstruction for random docs") {
    val gen = for {
      n <- Gen.choose(1, 120)
      toks <- Gen.listOfN(n, Gen.choose(0, 999).map(i => s"w$i"))
    } yield toks
    val docs = (0 until 30).map(i =>
      gen(Gen.Parameters.default, Seed(i.toLong)).get)
    val texts = docs.map(_.mkString(" "))
    val got = chunksOf(texts)

    for ((doc, i) <- docs.zipWithIndex) {
      val chunks = got(i.toLong)
      val n = doc.length
      val expected = if (n <= SizeT) 1 else (n - SizeT + Stride - 1) / Stride + 1
      withClue(s"doc $i ($n tokens) chunk count:") {
        chunks.length shouldBe expected
      }
      // chunk k holds exactly tokens [k*stride, min(k*stride+size, n))
      for ((cid, text, nTok) <- chunks) {
        val want = doc.slice(cid.toInt * Stride, cid.toInt * Stride + SizeT)
        withClue(s"doc $i chunk $cid content:") {
          text shouldBe want.mkString(" ")
          nTok shouldBe want.length
        }
      }
      // reconstruction: stride-prefix of every chunk but the last, then
      // the full last chunk, concatenates back to the document
      val rebuilt = chunks.init.map(_._2.split(" ").take(Stride)).flatten ++
        chunks.last._2.split(" ")
      withClue(s"doc $i reconstruction:") {
        rebuilt.toSeq shouldBe doc
      }
    }
  }
}
