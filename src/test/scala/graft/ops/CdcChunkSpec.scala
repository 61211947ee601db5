package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Content-defined chunking: boundaries against a direct (rebase-free)
  * serial rolling-hash reference, tiling invariants, and the property
  * that gives CDC its name — a prefix insertion re-aligns boundaries
  * within one window, so shared content yields identical chunk
  * fingerprints at different offsets.
  */
class CdcChunkSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val w = 16
  private val mask = 64L

  /** Deterministic printable pseudo-text. */
  private def text(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
  }

  /** Serial reference: content hash computed DIRECTLY from the window
    * characters (no prefix-sum/inverse rebase) — validates the modular
    * algebra of the distributed path.
    */
  private def serialBoundaries(s: String): Seq[Int] = {
    val M = CdcChunk.M
    val p = CdcChunk.P
    (w to s.length).filter { i => // 1-based end position
      var h = 0L
      var pw = 1L // p^0 for the window's FIRST char (the rebase target)
      for (t <- 0 until w) {
        h = (h + (s.charAt(i - w + t).toLong % 256) * pw) % M
        pw = pw * p % M
      }
      h % mask == 0
    }
  }

  private def chunksOf(docs: Seq[(Long, String)]) =
    CdcChunk.chunks(docs.toDF("doc_id", "text"), w, mask)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect()

  test("boundaries match the direct serial rolling hash") {
    val s = text(1, 800)
    val rows = chunksOf(Seq((1L, s))).sortBy(_._3)
    val cuts = serialBoundaries(s)
    cuts.nonEmpty shouldBe true // the test must actually exercise cuts
    // chunk starts = 1 :: (each non-terminal cut + 1)
    rows.map(_._3) shouldBe
      (1L +: cuts.filter(_ < s.length).map(_.toLong + 1))
  }

  test("chunks tile the document exactly") {
    val s = text(2, 1200)
    val rows = chunksOf(Seq((7L, s))).sortBy(_._3)
    rows.map(_._4).sum shouldBe s.length.toLong
    // contiguous: each start = previous start + previous length
    rows.sliding(2).foreach {
      case Array(a, b) => b._3 shouldBe a._3 + a._4
      case _ =>
    }
    rows.head._3 shouldBe 1L
    // chunk ids dense from 0
    rows.map(_._2) shouldBe rows.indices.map(_.toLong)
  }

  test("content-defined: a prefix insertion preserves interior chunk fingerprints") {
    val shared = text(3, 1000)
    val a = shared
    val b = "INSERTED-PREFIX-0123456789!" + shared
    val rows = chunksOf(Seq((1L, a), (2L, b)))
    def fps(doc: Long) =
      rows.filter(_._1 == doc).sortBy(_._3)
        .map(r => (r._4, r._5, r._6, r._7)) // (len, s0, fp1, fp2)
    val fa = fps(1L)
    val fb = fps(2L)
    fa.length should be > 3
    // every A-chunk except the first (prefix-shifted) and last
    // (tail alignment) appears verbatim in B
    val bSet = fb.toSet
    fa.drop(1).dropRight(1).foreach { c => bSet should contain(c) }
    // and those shared chunks are counted by n_same
    val sharedSet = fa.drop(1).dropRight(1).toSet
    rows.filter(r => sharedSet((r._4, r._5, r._6, r._7)))
      .foreach(r => r._8 should be >= 2L)
  }

  test("short documents (< window) come back as one cut-free chunk") {
    val rows = chunksOf(Seq((9L, "tiny doc")))
    rows.length shouldBe 1
    rows.head._4 shouldBe 8L
    rows.head._2 shouldBe 0L
  }

  test("row-local chunker equals the batch window chain row-for-row") {
    // synthetic mix (cuts, short docs, repeated content) PLUS the real
    // documents table — the streaming gate depends on this equality
    import org.apache.spark.sql.functions.{col, explode}
    val synth = Seq(
      (1L, text(11, 900)), (2L, text(12, 40)), (3L, "x"),
      (4L, text(11, 900)), (5L, text(13, 2000)))
      .toDF("doc_id", "text")
    val real = graft.model.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    for (docs <- Seq(synth, real)) {
      val batch = CdcChunk.fingerprints(docs, w, mask)
        .as[(Long, Long, Long, Long, Long, Long, Long)]
        .collect().sorted.toSeq
      val rowLocal = CdcChunk.withChunkStructs(docs, "text", "__chunks", w, mask)
        .select(col("doc_id"), explode(col("__chunks")).as("c"))
        .select(col("doc_id"), col("c.chunk_id"), col("c.start_pos"),
          col("c.chunk_len"), col("c.s0"), col("c.fp1"), col("c.fp2"))
        .as[(Long, Long, Long, Long, Long, Long, Long)]
        .collect().sorted.toSeq
      rowLocal shouldBe batch
    }
  }

  test("row-local chunker yields an empty array for empty text") {
    import org.apache.spark.sql.functions.{col, size => asize}
    val out = CdcChunk
      .withChunkStructs(Seq((1L, "")).toDF("doc_id", "text"), "text")
      .select(asize(col("__chunks"))).as[Int].head()
    out shouldBe 0
  }
}
