package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Distributed BPE vs a serial reference implementation: identical merge
  * sequences (count + tie-break) and identical tokenization.
  */
class BpeTrainerSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Serial reference: standard Sennrich-style BPE over word counts. */
  private def serialBpe(
      wordCounts: Map[String, Long],
      k: Int): Seq[(String, String, Long)] = {
    var words: Map[Vector[String], Long] =
      wordCounts.map { case (w, n) => w.map(_.toString).toVector -> n }
    val out = Seq.newBuilder[(String, String, Long)]
    var done = false
    for (_ <- 0 until k if !done) {
      val counts = collection.mutable.Map[(String, String), Long]()
      for ((syms, n) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
      if (counts.isEmpty) done = true
      else {
        val (l, r) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head._1
        out += ((l, r, counts((l, r))))
        words = words.groupBy { case (syms, _) => mergeWord(syms, l, r) }
          .map { case (m, g) => m -> g.values.sum }
      }
    }
    out.result()
  }

  private def mergeWord(
      syms: Vector[String], l: String, r: String): Vector[String] =
    syms.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == l && x == r)
        acc.init :+ (l + r)
      else acc :+ x
    }

  private def corpus: Seq[String] = {
    val rnd = new scala.util.Random(3)
    val vocab = Vector("spark", "sparse", "parse", "parquet", "shuffle",
      "shard", "share", "partition", "part", "pare")
    (0 until 120).map { _ =>
      Seq.fill(3 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
  }

  test("merge sequence equals the serial reference, at any parallelism") {
    val docs = corpus.toDF("text")
    val wordCounts = corpus
      .flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val expected = serialBpe(wordCounts, k = 12)

    for (parts <- Seq(1, 7)) {
      val words = BpeTrainer.wordTable(docs.repartition(parts), "text")
      val got = BpeTrainer.train(words, k = 12)
        .map(m => (m.left, m.right, m.count))
      got shouldBe expected
    }
  }

  test("tokenize applies merges per word, never across boundaries") {
    val docs = Seq((0L, "ab ab"), (1L, "abab")).toDF("id", "text")
    // merge (a,b) learned from any corpus
    val merges = Seq(BpeTrainer.Merge(0, "a", "b", 99L))
    val got = BpeTrainer.tokenize(docs, "id", "text", merges)
      .select("text", "tokens")
      .as[(String, Seq[String])].collect().toMap
    got("ab ab") shouldBe Seq("ab", "ab") // two words, merged separately
    got("abab") shouldBe Seq("ab", "ab")  // within one word, both pairs
  }

  test("tokenize round-trips: concatenated tokens rebuild each word") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val words = BpeTrainer.wordTable(docs, "text")
    val merges = BpeTrainer.train(words, k = 12)
    val rows = BpeTrainer.tokenize(docs, "id", "text", merges)
      .select("text", "tokens")
      .as[(String, Seq[String])].collect()
    rows.foreach { case (text, toks) =>
      toks.mkString("") shouldBe text.split(" ").mkString("")
    }
    // the learned merges actually compress
    val totalToks = rows.map(_._2.size).sum
    val totalChars = rows.map(_._1.count(_ != ' ')).sum
    totalToks should be < totalChars
  }
}
