package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Unigram-LM phrase segmentation (ops.PhraseSegment): DP optimality
  * against a brute-force reference on a tiny corpus, the n_pieces /
  * cost bounds, and determinism across repartitionings.
  */
class PhraseSegmentSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def corpus() = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the quick brown dog"),
      (2L, "the quick brown fox sleeps"),
      (3L, "one of a kind sentence entirely"),
      (4L, "the quick brown fox jumps again and again")
    ).toDF("doc_id", "text")
  }

  /** Brute-force reference: enumerate all segmentations into 1..3-token
    * pieces, score with the same inventory/cost rule, take the packed
    * minimum.
    */
  private def reference(): Map[Long, (Long, Long, Long)] = {
    val docs = Seq(
      1L -> "the quick brown fox jumps over the quick brown dog",
      2L -> "the quick brown fox sleeps",
      3L -> "one of a kind sentence entirely",
      4L -> "the quick brown fox jumps again and again")
    val toksByDoc = docs.map { case (id, t) => id -> t.split(" ").toSeq }
    val grams = scala.collection.mutable.Map.empty[String, Long]
    for ((_, toks) <- toksByDoc; n <- 1 to 3; i <- 0 to toks.length - n) {
      val g = toks.slice(i, i + n).mkString(" ")
      grams(s"$n|$g") = grams.getOrElse(s"$n|$g", 0L) + 1
    }
    val inv = grams.toSeq.collect {
      case (k, c) if k.startsWith("1|") || c >= 2 => (k.drop(2), c)
    }
    // like the op: a string occurring both as unigram and inside a
    // longer gram keyspace can't collide (bigrams contain a space)
    val invMap = inv.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).sum }
    val t = inv.map(_._2).sum
    def cost(g: String): Option[Long] =
      invMap.get(g).map(c => math.floor(-math.log(c * 1.0 / t) * 1e6).toLong)
    toksByDoc.map { case (id, toks) =>
      val n = toks.length
      val v = Array.fill(n + 1)(PhraseSegment.Inf)
      v(0) = 0L
      for (i <- 1 to n; l <- 1 to math.min(3, i)) {
        val g = toks.slice(i - l, i).mkString(" ")
        cost(g).foreach { c =>
          val cand = v(i - l) + c * 1048576L + 1L
          if (cand < v(i)) v(i) = cand
        }
      }
      id -> (n.toLong, v(n) / 1048576L, v(n) % 1048576L)
    }.toMap
  }

  test("matches the brute-force DP on a known corpus") {
    val got = PhraseSegment.segment(corpus()).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    got shouldBe reference()
    // repeated phrases compress: doc 1 repeats "the quick brown", so it
    // must segment into fewer pieces than tokens
    got(1L)._3 should be < got(1L)._1
    // the all-unique doc can only take unigram pieces
    got(3L)._3 shouldBe got(3L)._1
  }

  test("deterministic across repartitionings") {
    val a = PhraseSegment.segment(corpus())
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val b = PhraseSegment.segment(corpus().repartition(5))
      .orderBy("doc_id").collect().map(_.toString).toSeq
    a shouldBe b
  }
}
