package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** PPMI spectral embedding against an in-memory dense replica of the
  * exact integer pipeline (same counts, same PPMI floors, same power
  * rounds, same rescale) plus structural properties: nonnegative
  * components, vocab cap, block structure separating disjoint topics.
  */
class PpmiEmbedSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Dense serial replica of the exact pipeline in [[PpmiEmbed.run]]. */
  private def reference(
      texts: Seq[String], topV: Int, iters: Int): Map[String, (Long, Long)] = {
    val docs = texts.map(_.split(" ").toSeq)
    val wc = docs.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val vocab = wc.toSeq.sortBy { case (w, c) => (-c, w) }.take(topV)
      .map(_._1).toSet
    val pairs = collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    for (d <- docs; i <- d.indices; o <- Seq(1, 2); if i + o < d.size) {
      val (a, b) = (d(i), d(i + o))
      if (vocab(a) && vocab(b)) {
        pairs((a, b)) += 1; pairs((b, a)) += 1
      }
    }
    val ca = pairs.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val t = pairs.values.sum
    val m = pairs.flatMap { case ((a, b), c) =>
      val p = math.floor(
        math.log((1e0 * c * t) / (1e0 * ca(a) * ca(b))) * 1e6).toLong
      if (p > 0) Some((a, b) -> p) else None
    }.toMap
    var v: Map[String, Long] = ca.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      // the join-shape contract: a word keeps a (possibly zero) u row
      // iff at least one of its M-neighbors still has a v row
      val u = m.toSeq.filter { case ((_, b), _) => v.contains(b) }
        .groupBy(_._1._1).view
        .mapValues(_.map { case ((_, b), p) => p * v(b) }.sum).toMap
      val mx = u.values.max
      v = u.view.mapValues(x => x / (mx / 1000000L + 1L)).toMap
    }
    v.map { case (w, s) => w -> ((ca(w), s)) }
  }

  // two disjoint topics — the cat/dog block is much denser so its
  // spectral radius dominates and power iteration separates the blocks
  // — plus rare noise words that fall outside the vocab cap
  private val corpus = Seq(
    "cat dog cat dog mouse cat dog cat dog cat",
    "dog cat mouse dog cat cat dog cat cat dog",
    "cat dog mouse cat dog mouse cat dog cat dog",
    "dog cat cat dog mouse cat dog cat dog cat",
    "cat dog cat dog cat dog mouse cat dog cat",
    "sun moon star",
    "moon sun star",
    "zzz-rare-a zzz-rare-b")

  test("matches the dense serial replica exactly") {
    val got = PpmiEmbed.run(
      corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), topV = 6, iters = 6)
      .as[(String, Long, Long)].collect()
      .map { case (w, n, s) => w -> ((n, s)) }.toMap
    got shouldBe reference(corpus, topV = 6, iters = 6)
  }

  test("components are nonnegative and the dominant topic carries the max") {
    val got = PpmiEmbed.run(
      corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), topV = 6, iters = 6)
      .as[(String, Long, Long)].collect()
    got.foreach { case (_, _, s) => s should be >= 0L }
    // vocab cap: rare words never appear
    got.map(_._1) should contain noneOf ("zzz-rare-a", "zzz-rare-b")
    // the component mass concentrates inside ONE topic block: the argmax
    // word's topic peers outweigh the other block's members
    val byWord = got.map(r => r._1 -> r._3).toMap
    val topicA = Set("cat", "dog", "mouse")
    val top = got.maxBy(_._3)._1
    val (same, other) =
      if (topicA(top)) (topicA, Set("sun", "moon", "star"))
      else (Set("sun", "moon", "star"), topicA)
    same.toSeq.map(byWord.getOrElse(_, 0L)).min should be >
      other.toSeq.map(byWord.getOrElse(_, 0L)).max
  }
}
