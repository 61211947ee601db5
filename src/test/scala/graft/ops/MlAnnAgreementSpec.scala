package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.functions.VecOps

/** Quality contract of kNN classification over the IVF-PQ index
  * ([[Classify.knnVote]] fed by [[IvfPq.search]] — the 100 TB
  * label-propagation shape): on a corpus where the index earns its keep
  * (clustered, labels = cluster identity) the compressed-index vote must
  * agree with the brute-force-kNN vote on nearly every query. Value
  * correctness of the production chain is gated by q_knn_classify_ann's
  * DuckDB replay.
  */
class MlAnnAgreementSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  /** 8 well-separated clusters in 64 dims, label = cluster id,
    * deterministic noise (same family as IvfPqSpec's corpus).
    */
  private def labelledCorpus(): DataFrame = {
    import spark.implicits._
    val rows = (0 until 400).map { i =>
      val c = i % 8
      val v = Array.tabulate(64) { j =>
        val base = if (j >= 8 * c && j < 8 * (c + 1)) 1.0f else 0.0f
        base + (((i * 31 + j * 17) % 101) - 50) / 1000.0f
      }
      (i.toLong, v, c)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  private def votes(nb: DataFrame, emb: DataFrame): Map[Long, Int] =
    Classify.knnVote(nb, emb.select(col("vec_id"), col("label")))
      .collect()
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Int]("pred_label"))
      .toMap

  test("IVF-PQ-voted labels agree with brute-kNN-voted labels on >= 90% of queries") {
    val emb = labelledCorpus()
    val raw = emb.select(col("vec_id"), col("embedding"))
    val norm = raw.select(col("vec_id"),
      Pq.normalized(col("embedding")).as("embedding"))
    val pred = col("vec_id") < 40

    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("c_id"))
    val q = raw.filter(pred)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val bruteNb = raw
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      .crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine", VecOps.cosine(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("c_id"))

    val idx = IvfPq.build(raw, norm)
    val annNb = IvfPq.search(idx, raw, Pq.M, pred,
      nprobe = 2, topK = 5, shortlist = 32)
      .select(col("q_id"), col("c_id"))

    val brute = votes(bruteNb, emb)
    val ann = votes(annNb, emb)
    ann.keySet shouldBe brute.keySet
    val agree = brute.keys.count(k => brute(k) == ann(k)).toDouble / brute.size
    agree should be >= 0.9

    // and on this separable corpus the vote recovers the true label
    val truth = emb.filter(pred).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val acc = truth.keys.count(k => ann(k) == truth(k)).toDouble / truth.size
    acc should be >= 0.9
  }
}
