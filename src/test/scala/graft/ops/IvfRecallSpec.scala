package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.functions.VecOps

/** Quality + determinism contract of the IVF index (VERDICT.md round-1
  * item 5): recall@5 against the exact brute-force neighbours, on a
  * corpus where IVF genuinely earns its keep (clustered) and on the
  * driver's near-random embeddings (where recall is bounded by scanned
  * fraction, so the probe width must widen), plus bit-level determinism
  * of the codebook under repartitioning.
  */
class IvfRecallSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  /** Exact cosine top-k per query (vec_id < 10) via broadcast brute force. */
  private def bruteTop5(emb: DataFrame): Map[Long, Set[Long]] = {
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("c_id"))
    emb.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      .crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine", VecOps.cosine(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("q_id", "c_id").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
  }

  private def recallAt5(emb: DataFrame, k: Int, nprobe: Int): Double = {
    val truth = bruteTop5(emb)
    val cb = IvfIndex.codebook(emb, k)
    val got = IvfIndex.search(emb, cb, col("vec_id") < 10, nprobe, topK = 5)
      .select("q_id", "c_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val qs = truth.keys.toSeq
    qs.map(q => (truth(q) & got.getOrElse(q, Set.empty)).size / 5.0).sum / qs.size
  }

  /** 8 well-separated clusters in 16 dims, deterministic noise. */
  private def clusteredCorpus(): DataFrame = {
    import spark.implicits._
    val rows = (0 until 400).map { i =>
      val c = i % 8
      val v = Array.tabulate(16) { j =>
        val base = if (j == 2 * c || j == 2 * c + 1) 1.0f else 0.0f
        base + (((i * 31 + j * 17) % 101) - 50) / 1000.0f
      }
      (i.toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("clustered corpus: probing 2 of 8 cells reaches >= 0.9 recall@5") {
    // the IVF value proposition: scan ~2/8 of the corpus, keep the
    // neighbours — k-means finds the clusters, neighbours share cells
    recallAt5(clusteredCorpus(), k = 8, nprobe = 2) should be >= 0.9
  }

  test("near-random driver embeddings: recall@5 >= 0.9 with a widened probe") {
    // sf0.01 embeddings have no cluster structure (mean pairwise cosine
    // ~0), so recall is ~proportional to the scanned fraction — the
    // honest configuration trades a wider nprobe for the target recall
    val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select("vec_id", "embedding")
    recallAt5(emb, k = 8, nprobe = 6) should be >= 0.9
  }

  test("codebook is bit-identical under repartitioning (fixed-point means)") {
    val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    def dump(df: DataFrame) = IvfIndex.codebook(df, k = 8)
      .orderBy("cent_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toVector))
    dump(emb) shouldBe dump(emb.repartition(7))
  }
}
