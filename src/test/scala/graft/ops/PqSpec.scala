package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.functions.VecOps

/** Quality + determinism contract of the product-quantization ANN path:
  * recall@5 of the ADC-shortlist + exact-re-rank search against the
  * brute-force truth (on the near-random driver embeddings — PQ's
  * hardest case), code compactness (the whole point of PQ), and
  * bit-level determinism of codebooks and codes under repartitioning.
  * Value correctness is gated end-to-end by the q_knn_pq / q_pq_codes
  * oracles.
  */
class PqSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  private def driverEmb(sf: String): DataFrame =
    graft.model.Tables.embeddings(spark, s"/root/testdata/$sf")
      .select(col("vec_id"), col("embedding"))

  private def normalized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), Pq.normalized(col("embedding")).as("embedding"))

  /** Exact cosine top-5 per query (vec_id < 10) via broadcast brute force. */
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

  test("near-random driver embeddings: recall@5 >= 0.9 after exact re-rank") {
    val raw = driverEmb("sf0.01")
    val emb = normalized(raw)
    val truth = bruteTop5(raw)
    val cb = Pq.codebooks(emb, Pq.M, Pq.chooseKsub(raw.count()))
    val got = Pq.search(emb, raw, cb, Pq.M, col("vec_id") < 10, topK = 5)
      .select("q_id", "c_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val qs = truth.keys.toSeq
    val recall = qs.map(q => (truth(q) & got.getOrElse(q, Set.empty)).size / 5.0)
      .sum / qs.size
    recall should be >= 0.9
  }

  test("codes are m small ints per vector (the compression contract)") {
    val emb = normalized(driverEmb("sf0.001"))
    val n = emb.count()
    val k = Pq.chooseKsub(n)
    val cb = Pq.codebooks(emb, Pq.M, k)
    val codes = Pq.encode(emb, cb, Pq.M)
    codes.count() shouldBe n * Pq.M
    // every code addresses a real codeword: 0 <= code < k
    codes.agg(min("code"), max("code")).collect().head match {
      case r => r.getLong(0) should be >= 0L; r.getLong(1) should be < k.toLong
    }
    // k <= 256 at any corpus size -> a code always fits one byte
    Pq.chooseKsub(10000000000L) shouldBe 256
  }

  test("codebooks and codes are bit-identical under repartitioning") {
    val emb = normalized(driverEmb("sf0.001"))
    def cbDump(df: DataFrame) =
      Pq.codebooks(df, Pq.M, 8).orderBy("sub_id", "cent_id").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toVector))
    def codeDump(df: DataFrame) = {
      val cb = Pq.codebooks(df, Pq.M, 8)
      Pq.encode(df, cb, Pq.M).orderBy("vec_id", "sub_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    }
    cbDump(emb) shouldBe cbDump(emb.repartition(7))
    codeDump(emb) shouldBe codeDump(emb.repartition(5))
  }
}
