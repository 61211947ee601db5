package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Semantic contracts of the curation operators that the SQL oracle gate
  * can't express: redaction completeness, decontamination edge cases
  * (short docs, clean docs), mixture determinism under repartitioning,
  * and semantic-dedup group collapse on known duplicates.
  */
class CurationSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("piiScrub redacts every email/phone/ip and counts them") {
    val df = Seq(
      (1L, "mail me at jo.doe+x@corp.example.org or call +44 123-4567 now"),
      (2L, "server 10.12.0.255 and 192.168.1.1 hold the logs"),
      (3L, "nothing sensitive here at all")
    ).toDF("doc_id", "text")
    val out = Curation.piiScrub(df)
      .select("doc_id", "n_emails", "n_phones", "n_ipv4", "redacted")
      .collect().map(r => r.getLong(0) -> r).toMap
    out(1L).getLong(1) shouldBe 1L
    out(1L).getLong(2) shouldBe 1L
    out(1L).getString(4) shouldBe "mail me at <EMAIL> or call <PHONE> now"
    out(2L).getLong(3) shouldBe 2L
    out(2L).getString(4) shouldBe "server <IP> and <IP> hold the logs"
    out(3L).getString(4) shouldBe "nothing sensitive here at all"
  }

  test("decontaminate flags shingle overlap, leaves clean/short docs at 0") {
    val eval = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val train = Seq(
      // contains 5 distinct eval shingles ("quick brown fox", ...)
      (1L, "note quick brown fox jumps over the lazy dog end"),
      (2L, "completely unrelated words with zero shared trigram content"),
      (3L, "too short") // < 3 tokens: no shingles at all
    ).toDF("doc_id", "text")
    val out = Curation.decontaminate(train, eval, minHits = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toList.sortBy(_._1)
    out(0)._2 should be >= 5L
    out(0)._3 shouldBe true
    out(1) shouldBe ((2L, 0L, false))
    out(2) shouldBe ((3L, 0L, false))
  }

  test("mixToUniform keep set is deterministic under repartitioning and near-target") {
    val docs = (0L until 600L).map { i =>
      (i, if (i % 6 == 0) "rare" else "common") // 100 rare vs 500 common
    }.toDF("doc_id", "source")
    def keptSet(parts: Int) =
      Curation.mixToUniform(docs.repartition(parts)).filter(col("kept"))
        .select("doc_id").as[Long].collect().toSet
    val k4 = keptSet(4)
    keptSet(1) shouldBe k4 // partitioning-independent
    val bySrc = Curation.mixToUniform(docs).filter(col("kept"))
      .groupBy("source").count().as[(String, Long)].collect().toMap
    bySrc("rare") shouldBe 100L +- 10L // rate 1.0 modulo hash granularity
    bySrc("common") shouldBe 100L +- 40L // downsampled ~5x toward uniform
  }

  test("sqrt-temperature mixing keeps sqrt-proportional counts, deterministically") {
    val docs = (0L until 600L).map { i =>
      (i, if (i % 6 == 0) "rare" else "common") // 100 rare vs 500 common
    }.toDF("doc_id", "source")
    def keptSet(parts: Int) =
      Curation.mixWithSqrtTemperature(docs.repartition(parts))
        .filter(col("kept")).select("doc_id").as[Long].collect().toSet
    keptSet(1) shouldBe keptSet(7) // partitioning-independent
    val bySrc = Curation.mixWithSqrtTemperature(docs).filter(col("kept"))
      .groupBy("source").count().as[(String, Long)].collect().toMap
    bySrc("rare") shouldBe 100L +- 10L // smallest domain keeps ~everything
    // expected sqrt(min * n_d) = sqrt(100 * 500) ~ 224: between uniform
    // (100) and natural (500)
    bySrc("common") shouldBe 224L +- 45L
  }

  test("capDomainTokens keeps under-budget domains whole, caps big ones in expectation") {
    // "small": 50 docs x 10 tokens = 500 <= budget; "big": 500 x 10 = 5000
    val docs = (0L until 550L).map { i =>
      (i, if (i < 50) "small" else "big", 10L)
    }.toDF("doc_id", "source", "n_tokens")
    def keptSet(parts: Int) =
      Curation.capDomainTokens(docs.repartition(parts), budget = 1000L)
        .filter(col("kept")).select("doc_id").as[Long].collect().toSet
    val k = keptSet(3)
    keptSet(1) shouldBe k // partitioning-independent
    k.count(_ < 50L) shouldBe 50 // under budget: everything survives
    // over budget: keep prob = 1000/5000, expected 100 kept docs
    (k.count(_ >= 50L) * 10L) shouldBe 1000L +- 350L
    val out = Curation.capDomainTokens(docs, budget = 1000L)
    out.filter(col("source") === "big" && col("t_domain") =!= 5000L)
      .count() shouldBe 0L
  }

  test("bestInCluster picks max score with min-id tie-break, one row per cluster") {
    val memb = Seq(
      (1L, 1L, 5L), (2L, 1L, 9L), (3L, 1L, 9L), // tie on 9 -> id 2 wins
      (7L, 7L, 1L) // singleton cluster
    ).toDF("doc_id", "cluster_id", "score")
    val out = Curation.bestInCluster(memb)
      .select("cluster_id", "rep_id", "rep_score", "n_members")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (c, r, s, n) => c -> ((r, s, n)) }.toMap
    out.size shouldBe 2
    out(1L) shouldBe ((2L, 9L, 3L))
    out(7L) shouldBe ((7L, 1L, 1L))
  }

  test("semDedup collapses exact duplicates to the min id, keeps singletons") {
    // two exact-duplicate groups (identical vectors => identical cell
    // assignment, so the collapse is guaranteed) + isolated singletons
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat, 0f, 0f)
    val emb = Seq(
      (0L, v(1, 0)), (1L, v(1, 0)), // group A
      (2L, v(0, 1)), (3L, v(0, 1)), (4L, v(0, 1)), // group B
      (5L, v(-1, 0.3)), (6L, v(0.5, -1)) // singletons
    ).toDF("vec_id", "embedding")
    val out = Curation.semDedup(emb, k = 4, tau = 0.99)
      .select("vec_id", "keep_id", "is_dup")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    out(0L) shouldBe ((0L, false))
    out(1L) shouldBe ((0L, true))
    out(2L) shouldBe ((2L, false))
    out(3L) shouldBe ((2L, true))
    out(4L) shouldBe ((2L, true))
    out(5L) shouldBe ((5L, false))
    out(6L) shouldBe ((6L, false))
    // dups point strictly down; kept rows point at themselves
    out.foreach { case (id, (keep, dup)) =>
      if (dup) keep should be < id else keep shouldBe id
    }
  }
}
