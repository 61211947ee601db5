package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkEntry
import graft.TestSpark

/** Semantic invariants of the ranking/scoring queries (cross-engine
  * value equality is the DuckDB oracle's job; these pin the properties
  * that make the outputs MEANINGFUL).
  */
class RankLmSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q_bm25_topk: 10 queries, ranks 1..k contiguous, scores non-increasing in rank") {
    val rows = q("q_bm25_topk")
      .select("query_id", "doc_id", "score_fp", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    rows.map(_._1).distinct.sorted shouldBe (0L to 9L)
    rows.groupBy(_._1).foreach { case (qid, g) =>
      val byRank = g.sortBy(_._4)
      withClue(s"query $qid:") {
        byRank.map(_._4) shouldBe (1 to byRank.length)
        byRank.map(_._3).sliding(2).foreach {
          case Array(a, b) => a should be >= b
          case _ =>
        }
      }
    }
  }

  test("q_lm_score: every doc scored, nll positive, avg_nll == nll_fp/(n_bg*1e6)") {
    val rows = q("q_lm_score").collect()
    rows.length should be > 0
    rows.foreach { r =>
      val (nBg, nll, avg) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      nBg should be > 0L
      nll should be > 0L // -ln(p) > 0 for p < 1
      avg shouldBe nll / (nBg * 1e6) // bit-exact: same two IEEE ops
    }
  }

  test("q_dsir_sample: the selected docs skew toward the target (English) distribution") {
    import spark.implicits._
    val picked = q("q_dsir_sample").select("doc_id").as[Long].collect().toSet
    picked.size shouldBe 100
    val docs = graft.model.Tables.documents(spark, sfDir)
    val enAll = docs.filter(col("lang") === "en").count().toDouble / docs.count()
    val enPicked = docs.filter(col("doc_id").isin(picked.toSeq: _*))
      .filter(col("lang") === "en").count().toDouble / picked.size
    // importance resampling toward an English target must over-select
    // English docs vs the corpus base rate
    enPicked should be > enAll
  }

  test("q_pagerank: hub suppliers out-rank leaf customers on average") {
    val r = q("q_pagerank").collect().map(x => (x.getString(0), x.getLong(1)))
    val (sup, cust) = r.partition(_._1.startsWith("S"))
    sup.length should be > 0
    cust.length should be > 0
    val supAvg = sup.map(_._2).sum / sup.length
    val custAvg = cust.map(_._2).sum / cust.length
    // suppliers receive from many customers each (and every lineitem
    // fans in), customers receive only from even-order back-edges
    supAvg should be > custAvg
  }
}
