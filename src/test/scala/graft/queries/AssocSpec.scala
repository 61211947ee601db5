package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkEntry
import graft.TestSpark

/** Semantic invariants of the association/drift statistics (value
  * equality vs DuckDB is the oracle gate's job; these pin what makes
  * the numbers MEANINGFUL).
  */
class AssocSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q_pmi_phrases: min support held, scores sorted, pairs distinct") {
    val rows = q("q_pmi_phrases")
      .select("a", "b", "cab", "pmi_fp").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    rows.length shouldBe 30
    rows.map(r => (r._1, r._2)).distinct.length shouldBe 30
    all(rows.map(_._3)) should be >= 5L
    rows.map(_._4).sliding(2).foreach {
      case Array(x, y) => x should be >= y
      case _ =>
    }
  }

  test("q_llr_terms: positive association scores, sorted, per-(lang,token) unique") {
    val rows = q("q_llr_terms")
      .select("lang", "token", "llr_fp").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    rows.length shouldBe 30
    rows.map(r => (r._1, r._2)).distinct.length shouldBe 30
    all(rows.map(_._3)) should be > 0L // G^2 >= 0; the top 30 are far from 0
    rows.map(_._3).sliding(2).foreach {
      case Array(x, y) => x should be >= y
      case _ =>
    }
  }

  test("q_ks_drift: bounded in [0, 1e6] and bit-equal to a local replay") {
    import spark.implicits._
    val got = q("q_ks_drift").as[(String, Long)].collect().toMap
    got.size should be > 0
    all(got.values) should (be >= 0L and be <= 1000000L)
    // exact integer replay from the raw rows (sf0.001 is collectable)
    val raw = graft.model.Tables.events(spark, sfDir)
      .select($"event_type", $"value", ($"event_id" % 2).as("side"))
      .as[(String, Double, Long)].collect()
    val replay = raw.groupBy(_._1).map { case (et, rs) =>
      val byVal = rs.groupBy(_._2).toSeq.sortBy(_._1)
      val nat = rs.count(_._3 == 0L).toLong
      val nbt = rs.count(_._3 == 1L).toLong
      var ca = 0L; var cb = 0L; var best = 0L
      for ((_, g) <- byVal) {
        ca += g.count(_._3 == 0L); cb += g.count(_._3 == 1L)
        val d = math.abs(ca * nbt - cb * nat) * 1000000L / math.max(nat * nbt, 1L)
        if (d > best) best = d
      }
      et -> best
    }.toMap
    got shouldBe replay
  }
}
