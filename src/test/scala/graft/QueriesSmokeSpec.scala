package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query runs end-to-end at sf0.001 and returns a sane
  * result; queries that can legitimately be empty are allowlisted.
  */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private val mayBeEmpty =
    Set("q_anti_customers_no_orders", "q_minhash_pairs")

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // rows-only queries: no cross-engine oracle exists; each must carry a
  // dedicated unit spec instead (q_media_features -> MultimodalSpec,
  // q_approx_distinct -> ApproxDistinctSpec and q_quantiles_approx ->
  // ApproxQuantilesSpec: DuckDB's sketches differ, so the contract is an
  // error bound, not a hash match). The BPE pair graduated to hash-exact
  // oracles in round 3 (OracleBpe's unrolled merge rounds).
  private val rowsOnlyAllowed =
    Set("q_media_features", "q_approx_distinct", "q_quantiles_approx")

  test("every query has either an oracle or a documented reason") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // keep this list tiny and intentional
    assert(noOracle == rowsOnlyAllowed, s"queries without oracle: $noOracle")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }
}
