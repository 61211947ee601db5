package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Forward-algorithm filtering posteriors for a 2-state HMM over per-key
  * event sequences — the sum-product companion to [[Viterbi]]'s
  * max-product decoder: where Viterbi commits to ONE most-likely path,
  * the forward pass reports P(state | observations so far) per row — the
  * regime-probability signal (risk-on/off, engaged/churning) a
  * downstream consumer can threshold itself.
  *
  * All arithmetic is exact integer fixed point at scale `S`: the state
  * distribution (a0, a1) always sums to exactly S (a1 is defined as
  * S − a0, never divided independently), transitions are fp
  * probabilities, emissions are positive integer weights (any common
  * scale — per-step normalization erases it):
  * {{{
  *   prior_s = (a0·tr(0,s) + a1·tr(1,s)) div S
  *   u_s     = we_s · prior_s
  *   a0'     = (u0 · S) div (u0 + u1);  a1' = S − a0'
  * }}}
  * Initialization is the same normalize applied to the bare emission
  * weights (uniform prior, common factor cancelled). Since a0 + a1 = S
  * and both transition probabilities are ≥ 1 fp unit, every prior is
  * ≥ min(pStay, pSwitch) ≥ 1, so u0 + u1 > 0 — no division guard
  * needed. Headroom: u_s ≤ weMax·S and the normalize multiplies by S,
  * so `weMax · S² < 2^63` — weMax ~ 9e6 at the default S = 1e6; ANSI
  * makes a breach loud.
  *
  * Scale shape: ONE shuffle on the sequence key, then an O(1)-state
  * ordered fold per key (`flatMapSortedGroups`, the [[Holt]] shape) —
  * unlike Viterbi no backtrack buffer is needed, so this IS streamable
  * state (p_t depends only on (a0, a1) and the new row).
  */
object HmmForward {

  /** Fold row (public: Catalyst's deserializer cannot access a private
    * case class). we0/we1 = per-state positive emission weights.
    */
  case class Ev(
      user_id: Long, ord: Long, tie: Long, event_id: Long, we0: Long, we1: Long)

  /** Filter per-user sequences of `df` (columns: user_id, ts, event_id,
    * we0, we1). Output: (user_id, rn, event_id, p1_fp) — one row per
    * input event, p1_fp = P(state 1 | obs so far) at scale `scale`.
    */
  def filter(df: DataFrame, pStay: Long = 800000L,
      scale: Long = 1000000L): DataFrame = {
    require(pStay >= 1 && pStay < scale)
    val pSwitch = scale - pStay
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("user_id"),
        expr("unix_micros(ts)").as("ord"),
        col("event_id").as("tie"),
        col("event_id"), col("we0"), col("we1"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapSortedGroups($"ord", $"tie") { (_, it) =>
        var a0 = 0L
        var a1 = 0L
        var rn = 0L
        it.map { row =>
          rn += 1
          val (u0, u1) =
            if (rn == 1L) (row.we0, row.we1)
            else {
              val prior0 = (a0 * pStay + a1 * pSwitch) / scale
              val prior1 = (a0 * pSwitch + a1 * pStay) / scale
              (row.we0 * prior0, row.we1 * prior1)
            }
          a0 = u0 * scale / (u0 + u1)
          a1 = scale - a0
          (row.user_id, rn, row.event_id, a1)
        }
      }
      .toDF("user_id", "rn", "event_id", "p1_fp")
  }

  /** The identical fold as a DuckDB recursive CTE over a `graft_hmm_ev`
    * (user_id, rn, event_id, we0, we1) relation — the oracle twin of
    * [[filter]]; ends selecting (user_id, rn, event_id, p1_fp).
    */
  def oracleSql(pStay: Long = 800000L, scale: Long = 1000000L): String = {
    val pSw = scale - pStay
    s"""fwd(user_id, rn, a0, a1) AS (
       |  SELECT user_id, rn,
       |    (we0 * $scale) // (we0 + we1),
       |    $scale - ((we0 * $scale) // (we0 + we1))
       |  FROM graft_hmm_ev WHERE rn = 1
       |  UNION ALL
       |  SELECT user_id, rn, (u0 * $scale) // (u0 + u1),
       |    $scale - ((u0 * $scale) // (u0 + u1))
       |  FROM (
       |    SELECT e.user_id, e.rn,
       |      e.we0 * ((f.a0 * $pStay + f.a1 * $pSw) // $scale) AS u0,
       |      e.we1 * ((f.a0 * $pSw + f.a1 * $pStay) // $scale) AS u1
       |    FROM fwd f JOIN graft_hmm_ev e
       |      ON e.user_id = f.user_id AND e.rn = f.rn + 1)
       |)
       |SELECT f.user_id, f.rn, e.event_id, f.a1 AS p1_fp
       |FROM fwd f JOIN graft_hmm_ev e
       |  ON e.user_id = f.user_id AND e.rn = f.rn""".stripMargin
  }
}
