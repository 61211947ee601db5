package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Viterbi decoding of a 2-state HMM over per-key event sequences —
  * max-product dynamic programming in exact integer log-scores, the
  * classical sequence-labeling primitive (session intent segmentation,
  * regime tagging) next to [[graft.queries.AnalyticsQueries]]'s Markov
  * transition model (which ESTIMATES dynamics; Viterbi LABELS a
  * sequence under known dynamics).
  *
  * Scores are integer log-probabilities (any common scale): emission
  * e_s(x_t) per state from columns, transition `stay`/`switch`
  * constants. Forward pass
  * {{{
  *   v_t(s) = e_s(x_t) + max(v_(t-1)(0) + tr(0,s), v_(t-1)(1) + tr(1,s))
  * }}}
  * with argmax backpointers (ties -> state 0), terminal argmax (tie ->
  * 0), then the standard backtrack. Everything is int64 adds/maxes with
  * total order — bit-identical at any parallelism, |v| <= L * (|e|max +
  * |tr|max), no overflow for any realistic sequence.
  *
  * Scale shape: ONE shuffle on the sequence key, then an in-memory DP
  * per key (`flatMapSortedGroups`). Unlike [[Holt]]'s O(1)-state fold,
  * Viterbi's backtrack needs the per-key sequence buffered — state is
  * O(sequence length), the irreducible cost of exact decoding (the
  * published streaming alternative, fixed-lag decoding, trades
  * exactness for O(lag)). Bound the key's sequence (session/day
  * chunking) for unbounded streams.
  */
object Viterbi {

  /** Fold row (public: Catalyst's deserializer cannot access a private
    * case class). e0/e1 = per-state emission scores, precomputed as
    * COLUMNS so hashing stays columnar and the fold is pure arithmetic.
    */
  case class Ev(
      user_id: Long, ord: Long, tie: Long, event_id: Long, e0: Long, e1: Long)

  /** Decode per-user sequences of `df` (columns: user_id, ts, event_id,
    * e0, e1). Output: (user_id, rn, event_id, state) — one row per
    * input event, rn the 1-based position within the user's sequence.
    */
  def decode(df: DataFrame, stay: Long = -1L, switch: Long = -4L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("user_id"),
        expr("unix_micros(ts)").as("ord"),
        col("event_id").as("tie"),
        col("event_id"), col("e0"), col("e1"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapSortedGroups($"ord", $"tie") { (_, it) =>
        val rows = it.toArray // O(seq) buffer: exact decoding needs the backtrack
        val n = rows.length
        val v0 = new Array[Long](n)
        val v1 = new Array[Long](n)
        val bp0 = new Array[Int](n)
        val bp1 = new Array[Int](n)
        v0(0) = rows(0).e0
        v1(0) = rows(0).e1
        var i = 1
        while (i < n) {
          val a0 = v0(i - 1) + stay   // 0 -> 0
          val b0 = v1(i - 1) + switch // 1 -> 0
          bp0(i) = if (a0 >= b0) 0 else 1
          v0(i) = rows(i).e0 + math.max(a0, b0)
          val a1 = v0(i - 1) + switch // 0 -> 1
          val b1 = v1(i - 1) + stay   // 1 -> 1
          bp1(i) = if (a1 >= b1) 0 else 1
          v1(i) = rows(i).e1 + math.max(a1, b1)
          i += 1
        }
        val states = new Array[Int](n)
        states(n - 1) = if (v0(n - 1) >= v1(n - 1)) 0 else 1
        i = n - 1
        while (i >= 1) {
          states(i - 1) = if (states(i) == 0) bp0(i) else bp1(i)
          i -= 1
        }
        rows.indices.iterator.map(j =>
          (rows(j).user_id, (j + 1).toLong, rows(j).event_id, states(j)))
      }
      .toDF("user_id", "rn", "event_id", "state")
  }

  /** The identical DP as DuckDB recursive CTEs over a `graft_hmm_ev`
    * (user_id, rn, event_id, e0, e1) relation: forward scores up,
    * backtrack down (the backpointer is RECOMPUTED from the forward
    * scores with the same tie rule — identical to storing it).
    *
    * The forward result is re-materialized (`fwdm`) before the backtrack
    * consumes it: DuckDB inlines plain CTE references, so a backtrack
    * recursion referencing `fwd` directly re-runs the ENTIRE forward
    * recursion at every backward step — O(maxlen²) full-table passes
    * (measured 106 s on q_bursts at sf0.01; 0.6 s with the
    * materialization). Callers must likewise declare `graft_hmm_ev`
    * `AS MATERIALIZED`, or each forward step re-runs its window + md5
    * scan.
    */
  def oracleSql(stay: Long = -1L, switch: Long = -4L): String =
    s"""fwd(user_id, rn, v0, v1) AS (
       |  SELECT user_id, rn, e0, e1 FROM graft_hmm_ev WHERE rn = 1
       |  UNION ALL
       |  SELECT e.user_id, e.rn,
       |    e.e0 + greatest(fwd.v0 + $stay, fwd.v1 + $switch),
       |    e.e1 + greatest(fwd.v0 + $switch, fwd.v1 + $stay)
       |  FROM fwd JOIN graft_hmm_ev e
       |    ON e.user_id = fwd.user_id AND e.rn = fwd.rn + 1
       |), fwdm AS MATERIALIZED (
       |  SELECT * FROM fwd
       |), lastrn AS (
       |  SELECT user_id, max(rn) AS t FROM graft_hmm_ev GROUP BY user_id
       |), bwd(user_id, rn, state) AS (
       |  SELECT f.user_id, f.rn,
       |    CASE WHEN f.v0 >= f.v1 THEN 0 ELSE 1 END
       |  FROM fwdm f JOIN lastrn l ON l.user_id = f.user_id AND f.rn = l.t
       |  UNION ALL
       |  SELECT f.user_id, f.rn,
       |    CASE WHEN bwd.state = 0
       |      THEN CASE WHEN f.v0 + $stay >= f.v1 + $switch THEN 0 ELSE 1 END
       |      ELSE CASE WHEN f.v0 + $switch >= f.v1 + $stay THEN 0 ELSE 1 END
       |    END
       |  FROM bwd JOIN fwdm f
       |    ON f.user_id = bwd.user_id AND f.rn = bwd.rn - 1
       |)
       |SELECT e.user_id, e.rn, e.event_id, bwd.state
       |FROM bwd JOIN graft_hmm_ev e
       |  ON e.user_id = bwd.user_id AND e.rn = bwd.rn""".stripMargin
}
