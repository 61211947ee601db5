package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Team-draft interleaving evaluation (Radlinski/Kurup/Joachims 2008) —
  * the online-eval primitive for comparing two rankers on live traffic:
  * per query the two rankings are interleaved by alternating "team
  * picks" (a coin decides which team drafts first each round; each team
  * drafts its highest-ranked not-yet-placed item), users click, and
  * each click credits the team that drafted the clicked item. The
  * per-query winner is the team with more credited clicks — an unbiased
  * paired preference test that needs ~10x less traffic than A/B-ing the
  * rankers on separate buckets.
  *
  * Determinism contract: the draft coin and the click model are pure
  * md5p60 hashes (coin r of query q: `md5p60(q || '#' || r) % 2 = 0`
  * means team A drafts first; item c is clicked iff
  * `md5p60(q || ':' || c) % 4 = 0`), so the whole simulation is a pure
  * function of the two rankings and both engines replay it exactly.
  *
  * Scale shape: candidate scoring and ranking stay in Catalyst (the
  * q_rrf_fusion plane: broadcast query batch x corpus scan, per-query
  * rank windows ride WindowGroupLimit); the draft simulation itself is
  * a sequential two-pointer process with no associative window form
  * (each pick depends on every previous pick), so it runs as a typed
  * per-query fold over the two top-k arrays — state bounded by 2k ids
  * per query, never by the corpus ([[Holt]] boundary argument).
  */
object Interleave {

  /** Candidate entry: item id + precomputed click bit (public:
    * Catalyst's generated deserializer cannot access a private class).
    */
  case class Cand(c: Long, k: Boolean)

  /** One query's draft inputs: ranked candidate lists of both teams
    * (rank order, <= k entries) + the per-round draft coins.
    */
  case class QIn(q_id: Long, la: Seq[Cand], lb: Seq[Cand], coins: Seq[Boolean])

  /** Simulate the team-draft over `rounds` rounds and credit clicks.
    * `df` columns: q_id, la, lb (array<struct<c,k>> in rank order),
    * coins (array<boolean>, one per round). Output: (q_id, clicks_a,
    * clicks_b, pref) with pref 1 if A wins, -1 if B, 0 tie.
    */
  def run(df: DataFrame, rounds: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("q_id"), col("la"), col("lb"), col("coins"))
      .as[QIn]
      .map { in =>
        var chosen = Set.empty[Long]
        var ca = 0L
        var cb = 0L
        def draft(l: Seq[Cand]): Option[Cand] = {
          val p = l.find(x => !chosen.contains(x.c))
          p.foreach(x => chosen += x.c)
          p
        }
        def credit(p: Option[Cand]): Long =
          if (p.exists(_.k)) 1L else 0L
        for (r <- 0 until rounds) {
          if (in.coins(r)) { // A drafts first this round
            ca += credit(draft(in.la))
            cb += credit(draft(in.lb))
          } else {
            cb += credit(draft(in.lb))
            ca += credit(draft(in.la))
          }
        }
        (in.q_id, ca, cb,
          if (ca > cb) 1 else if (cb > ca) -1 else 0)
      }
      .toDF("q_id", "clicks_a", "clicks_b", "pref")
  }

  /** The identical simulation as a DuckDB recursive CTE — the oracle
    * twin of [[run]]. Expects a `graft_il_lists` CTE with columns
    * (q_id, la BIGINT[], lb BIGINT[]) (rank order, <= k entries each).
    * Ends selecting (q_id, clicks_a, clicks_b, pref).
    *
    * Recursive-member notes: columns map POSITIONALLY and lateral
    * aliases may only reference EARLIER aliases, so the per-round picks
    * are CTE columns (pa, pb) computed before the chosen-list update;
    * the second drafter's filter inlines the first drafter's pick. The
    * lateral aliases are pa_n/pb_n, NOT pa/pb: a bare reference to a
    * name that is also a CTE column resolves to the (stale, previous-
    * round) column, not the alias — found the hard way. And no emitted
    * line may START with `||`: callers embed this text in their own
    * stripMargin block, which would re-strip the first bar.
    */
  def oracleSql(rounds: Int): String = {
    def h(arg: String) =
      s"CAST(concat('0x', substr(md5($arg), 1, 15)) AS BIGINT)"
    val coin = h("CAST(s.q_id AS VARCHAR) || '#' || CAST(s.r AS VARCHAR)") +
      " % 2 = 0"
    def click(x: String) =
      h(s"CAST(s.q_id AS VARCHAR) || ':' || CAST($x AS VARCHAR)") + " % 4 = 0"
    def first(list: String, ch: String) =
      s"(list_filter($list, x -> NOT list_contains($ch, x)))[1]"
    s"""sim(q_id, r, pa, pb, chosen, ca, cb) AS (
       |  SELECT q_id, 0, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       |    CAST([] AS BIGINT[]), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
       |  FROM graft_il_lists
       |  UNION ALL
       |  SELECT s.q_id, s.r + 1,
       |    CASE WHEN $coin THEN ${first("l.la", "s.chosen")}
       |         ELSE ${first("l.la",
                 s"(CASE WHEN ${first("l.lb", "s.chosen")} IS NULL " +
                   s"THEN s.chosen ELSE list_append(s.chosen, " +
                   s"${first("l.lb", "s.chosen")}) END)")} END AS pa_n,
       |    CASE WHEN $coin THEN ${first("l.lb",
                 "(CASE WHEN pa_n IS NULL THEN s.chosen " +
                   "ELSE list_append(s.chosen, pa_n) END)")}
       |         ELSE ${first("l.lb", "s.chosen")} END AS pb_n,
       |    (CASE WHEN pa_n IS NULL THEN s.chosen
       |          ELSE list_append(s.chosen, pa_n) END) ||
       |      (CASE WHEN pb_n IS NULL THEN [] ELSE [pb_n] END),
       |    s.ca + CASE WHEN pa_n IS NOT NULL AND ${click("pa_n")}
       |      THEN 1 ELSE 0 END,
       |    s.cb + CASE WHEN pb_n IS NOT NULL AND ${click("pb_n")}
       |      THEN 1 ELSE 0 END
       |  FROM sim s JOIN graft_il_lists l ON l.q_id = s.q_id
       |  WHERE s.r < $rounds
       |)
       |SELECT q_id, ca AS clicks_a, cb AS clicks_b,
       |  CASE WHEN ca > cb THEN 1 WHEN cb > ca THEN -1 ELSE 0 END AS pref
       |FROM sim WHERE r = $rounds""".stripMargin
  }
}
