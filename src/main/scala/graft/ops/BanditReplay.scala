package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bandit policy evaluation by offline REPLAY (Li et al. 2011's
  * unbiased replay method): walk each user's logged event stream in
  * order; at every step the policy picks an arm from its current
  * statistics, and only events whose LOGGED arm matches the pick are
  * accepted (pull counted, reward credited) — the rest are skipped, as
  * if never shown. The per-user final (arm, pulls, rewards) table is
  * the policy's counterfactual scorecard over the log.
  *
  * The policy is deterministic epsilon-greedy (the replay paper's own
  * baseline): explore when md5p60(user:rn) ≡ 0 (mod 8) — the arm is
  * md5-chosen too — otherwise exploit the argmax of the exact integer
  * mean (s_i·S) div n_i, unpulled arms at an optimistic 2S so they are
  * tried first, ties to the lowest index. EVERYTHING is integer
  * arithmetic — a UCB bonus was prototyped and rejected: its
  * sqrt/ln/floor per step is trajectory-chaotic cross-engine (one ulp
  * flips an argmax, and the replay never re-converges), where the
  * integer policy is bit-exact by construction.
  *
  * Scale shape: ONE shuffle on user_id, then an O(#arms)-state ordered
  * fold per user (the Holt/Viterbi plane). The oracle replays the fold
  * as a per-rn recursive CTE carrying the 5-arm state as columns (the
  * q_viterbi oracle family: exact at the gate scales, serial by
  * construction — DuckDB recursion cost, not a Spark-side concern).
  */
object BanditReplay {

  val Arms: Seq[String] = Seq("click", "error", "purchase", "signup", "view")
  private val S = 1000000L

  /** Fold row (public for the Catalyst deserializer). */
  case class Bev(user_id: Long, ord: Long, tie: Long, rn: Long, arm: Int,
      r: Long, ex: Long)

  /** Replay over (user_id, ts, event_id, event_type, value). Output:
    * (user_id, arm, pulls, rewards) — #arms rows per user.
    */
  def replay(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val armExpr = Arms.zipWithIndex
      .map { case (a, i) => s"WHEN event_type = '$a' THEN $i" }
      .mkString("CASE ", " ", " ELSE -1 END")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    df.select(col("user_id"),
        expr("unix_micros(ts)").as("ord"),
        col("event_id").as("tie"),
        row_number().over(w).cast("long").as("rn"),
        expr(armExpr).as("arm"),
        when(col("value") >= 260.0, 1L).otherwise(0L).as("r"))
      .withColumn("ex",
        expr("md5p60(concat(CAST(user_id AS STRING), ':', CAST(rn AS STRING)))"))
      .as[Bev]
      .groupByKey(_.user_id)
      .flatMapSortedGroups($"ord", $"tie") { (uid, it) =>
        val k = Arms.length
        val n = Array.fill(k)(0L)
        val s = Array.fill(k)(0L)
        it.foreach { e =>
          val sel =
            if (e.ex % 8 == 0) ((e.ex / 8) % k).toInt
            else {
              var best = 0
              var bv = Long.MinValue
              var i = 0
              while (i < k) {
                val v = if (n(i) == 0) 2 * S else s(i) * S / n(i)
                if (v > bv) { bv = v; best = i }
                i += 1
              }
              best
            }
          if (sel == e.arm) { n(sel) += 1; s(sel) += e.r }
        }
        (0 until k).iterator.map(i => (uid, Arms(i), n(i), s(i)))
      }
      .toDF("user_id", "arm", "pulls", "rewards")
  }

  /** The identical replay as a DuckDB recursive CTE over a
    * `graft_bandit_ev` (user_id, rn, arm, r, ex) relation — ends
    * selecting (user_id, arm, pulls, rewards).
    */
  def oracleSql: String = {
    val k = Arms.length
    val idx = 0 until k
    val vals = idx.map(i =>
      s"""    CASE WHEN b.n$i = 0 THEN ${2 * S}
         |      ELSE (b.s$i * $S) // b.n$i END AS w$i,""".stripMargin)
      .mkString("\n")
    val argmax = idx.init.map { i =>
      val rest = (i + 1 until k).map(j => s"w$i >= w$j").mkString(" AND ")
      s"WHEN $rest THEN $i"
    }.mkString(" ")
    val nUpd = idx.map(i =>
      s"    b.n$i + CASE WHEN cursel = e.arm AND cursel = $i THEN 1 ELSE 0 END,")
      .mkString("\n")
    val sUpd = idx.map(i =>
      s"    b.s$i + CASE WHEN cursel = e.arm AND cursel = $i THEN e.r ELSE 0 END,")
      .mkString("\n")
    val zeros = idx.map(_ => "CAST(0 AS BIGINT)").mkString(", ")
    val cols = (idx.map(i => s"v$i") ++ Seq("sel") ++
      idx.map(i => s"n$i") ++ idx.map(i => s"s$i")).mkString(", ")
    val finals = Arms.zipWithIndex.map { case (a, i) =>
      s"""SELECT u.user_id, '$a' AS arm, u.n$i AS pulls, u.s$i AS rewards
         |FROM ucbm u JOIN mx ON mx.user_id = u.user_id AND mx.mrn = u.rn"""
        .stripMargin
    }.mkString("\nUNION ALL ")
    s"""ucb(user_id, rn, $cols) AS (
       |  SELECT user_id, 0,
       |    ${idx.map(_ => "CAST(NULL AS BIGINT)").mkString(", ")}, 0,
       |    $zeros, $zeros
       |  FROM (SELECT DISTINCT user_id FROM graft_bandit_ev)
       |  UNION ALL
       |  SELECT b.user_id, e.rn,
       |$vals
       |    CASE WHEN e.ex % 8 = 0 THEN CAST((e.ex // 8) % $k AS INTEGER)
       |      ELSE CASE $argmax ELSE ${k - 1} END END AS cursel,
       |$nUpd
       |$sUpd
       |  FROM ucb b JOIN graft_bandit_ev e
       |    ON e.user_id = b.user_id AND e.rn = b.rn + 1
       |), ucbm AS MATERIALIZED (
       |  SELECT * FROM ucb
       |), mx AS (
       |  SELECT user_id, max(rn) AS mrn FROM ucbm GROUP BY user_id
       |)
       |$finals""".stripMargin
  }
}
