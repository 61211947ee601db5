package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Round-8 tier: generated-text evaluation — the reference-based overlap
  * metrics an LLM training pipeline scores candidate generations with
  * (BLEU for translation-style n-gram precision, token-F1 for extractive
  * QA, ROUGE-L for summary recall). Pairing convention throughout: the
  * odd doc is the CANDIDATE, the preceding even doc its REFERENCE
  * (`pair_id = doc_id div 2`) — a deterministic stand-in for the
  * (generation, gold) join a real eval harness produces.
  *
  * Reference scope: extension surface (the reference has no text-eval
  * tier; its only scoring is the out-of-scope LSTM loss,
  * /root/reference/AI-LSTM/LSTM_Stock_Market_Prediction.py:41-54).
  *
  * Cross-engine exactness: every count is integer; the only doubles are
  * single divisions of exact int64 (correctly rounded, so bit-identical
  * on both engines) and `sqrt`, the one transcendental IEEE 754 requires
  * correctly rounded — the BLEU geometric mean is therefore written as
  * `sqrt(sqrt((p1*p2)*(p3*p4)))` with pinned association instead of
  * `exp(avg(ln(p)))`, whose libm `exp`/`ln` are NOT cross-engine
  * bit-stable. The brevity penalty's `exp(1 - r/c)` is excluded for the
  * same reason: the exact integer lengths are in the output, so any
  * BP convention can be applied downstream.
  *
  * Scale shapes: n-gram extraction is row-local (one explode), every
  * join is an equi-join on (pair_id[, n, gram]) with partial-aggregable
  * counts — never all-pairs; ROUGE-L's O(n·m) DP is row-local inside
  * whole-stage codegen ([[graft.functions.LcsLen]]) over a truncated
  * eval window, the standard way ROUGE is run.
  */
object GenEvalQueries {

  /** Tokens per side ROUGE-L is scored over (a truncated eval window —
    * shared literal between the Spark slice and the oracle list_slice).
    */
  private val RougeWindow = 40

  private def pairedTokens(s: org.apache.spark.sql.SparkSession, d: String,
      minTokens: Int): org.apache.spark.sql.DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("tok"))
      .filter(size(col("tok")) >= minTokens)
    val cand = tok.filter(expr("doc_id % 2 = 1"))
      .select(expr("doc_id div 2").as("pair_id"), col("tok").as("ct"))
    val ref = tok.filter(expr("doc_id % 2 = 0"))
      .select(expr("doc_id div 2").as("pair_id"), col("tok").as("rt"))
    cand.join(ref, "pair_id")
  }

  /** All 1..4-gram (n, gram) structs of a token array, exploded. The
    * caller guarantees size >= 4 (Spark's `sequence(1, k)` DESCENDS for
    * k < 1, so an unguarded short array would fabricate grams).
    */
  private def grams(c: Column): Column = explode(flatten(transform(
    array(lit(1), lit(2), lit(3), lit(4)),
    n => transform(sequence(lit(1), size(c) - n + lit(1)),
      i => struct(n.cast("long").as("n"),
        concat_ws(" ", slice(c, i, n)).as("gram"))))))

  val all: Seq[QueryDef] = Seq(

    // ---- corpus BLEU components + smoothed geometric mean: clipped
    //      n-gram matches m_n = sum_g min(c_cand(g), c_ref(g)) and
    //      candidate totals t_n for n = 1..4, BLEU-S = the Lin-Och
    //      +1-smoothed precision geomean (p1 unsmoothed — t1 >= 4 by the
    //      filter; pn>=2 smoothed, the convention that keeps short pairs
    //      finite). One explode per side, counts per (pair, n, gram),
    //      one LEFT equi-join candidate->reference, one pivot agg ----
    QueryDef.sql(
      "q_bleu",
      """WITH tok AS MATERIALIZED (
        |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
        |  WHERE len(string_split(text, ' ')) >= 4
        |), pr AS MATERIALIZED (
        |  SELECT c.doc_id // 2 AS pair_id,
        |    CAST(len(c.l) AS BIGINT) AS cand_len,
        |    CAST(len(r.l) AS BIGINT) AS ref_len, c.l AS cl, r.l AS rl
        |  FROM tok c JOIN tok r
        |    ON c.doc_id % 2 = 1 AND r.doc_id = c.doc_id - 1
        |), g AS (
        |  SELECT pair_id, side, n,
        |    unnest(list_transform(range(1, len(l) - n + 2),
        |      i -> array_to_string(list_slice(l, i, i + n - 1), ' '))) AS gram
        |  FROM (SELECT pair_id, 'c' AS side, cl AS l FROM pr
        |        UNION ALL SELECT pair_id, 'r', rl FROM pr),
        |       (SELECT unnest([1, 2, 3, 4]) AS n)
        |), cnt AS (
        |  SELECT pair_id, side, n, gram, count(*) AS c
        |  FROM g GROUP BY pair_id, side, n, gram
        |), mt AS (
        |  SELECT c.pair_id, c.n,
        |    CAST(sum(least(c.c, coalesce(r.c, 0))) AS BIGINT) AS m,
        |    CAST(sum(c.c) AS BIGINT) AS t
        |  FROM (SELECT * FROM cnt WHERE side = 'c') c
        |  LEFT JOIN (SELECT * FROM cnt WHERE side = 'r') r
        |    USING (pair_id, n, gram)
        |  GROUP BY c.pair_id, c.n
        |), piv AS (
        |  SELECT pair_id,
        |    max(CASE WHEN n = 1 THEN m END) AS m1,
        |    max(CASE WHEN n = 1 THEN t END) AS t1,
        |    max(CASE WHEN n = 2 THEN m END) AS m2,
        |    max(CASE WHEN n = 2 THEN t END) AS t2,
        |    max(CASE WHEN n = 3 THEN m END) AS m3,
        |    max(CASE WHEN n = 3 THEN t END) AS t3,
        |    max(CASE WHEN n = 4 THEN m END) AS m4,
        |    max(CASE WHEN n = 4 THEN t END) AS t4
        |  FROM mt GROUP BY pair_id
        |)
        |SELECT p.pair_id, p.cand_len, p.ref_len,
        |  m1, t1, m2, t2, m3, t3, m4, t4,
        |  sqrt(sqrt(
        |    ((CAST(m1 AS DOUBLE) / CAST(t1 AS DOUBLE))
        |      * (CAST(m2 + 1 AS DOUBLE) / CAST(t2 + 1 AS DOUBLE)))
        |    * ((CAST(m3 + 1 AS DOUBLE) / CAST(t3 + 1 AS DOUBLE))
        |      * (CAST(m4 + 1 AS DOUBLE) / CAST(t4 + 1 AS DOUBLE)))))
        |    AS bleu_s
        |FROM pr p JOIN piv USING (pair_id)""".stripMargin
    ) { (s, d) =>
      val pairs = pairedTokens(s, d, minTokens = 4)
      val lens = pairs.select(col("pair_id"),
        size(col("ct")).cast("long").as("cand_len"),
        size(col("rt")).cast("long").as("ref_len"))
      def cnt(c: Column, side: String) = pairs
        .select(col("pair_id"), grams(c).as("g"))
        .groupBy(col("pair_id"), col("g.n").as("n"), col("g.gram").as("gram"))
        .agg(count(lit(1)).as(s"c_$side"))
      val mt = cnt(col("ct"), "c")
        .join(cnt(col("rt"), "r"), Seq("pair_id", "n", "gram"), "left")
        .groupBy(col("pair_id"), col("n"))
        .agg(sum(least(col("c_c"), coalesce(col("c_r"), lit(0L)))).as("m"),
          sum(col("c_c")).as("t"))
      def at(n: Int, c: String) = max(when(col("n") === n, col(c)))
      val piv = mt.groupBy("pair_id").agg(
        at(1, "m").as("m1"), at(1, "t").as("t1"),
        at(2, "m").as("m2"), at(2, "t").as("t2"),
        at(3, "m").as("m3"), at(3, "t").as("t3"),
        at(4, "m").as("m4"), at(4, "t").as("t4"))
      def p(mc: Column, tc: Column) = mc.cast("double") / tc.cast("double")
      lens.join(piv, "pair_id").withColumn("bleu_s",
        sqrt(sqrt(
          (p(col("m1"), col("t1"))
            * p(col("m2") + 1, col("t2") + 1))
          * (p(col("m3") + 1, col("t3") + 1)
            * p(col("m4") + 1, col("t4") + 1)))))
    },

    // ---- token-overlap F1 (the SQuAD answer metric): common = the
    //      multiset intersection size sum_tok min(c_cand, c_ref);
    //      F1 = 2·common/(cand_len+ref_len) — the harmonic mean
    //      simplifies to ONE exact-int division, so no p·r/(p+r)
    //      double chain. One explode per side, one equi-join ----
    QueryDef.sql(
      "q_token_f1",
      """WITH tok AS MATERIALIZED (
        |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
        |), pr AS MATERIALIZED (
        |  SELECT c.doc_id // 2 AS pair_id,
        |    CAST(len(c.l) AS BIGINT) AS cand_len,
        |    CAST(len(r.l) AS BIGINT) AS ref_len, c.l AS cl, r.l AS rl
        |  FROM tok c JOIN tok r
        |    ON c.doc_id % 2 = 1 AND r.doc_id = c.doc_id - 1
        |), cc AS (
        |  SELECT pair_id, t AS w, count(*) AS c
        |  FROM (SELECT pair_id, unnest(cl) AS t FROM pr)
        |  GROUP BY pair_id, t
        |), rc AS (
        |  SELECT pair_id, t AS w, count(*) AS c
        |  FROM (SELECT pair_id, unnest(rl) AS t FROM pr)
        |  GROUP BY pair_id, t
        |), ov AS (
        |  SELECT cc.pair_id,
        |    CAST(sum(least(cc.c, coalesce(rc.c, 0))) AS BIGINT) AS common
        |  FROM cc LEFT JOIN rc USING (pair_id, w)
        |  GROUP BY cc.pair_id
        |)
        |SELECT p.pair_id, p.cand_len, p.ref_len, o.common,
        |  CAST(o.common AS DOUBLE) / CAST(p.cand_len AS DOUBLE) AS prec,
        |  CAST(o.common AS DOUBLE) / CAST(p.ref_len AS DOUBLE) AS rec,
        |  CAST(2 * o.common AS DOUBLE) / CAST(p.cand_len + p.ref_len AS DOUBLE)
        |    AS f1
        |FROM pr p JOIN ov o USING (pair_id)""".stripMargin
    ) { (s, d) =>
      val pairs = pairedTokens(s, d, minTokens = 1)
      val lens = pairs.select(col("pair_id"),
        size(col("ct")).cast("long").as("cand_len"),
        size(col("rt")).cast("long").as("ref_len"))
      def cnt(c: Column, side: String) = pairs
        .select(col("pair_id"), explode(c).as("w"))
        .groupBy("pair_id", "w").agg(count(lit(1)).as(s"c_$side"))
      val ov = cnt(col("ct"), "c")
        .join(cnt(col("rt"), "r"), Seq("pair_id", "w"), "left")
        .groupBy("pair_id")
        .agg(sum(least(col("c_c"), coalesce(col("c_r"), lit(0L)))).as("common"))
      lens.join(ov, "pair_id").select(col("pair_id"),
        col("cand_len"), col("ref_len"), col("common"),
        (col("common").cast("double") / col("cand_len").cast("double"))
          .as("prec"),
        (col("common").cast("double") / col("ref_len").cast("double"))
          .as("rec"),
        ((col("common") * 2).cast("double")
          / (col("cand_len") + col("ref_len")).cast("double")).as("f1"))
    },

    // ---- ROUGE-L over a truncated eval window: token-level LCS via the
    //      codegen'd [[graft.functions.LcsLen]] (row-local O(n·m) DP
    //      inside whole-stage codegen — Spark has levenshtein but no
    //      LCS). Oracle: the DP ROW is carried as a LIST column through
    //      ONE recursive CTE (the PhraseSegment column-carry idiom
    //      lifted to lists), using the prefix-max identity
    //      dp[i][j] = max_{k<=j} max(prev[k], match_k ? prev[k-1]+1 : 0)
    //      so the within-row dependency never recurses ----
    QueryDef.sql(
      "q_rouge_l",
      s"""WITH RECURSIVE tok AS MATERIALIZED (
         |  SELECT doc_id,
         |    list_slice(string_split(text, ' '), 1, $RougeWindow) AS l
         |  FROM documents
         |), pr AS MATERIALIZED (
         |  SELECT c.doc_id // 2 AS pair_id, c.l AS cl, r.l AS rl,
         |    CAST(len(c.l) AS BIGINT) AS n, CAST(len(r.l) AS BIGINT) AS m
         |  FROM tok c JOIN tok r
         |    ON c.doc_id % 2 = 1 AND r.doc_id = c.doc_id - 1
         |), dp(pair_id, i, vr) AS (
         |  SELECT pair_id, CAST(0 AS BIGINT),
         |    list_transform(range(0, m + 1), j -> CAST(0 AS BIGINT))
         |  FROM pr
         |  UNION ALL
         |  SELECT pair_id, i + 1, list_prepend(CAST(0 AS BIGINT),
         |    list_transform(range(1, m + 1),
         |      j -> list_max(list_slice(cand, 1, j))))
         |  FROM (
         |    SELECT p.pair_id, d.i, p.m,
         |      list_transform(range(1, p.m + 1), j ->
         |        greatest(d.vr[CAST(j + 1 AS INTEGER)],
         |          CASE WHEN p.cl[CAST(d.i + 1 AS INTEGER)]
         |                    = p.rl[CAST(j AS INTEGER)]
         |            THEN d.vr[CAST(j AS INTEGER)] + 1
         |            ELSE CAST(0 AS BIGINT) END)) AS cand
         |    FROM dp d JOIN pr p USING (pair_id)
         |    WHERE d.i < p.n)
         |), dpm AS MATERIALIZED (SELECT * FROM dp)
         |SELECT p.pair_id, p.n AS cand_len_t, p.m AS ref_len_t,
         |  d.vr[CAST(p.m + 1 AS INTEGER)] AS lcs,
         |  CAST(d.vr[CAST(p.m + 1 AS INTEGER)] AS DOUBLE)
         |    / CAST(p.n AS DOUBLE) AS rl_p,
         |  CAST(d.vr[CAST(p.m + 1 AS INTEGER)] AS DOUBLE)
         |    / CAST(p.m AS DOUBLE) AS rl_r,
         |  CAST(2 * d.vr[CAST(p.m + 1 AS INTEGER)] AS DOUBLE)
         |    / CAST(p.n + p.m AS DOUBLE) AS rl_f
         |FROM dpm d JOIN pr p USING (pair_id) WHERE d.i = p.n""".stripMargin
    ) { (s, d) =>
      val tok = Tables.documents(s, d).select(col("doc_id"),
        slice(split(col("text"), " "), 1, RougeWindow).as("tok"))
      val cand = tok.filter(expr("doc_id % 2 = 1"))
        .select(expr("doc_id div 2").as("pair_id"), col("tok").as("ct"))
      val ref = tok.filter(expr("doc_id % 2 = 0"))
        .select(expr("doc_id div 2").as("pair_id"), col("tok").as("rt"))
      cand.join(ref, "pair_id")
        .select(col("pair_id"),
          size(col("ct")).cast("long").as("cand_len_t"),
          size(col("rt")).cast("long").as("ref_len_t"),
          graft.functions.Lcs.lcsLen(col("ct"), col("rt")).as("lcs"))
        .select(col("pair_id"), col("cand_len_t"), col("ref_len_t"),
          col("lcs"),
          (col("lcs").cast("double") / col("cand_len_t").cast("double"))
            .as("rl_p"),
          (col("lcs").cast("double") / col("ref_len_t").cast("double"))
            .as("rl_r"),
          ((col("lcs") * 2).cast("double")
            / (col("cand_len_t") + col("ref_len_t")).cast("double"))
            .as("rl_f"))
    }
  )
}
