package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Corpus sampling and novelty accounting.
  *
  * `q_stratified_sample`: EXACT proportional allocation (largest-
  * remainder / Hamilton method) of a fixed sample budget across strata
  * — the correct way to cut an evaluation or annotation subset from a
  * skewed corpus. Every step is integer arithmetic (`(S*n_i) div N`,
  * integer remainders for the +1 round), then a deterministic
  * md5-keyed pick inside each stratum — bit-reproducible at any
  * parallelism, no `rand()`.
  *
  * `q_ngram_novelty`: per-document novelty = the fraction of its
  * distinct token trigrams whose FIRST corpus occurrence (min doc_id)
  * is this document — the "how much of this doc is new text"
  * curve that drives crawl-dedup payoff analysis (cf. the repetition
  * measurements in Lee et al. 2022).
  *
  * Scale shapes: the stratum allocation frame is |strata| rows
  * (broadcast); the in-stratum pick is a partitioned window. Trigram
  * extraction is row-local; the first-occurrence pass is one groupBy
  * over distinct (ngram) — bounded by distinct-trigram count — and one
  * equi join back, never all-pairs.
  */
object SamplingQueries {

  private val SampleN = 100L

  /** q_priority_sample size (k; the threshold is the (k+1)-th priority). */
  private val PriorityK = 100

  val all: Seq[QueryDef] = Seq(

    QueryDef.sql(
      "q_stratified_sample",
      s"""WITH st AS (
         |  SELECT lang, count(*) AS n FROM documents GROUP BY lang
         |), tot AS (
         |  SELECT CAST(sum(n) AS BIGINT) AS big_n, count(*) AS n_strata
         |  FROM st
         |), alloc0 AS (
         |  SELECT st.lang, st.n,
         |    ($SampleN * st.n) // tot.big_n AS base,
         |    $SampleN * st.n - (($SampleN * st.n) // tot.big_n) * tot.big_n
         |      AS rem
         |  FROM st CROSS JOIN tot
         |), leftover AS (
         |  SELECT $SampleN - CAST(sum(base) AS BIGINT) AS k FROM alloc0
         |), alloc AS (
         |  SELECT lang,
         |    base + (CASE WHEN row_number() OVER (ORDER BY rem DESC, lang)
         |                  <= leftover.k THEN 1 ELSE 0 END) AS quota
         |  FROM alloc0 CROSS JOIN leftover
         |), keyed AS (
         |  SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
         |        AS BIGINT), doc_id) AS rk
         |  FROM documents
         |)
         |SELECT k.doc_id, k.lang FROM keyed k
         |JOIN alloc a ON k.lang = a.lang AND k.rk <= a.quota""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d)
      val st = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      val tot = st.agg(sum(col("n")).as("big_n"), count(lit(1)).as("n_strata"))
      val alloc0 = st.crossJoin(broadcast(tot))
        .select(col("lang"), col("n"),
          expr(s"($SampleN * n) div big_n").as("base"),
          expr(s"$SampleN * n - (($SampleN * n) div big_n) * big_n").as("rem"))
      val leftover = alloc0.agg((lit(SampleN) - sum(col("base"))).as("k"))
      // the allocation frame is |strata| rows: the global round-robin
      // window is over that tiny frame, not the corpus
      val alloc = alloc0.crossJoin(broadcast(leftover))
        .withColumn("rn", row_number().over(
          Window.orderBy(col("rem").desc, col("lang"))))
        .select(col("lang"),
          (col("base") + when(col("rn") <= col("k"), 1L).otherwise(0L))
            .as("quota"))
      val keyed = docs.select(col("doc_id"), col("lang"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("lang"))
            .orderBy(expr("md5p60(cast(doc_id as string))"), col("doc_id"))))
      keyed.join(broadcast(alloc), Seq("lang"))
        .filter(col("rk") <= col("quota"))
        .select("doc_id", "lang")
    }.intendsNestedLoop(
      "cross joins against broadcast 1-row corpus-total / leftover scalar frames"
    ).intendsGlobalWindow(
      "largest-remainder round-robin over the |strata|-row allocation " +
        "frame (5 langs), never the corpus"),

    // ---- Weighted sampling without replacement (Efraimidis–Spirakis
    //      A-ES): key_i = u_i^(1/w_i), keep the top-k keys — here in log
    //      space, score = ln(u)/w with w = n_chars, so the sample is
    //      length-proportional (the token-budget-weighted cut a training
    //      mix actually takes). u is deterministic md5 "randomness"
    //      (reproducible at any parallelism, no rand()); the score is
    //      quantized to 1e-6 with a doc_id tie-break so the cross-engine
    //      compare never rests on the last ulp of ln(). Scale shape:
    //      row-local score + global top-k = TakeOrderedAndProject, no
    //      shuffle, no window ----
    QueryDef.sql(
      "q_weighted_sample",
      """SELECT doc_id, lang, n_chars,
        |  CAST(floor(1e6 *
        |    ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |          AS BIGINT) + 1e0) / 1152921504606846977e0)
        |    / n_chars) AS BIGINT) AS sq
        |FROM documents WHERE n_chars > 0
        |ORDER BY sq DESC, doc_id LIMIT 100""".stripMargin
    ) { (s, d) =>
      val u = (expr("md5p60(cast(doc_id as string))").cast("double") + lit(1.0)) /
        lit(1.152921504606846977e18) // 2^60 + 1: u in (0, 1]
      Tables.documents(s, d)
        .filter(col("n_chars") > 0)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          floor(lit(1e6) * log(u) / col("n_chars")).cast("long").as("sq"))
        .orderBy(col("sq").desc, col("doc_id"))
        .limit(100)
    },

    QueryDef.sql(
      "q_ngram_novelty",
      """WITH docs AS (
        |  SELECT doc_id, string_split(text, ' ') AS l FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3
        |), tri AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(range(3, len(l) + 1),
        |      i -> l[i - 2] || ' ' || l[i - 1] || ' ' || l[i])) AS ngram
        |  FROM docs
        |), first_seen AS (
        |  SELECT ngram, min(doc_id) AS first_doc FROM tri GROUP BY ngram
        |)
        |SELECT tri.doc_id,
        |  count(*) AS n_ngrams,
        |  count(*) FILTER (WHERE first_seen.first_doc = tri.doc_id)
        |    AS n_novel,
        |  CAST(count(*) FILTER (WHERE first_seen.first_doc = tri.doc_id)
        |    AS DOUBLE) / count(*) AS novelty
        |FROM tri JOIN first_seen USING (ngram)
        |GROUP BY tri.doc_id""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("l"))
        .filter(size(col("l")) >= 3)
      val tri = docs.select(col("doc_id"),
        explode(expr(
          "transform(sequence(3, size(l)), i -> concat_ws(' ', " +
            "element_at(l, i - 2), element_at(l, i - 1), element_at(l, i)))"
        )).as("ngram"))
        .distinct()
      val firstSeen = tri.groupBy(col("ngram")).agg(min(col("doc_id")).as("first_doc"))
      tri.join(firstSeen, Seq("ngram"))
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_ngrams"),
          count(when(col("first_doc") === col("doc_id"), 1)).as("n_novel"))
        .select(col("doc_id"), col("n_ngrams"), col("n_novel"),
          (col("n_novel").cast("double") / col("n_ngrams")).as("novelty"))
    },

    // ---- Poisson-bootstrap standard errors (Chamandy et al. 2012, the
    //      published bootstrap-at-scale method: each row's replicate
    //      weight is an INDEPENDENT Poisson(1) draw, so no coordinated
    //      resample pass exists — any partition can weight its rows
    //      alone). Deterministic twin: the draw is the integer inverse
    //      CDF of Poisson(1) at the 60-bit md5 uniform of
    //      (event_id:replicate) — the q_dp_counts mechanism pattern, no
    //      rand(). B = 32 replicates; per (group, replicate) the
    //      weighted mean in exact integers; SE over replicates from
    //      1e3-scaled means so B·Σm² stays far inside int64 at any
    //      value magnitude ≤ ~5e5. The ×32 explode collapses in the
    //      map-side partial agg — the shuffle carries #groups × 32
    //      rows, never corpus × 32 ----
    QueryDef.sql(
      "q_bootstrap_se",
      s"""WITH base AS (
         |  SELECT event_type, event_id,
         |    CAST(floor(value * 1e6) AS BIGINT) AS vq
         |  FROM events
         |), rep AS (
         |  SELECT event_type, vq, b,
         |    CAST(concat('0x', substr(md5(
         |      CAST(event_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)),
         |      1, 15)) AS BIGINT) AS u
         |  FROM base CROSS JOIN (SELECT unnest(range(0, 32)) AS b)
         |), wts AS (
         |  SELECT event_type, b, vq, $poissonCase AS w FROM rep
         |), g AS (
         |  SELECT event_type, b, CAST(sum(w * vq) AS BIGINT) AS sb,
         |    CAST(sum(w) AS BIGINT) AS nb
         |  FROM wts GROUP BY event_type, b
         |), m AS (
         |  SELECT event_type, b, sb // nb AS mean_fp,
         |    sb // (nb * 1000) AS m3
         |  FROM g WHERE nb > 0
         |), agg AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS nb_reps,
         |    CAST(sum(m3) AS BIGINT) AS s1,
         |    CAST(sum(m3 * m3) AS BIGINT) AS s2,
         |    min(mean_fp) AS mn_fp, max(mean_fp) AS mx_fp
         |  FROM m GROUP BY event_type
         |)
         |SELECT event_type, nb_reps AS n_reps,
         |  CAST(floor(sqrt(CAST(nb_reps * s2 - s1 * s1 AS DOUBLE)
         |    / (nb_reps * (nb_reps - 1)))) AS BIGINT) AS se_fp3,
         |  mn_fp, mx_fp
         |FROM agg""".stripMargin
    ) { (s, d) =>
      val base = Tables.events(s, d)
        .select(col("event_type"), col("event_id"),
          expr("CAST(floor(value * 1e6) AS BIGINT)").as("vq"))
      val rep = base
        .select(col("event_type"), col("vq"),
          explode(expr("sequence(0, 31)")).as("b"),
          col("event_id"))
        .withColumn("u", expr(
          "md5p60(concat(CAST(event_id AS STRING), ':', CAST(b AS STRING)))"))
        .withColumn("w", expr(poissonCase))
      val g = rep.groupBy(col("event_type"), col("b"))
        .agg(sum(expr("w * vq")).as("sb"), sum(col("w")).as("nb"))
        .filter(col("nb") > 0)
        .select(col("event_type"),
          expr("sb div nb").as("mean_fp"),
          expr("sb div (nb * 1000L)").as("m3"))
      g.groupBy(col("event_type"))
        .agg(count(lit(1)).as("nb_reps"),
          sum(col("m3")).as("s1"), sum(expr("m3 * m3")).as("s2"),
          min(col("mean_fp")).as("mn_fp"), max(col("mean_fp")).as("mx_fp"))
        .select(col("event_type"), col("nb_reps").as("n_reps"),
          expr("CAST(floor(sqrt(CAST(nb_reps * s2 - s1 * s1 AS DOUBLE)" +
            " / (nb_reps * (nb_reps - 1)))) AS BIGINT)").as("se_fp3"),
          col("mn_fp"), col("mx_fp"))
    },

    // ---- Priority sampling (Duffield-Lund-Thorup 2007): the weighted
    //      sample that also carries UNBIASED subset-sum estimates —
    //      q_weighted_sample's A-ES cut is a sample; this one is an
    //      ESTIMATOR: priority q_i = w_i/u_i, keep the top-k, threshold
    //      tau = the (k+1)-th priority, and ŵ_i = max(w_i, tau) is
    //      exactly unbiased for w_i (DLT Thm 1) — the standard way a
    //      100 TB pipeline keeps a tiny weighted sample whose sums still
    //      estimate any corpus aggregate. u is deterministic md5
    //      "randomness"; the priority is ONE multiply + ONE divide of
    //      exact-int-derived doubles (correctly rounded, cross-engine
    //      bit-stable), top-(k+1) = TakeOrdered, the rank/threshold
    //      window is over the 101-row candidate frame, never the
    //      corpus. ŵ quantized floor(·1e2) BEFORE summing so the
    //      estimate is an order-free integer sum. err_fp (vs the exact
    //      total, eval-only) is valid to Σw ~ 9e10 chars — drop the
    //      ×1e6 beyond ----
    QueryDef.sql(
      "q_priority_sample",
      s"""WITH it AS (
         |  SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
         |    CAST(n_chars AS DOUBLE) * 1.152921504606846976e18
         |      / CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
         |          1, 15)) AS BIGINT) + 1 AS DOUBLE) AS pr
         |  FROM documents WHERE n_chars > 0
         |), top1 AS MATERIALIZED (
         |  SELECT doc_id, w, pr,
         |    row_number() OVER (ORDER BY pr DESC, doc_id) AS rk
         |  FROM (SELECT * FROM it ORDER BY pr DESC, doc_id
         |        LIMIT ${PriorityK + 1})
         |), tau AS (
         |  SELECT coalesce(max(pr), 0e0) AS tau
         |  FROM top1 WHERE rk = ${PriorityK + 1}
         |), tot AS (
         |  SELECT CAST(sum(w) AS BIGINT) AS exact_total FROM it
         |), samp AS (
         |  SELECT t.doc_id, t.w,
         |    CAST(floor(greatest(CAST(t.w AS DOUBLE), tau.tau) * 1e2)
         |      AS BIGINT) AS w_hat_fp
         |  FROM top1 t CROSS JOIN tau WHERE t.rk <= $PriorityK
         |)
         |SELECT s.doc_id, s.w, s.w_hat_fp, e.est_total_fp,
         |  tot.exact_total,
         |  (abs(e.est_total_fp - tot.exact_total * 100) * 1000000)
         |    // (tot.exact_total * 100) AS err_fp
         |FROM samp s
         |CROSS JOIN (SELECT CAST(sum(w_hat_fp) AS BIGINT) AS est_total_fp
         |            FROM samp) e
         |CROSS JOIN tot""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val it = Tables.documents(s, d).filter(col("n_chars") > 0)
        .select(col("doc_id"), col("n_chars").cast("long").as("w"),
          expr("CAST(n_chars AS DOUBLE) * 1.152921504606846976e18" +
            " / CAST(md5p60(CAST(doc_id AS STRING)) + 1 AS DOUBLE)")
            .as("pr"))
      val top1 = it.orderBy(col("pr").desc, col("doc_id"))
        .limit(PriorityK + 1)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("pr").desc, col("doc_id"))))
      // DLT defines tau = 0 (w_hat = w) when n <= k: aggregate to ONE
      // row even when the (k+1)-th candidate doesn't exist, so small
      // corpora yield the whole population instead of an annihilated
      // cross join
      val tau = top1.filter(col("rk") === PriorityK + 1)
        .agg(coalesce(max(col("pr")), lit(0.0)).as("tau"))
      val tot = it.agg(sum(col("w")).as("exact_total"))
      val samp = top1.filter(col("rk") <= PriorityK)
        .crossJoin(broadcast(tau))
        .select(col("doc_id"), col("w"),
          expr("CAST(floor(greatest(CAST(w AS DOUBLE), tau) * 1e2)" +
            " AS BIGINT)").as("w_hat_fp"))
      val est = samp.agg(sum(col("w_hat_fp")).as("est_total_fp"))
      samp.crossJoin(broadcast(est)).crossJoin(broadcast(tot))
        .select(col("doc_id"), col("w"), col("w_hat_fp"),
          col("est_total_fp"), col("exact_total"),
          expr("(abs(est_total_fp - exact_total * 100) * 1000000)" +
            " div (exact_total * 100)").as("err_fp"))
    }.intendsNestedLoop(
      "broadcast sides are the 1-row tau / est / exact-total frames"
    ).intendsGlobalWindow(
      s"rank window is over the TakeOrdered ${PriorityK + 1}-row " +
        "candidate frame, never the corpus")
  )

  /** Poisson(1) inverse-CDF as a SQL CASE over a 60-bit uniform column
    * `u` — thresholds floor(cdf_k · 2^60) precomputed HERE and embedded
    * as identical literals in both engines' texts (so cross-engine
    * exactness never depends on either engine's exp/factorial). Tail
    * capped at 8: P(Poisson(1) > 8) < 1e-6, and the cap only reweights
    * one-in-a-million rows by the same rule on both sides.
    */
  private lazy val poissonCase: String = {
    val scale = math.pow(2.0, 60)
    val e1 = math.exp(-1.0)
    var cdf = 0.0
    var fact = 1.0
    val whens = (0 to 7).map { k =>
      if (k > 0) fact *= k
      cdf += e1 / fact
      s"WHEN u < ${math.floor(cdf * scale).toLong} THEN $k"
    }
    s"CASE ${whens.mkString(" ")} ELSE 8 END"
  }
}
