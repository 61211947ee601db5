package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Association & distribution-shift statistics for corpus curation —
  * three passes every large-scale text pipeline runs between ingest and
  * training:
  *
  *  - PMI phrase mining (the word2vec phrase pass, Mikolov et al. 2013:
  *    score(ab) = (c_ab − δ)·N / (c_a·c_b)) — which adjacent token
  *    pairs behave as single units;
  *  - log-likelihood-ratio term–label association (Dunning 1993 G²) —
  *    the feature-selection score behind quality/domain classifiers
  *    (chi-square's small-count-safe sibling; all four contingency
  *    cells contribute);
  *  - two-sample Kolmogorov–Smirnov drift per stream key — the
  *    distribution-shift monitor between corpus snapshots, next to the
  *    KL token drift (`q_dist_drift`) but over a CONTINUOUS metric.
  *
  * Reference scope: extension surface (the reference has no text/assoc
  * statistics; its aggregations are price scalars —
  * services/spark/app/api/views.py). Part of the training-data tier.
  *
  * Numeric contract (the `klContrib` convention): counts and cumulative
  * counts are exact int64; each score is quantized by flooring at 1e6
  * after at most one `ln` (the single 1-ulp-risk op, absorbed by the
  * quantization — the q_bm25_topk/q_dist_drift precedent); every
  * multiply/divide is spelled in the same order on both engines.
  * Int64 headroom contracts are documented per query below.
  */
object AssocQueries {

  /** One G² contingency-cell term: 2e6 · x · ln(x·N / (rm·cm)), floored,
    * 0 when the cell is empty. `x`, `rm`, `cm`, `nn` are int64 column
    * expressions; the products stay inside int64 for N·max-count < 2^63
    * (documented on q_llr_terms).
    */
  private def g2cell(x: String, rm: String, cm: String): String =
    s"""(CASE WHEN ($x) > 0 THEN CAST(floor(2000000e0 * ($x)
       |  * ln((($x) * nn) * 1e0 / (($rm) * ($cm)))) AS BIGINT)
       |  ELSE 0 END)""".stripMargin

  /** The same cell term in DuckDB spelling (identical text modulo the
    * engines' shared syntax — kept adjacent so they cannot drift).
    */
  private def g2cellDuck(x: String, rm: String, cm: String): String =
    g2cell(x, rm, cm)

  val all: Seq[QueryDef] = Seq(

    // ---- PMI phrase mining (Mikolov et al. 2013): adjacent-pair score
    //      (c_ab − 5)·N·1e6 div (c_a·c_b), pairs with c_ab >= 5, top
    //      30. ONE tokenize pass feeds unigram and bigram counts (both
    //      partial-aggregable groupBys); the total-token scalar
    //      broadcasts. Int64 headroom: c_ab·N·1e6 < 2^63 bounds total
    //      tokens N at ~3e6 at this quantization — beyond that, lower
    //      the 1e6 scale or mine over a hash-sampled doc stream (the
    //      klContrib mitigation; scores are scale-invariant in N) ----
    QueryDef.sql(
      "q_pmi_phrases",
      """WITH t AS (
        |  SELECT string_split(text, ' ') AS toks,
        |    len(string_split(text, ' ')) AS n
        |  FROM documents
        |), uni AS (
        |  SELECT w, count(*) AS cw FROM (
        |    SELECT unnest(toks) AS w FROM t) GROUP BY w
        |), tot AS (SELECT CAST(sum(cw) AS BIGINT) AS n FROM uni),
        |big AS (
        |  SELECT a, b, count(*) AS cab FROM (
        |    SELECT unnest(list_transform(range(1, n), i -> toks[i])) AS a,
        |           unnest(list_transform(range(1, n), i -> toks[i + 1])) AS b
        |    FROM t WHERE n >= 2)
        |  GROUP BY a, b
        |)
        |SELECT big.a, big.b, big.cab,
        |  ((big.cab - 5) * tot.n * 1000000) // (ua.cw * ub.cw) AS pmi_fp
        |FROM big CROSS JOIN tot
        |JOIN uni ua ON ua.w = big.a JOIN uni ub ON ub.w = big.b
        |WHERE big.cab >= 5
        |ORDER BY pmi_fp DESC, big.a, big.b LIMIT 30""".stripMargin
    ) { (s, d) =>
      val t = Tables.documents(s, d)
        .select(split(col("text"), " ").as("toks"),
          size(split(col("text"), " ")).as("n"))
      val uni = t.select(explode(col("toks")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cw"))
      val tot = uni.agg(sum(col("cw")).as("n"))
      val big = t.filter(col("n") >= 2)
        .select(explode(expr(
          "transform(sequence(1, n - 1), " +
            "i -> struct(element_at(toks, i) AS a, element_at(toks, i + 1) AS b))"))
          .as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cab"))
      big.filter(col("cab") >= 5)
        .join(uni.select(col("w").as("a"), col("cw").as("ca")), "a")
        .join(uni.select(col("w").as("b"), col("cw").as("cb")), "b")
        .crossJoin(broadcast(tot))
        .select(col("a"), col("b"), col("cab"),
          expr("((cab - 5) * n * 1000000) div (ca * cb)").as("pmi_fp"))
        .orderBy(col("pmi_fp").desc, col("a"), col("b"))
        .limit(30)
    }.intendsNestedLoop(
      "broadcast side is the single-row total-token-count frame"),

    // ---- Dunning G² term–label association (feature selection for the
    //      quality/domain classifiers): full 2x2 contingency per
    //      (token, lang) over DOC-LEVEL presence, all four cells'
    //      2·n·ln(n·N/(row·col)) contributions floored at 1e6 and
    //      summed; tokens in >= 5 docs, top 30. One distinct-presence
    //      pass feeds every margin (partial-aggregable); the per-lang
    //      margins and N broadcast. Int64 headroom: cell·N < 2^63
    //      bounds the doc count N at ~3e9 (cells are <= N); the double
    //      mantissa bounds 2e6·n·ln at n ~ 4e8 — both far above any
    //      single-snapshot corpus this scores; hash-sample docs beyond
    //      (the klContrib mitigation) ----
    QueryDef.sql(
      "q_llr_terms",
      s"""WITH dt AS (
         |  SELECT DISTINCT doc_id, lang, unnest(string_split(text, ' ')) AS w
         |  FROM documents
         |), n11 AS (
         |  SELECT w, lang, count(*) AS n11 FROM dt GROUP BY w, lang
         |), r AS (
         |  SELECT w, CAST(sum(n11) AS BIGINT) AS r FROM n11 GROUP BY w
         |), c AS (
         |  SELECT lang, count(*) AS c FROM documents GROUP BY lang
         |), nd AS (SELECT count(*) AS nn FROM documents)
         |SELECT n11.lang, n11.w AS token,
         |  ${g2cellDuck("n11.n11", "r.r", "c.c")}
         |  + ${g2cellDuck("r.r - n11.n11", "r.r", "nn - c.c")}
         |  + ${g2cellDuck("c.c - n11.n11", "nn - r.r", "c.c")}
         |  + ${g2cellDuck("nn - r.r - c.c + n11.n11", "nn - r.r", "nn - c.c")}
         |  AS llr_fp
         |FROM n11 JOIN r ON r.w = n11.w JOIN c ON c.lang = n11.lang
         |CROSS JOIN nd
         |WHERE r.r >= 5 AND r.r < nn AND c.c < nn
         |ORDER BY llr_fp DESC, n11.lang, token LIMIT 30""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d)
      val dt = docs
        .select(col("doc_id"), col("lang"),
          explode(array_distinct(split(col("text"), " "))).as("w"))
      val n11 = dt.groupBy(col("w"), col("lang")).agg(count(lit(1)).as("n11"))
      val r = n11.groupBy(col("w")).agg(sum(col("n11")).as("r"))
      val c = docs.groupBy(col("lang")).agg(count(lit(1)).as("c"))
      val nd = docs.agg(count(lit(1)).as("nn"))
      n11.join(r, "w").join(broadcast(c), "lang").crossJoin(broadcast(nd))
        .filter(col("r") >= 5 && col("r") < col("nn") && col("c") < col("nn"))
        .select(col("lang"), col("w").as("token"),
          (expr(g2cell("n11", "r", "c"))
            + expr(g2cell("r - n11", "r", "nn - c"))
            + expr(g2cell("c - n11", "nn - r", "c"))
            + expr(g2cell("nn - r - c + n11", "nn - r", "nn - c"))
          ).as("llr_fp"))
        .orderBy(col("llr_fp").desc, col("lang"), col("token"))
        .limit(30)
    }.intendsNestedLoop(
      "broadcast side is the single-row corpus-doc-count frame"),

    // ---- Two-sample KS drift per event_type: D = max |F_A − F_B| over
    //      the pooled value order, A/B = even/odd event ids (the
    //      deterministic snapshot split). Pre-aggregating per DISTINCT
    //      (key, value) makes the cumulative window tie-free and
    //      shrinks it to distinct-value cardinality; the window is
    //      PARTITIONED by key (never a global single-partition sort).
    //      KS_fp = floor(|ca·nB − cb·nA|·1e6 / (nA·nB)) — exact int64;
    //      headroom nA·nB·1e6 < 2^63 bounds per-key side counts at
    //      ~3e6 balanced: beyond that, KS over a hash-sampled stream
    //      (D converges at ~1.36/sqrt(n); sampling is the textbook
    //      estimator) ----
    QueryDef.sql(
      "q_ks_drift",
      """WITH ev AS (
        |  SELECT event_type, value, event_id % 2 AS side FROM events
        |), pv AS (
        |  SELECT event_type, value,
        |    CAST(count(*) FILTER (side = 0) AS BIGINT) AS na,
        |    CAST(count(*) FILTER (side = 1) AS BIGINT) AS nb
        |  FROM ev GROUP BY event_type, value
        |), cum AS (
        |  SELECT event_type,
        |    CAST(sum(na) OVER (PARTITION BY event_type ORDER BY value) AS BIGINT) AS ca,
        |    CAST(sum(nb) OVER (PARTITION BY event_type ORDER BY value) AS BIGINT) AS cb,
        |    CAST(sum(na) OVER (PARTITION BY event_type) AS BIGINT) AS nat,
        |    CAST(sum(nb) OVER (PARTITION BY event_type) AS BIGINT) AS nbt
        |  FROM pv
        |)
        |SELECT event_type,
        |  max((abs(ca * nbt - cb * nat) * 1000000)
        |    // greatest(nat * nbt, 1)) AS ks_fp
        |FROM cum GROUP BY event_type
        |ORDER BY event_type""".stripMargin
    ) { (s, d) =>
      val pv = Tables.events(s, d)
        .select(col("event_type"), col("value"),
          pmod(col("event_id"), lit(2)).as("side"))
        .groupBy(col("event_type"), col("value"))
        .agg(
          sum(when(col("side") === 0, 1L).otherwise(0L)).as("na"),
          sum(when(col("side") === 1, 1L).otherwise(0L)).as("nb"))
      val wCum = Window.partitionBy(col("event_type")).orderBy(col("value"))
      val wAll = Window.partitionBy(col("event_type"))
      pv
        .withColumn("ca", sum(col("na")).over(wCum))
        .withColumn("cb", sum(col("nb")).over(wCum))
        .withColumn("nat", sum(col("na")).over(wAll))
        .withColumn("nbt", sum(col("nb")).over(wAll))
        .groupBy(col("event_type"))
        .agg(max(expr(
          "(abs(ca * nbt - cb * nat) * 1000000) div greatest(nat * nbt, 1L)"))
          .as("ks_fp"))
        .orderBy(col("event_type"))
    },

    // ---- 1-D Wasserstein (earth-mover) drift per event_type: the
    //      MAGNITUDE-sensitive companion to q_ks_drift's max-gap D —
    //      KS says whether distributions differ, W1 = ∫|F_A − F_B| dv
    //      says by how much VALUE mass moved (the metric that ranks
    //      "prices shifted 2 cents" below "prices doubled"). Same
    //      even/odd split and tie-free distinct-cents grid as KS; the
    //      CDF gap is the q_ks_drift fixed-point rational, weighted by
    //      the grid gap to the next value (lead, last row contributes
    //      nothing). emd_fp / 1e6 = W1 in cents. Headroom: the gap
    //      rational (x*1e6)//g is evaluated by the exact split-division
    //      identity (x//g)*1e6 + ((x%g)*1e3//g)*1e3 + ((x%g)*1e3%g)*1e3//g
    //      — same value, but the largest intermediate is g*1e3 instead
    //      of g*1e6, so sides are safe to ~9.6e7 rows per event_type
    //      (g = nat*nbt ≤ 9.2e15) instead of ~3e6; terms ≤ 1e6·range,
    //      safe to ~9e9 total cents of range ----
    QueryDef.sql(
      "q_emd_drift",
      """WITH ev AS (
        |  SELECT event_type, CAST(floor(value * 1e2 + 5e-1) AS BIGINT) AS v,
        |    event_id % 2 AS side
        |  FROM events
        |), pv AS (
        |  SELECT event_type, v,
        |    CAST(count(*) FILTER (side = 0) AS BIGINT) AS na,
        |    CAST(count(*) FILTER (side = 1) AS BIGINT) AS nb
        |  FROM ev GROUP BY event_type, v
        |), cum AS (
        |  SELECT event_type, v,
        |    CAST(sum(na) OVER w AS BIGINT) AS ca,
        |    CAST(sum(nb) OVER w AS BIGINT) AS cb,
        |    CAST(sum(na) OVER (PARTITION BY event_type) AS BIGINT) AS nat,
        |    CAST(sum(nb) OVER (PARTITION BY event_type) AS BIGINT) AS nbt,
        |    lead(v) OVER (PARTITION BY event_type ORDER BY v) AS nv
        |  FROM pv
        |  WINDOW w AS (PARTITION BY event_type ORDER BY v)
        |), xg AS (
        |  SELECT event_type, v, nat, nbt, nv,
        |    abs(ca * nbt - cb * nat) AS x,
        |    greatest(nat * nbt, 1) AS g
        |  FROM cum
        |)
        |SELECT event_type, max(nat) AS n_a, max(nbt) AS n_b,
        |  CAST(sum(CASE WHEN nv IS NULL THEN 0
        |    ELSE ((x // g) * 1000000
        |      + (((x % g) * 1000) // g) * 1000
        |      + ((((x % g) * 1000) % g) * 1000) // g) * (nv - v) END)
        |    AS BIGINT) AS emd_fp
        |FROM xg GROUP BY event_type
        |ORDER BY event_type""".stripMargin
    ) { (s, d) =>
      val pv = Tables.events(s, d)
        .select(col("event_type"),
          expr("CAST(floor(value * 1e2 + 5e-1) AS BIGINT)").as("v"),
          pmod(col("event_id"), lit(2)).as("side"))
        .groupBy(col("event_type"), col("v"))
        .agg(
          sum(when(col("side") === 0, 1L).otherwise(0L)).as("na"),
          sum(when(col("side") === 1, 1L).otherwise(0L)).as("nb"))
      val wCum = Window.partitionBy(col("event_type")).orderBy(col("v"))
      val wAll = Window.partitionBy(col("event_type"))
      pv
        .withColumn("ca", sum(col("na")).over(wCum))
        .withColumn("cb", sum(col("nb")).over(wCum))
        .withColumn("nat", sum(col("na")).over(wAll))
        .withColumn("nbt", sum(col("nb")).over(wAll))
        .withColumn("nv", lead(col("v"), 1).over(wCum))
        .withColumn("x", expr("abs(ca * nbt - cb * nat)"))
        .withColumn("g", expr("greatest(nat * nbt, 1L)"))
        .groupBy(col("event_type"))
        .agg(max(col("nat")).as("n_a"), max(col("nbt")).as("n_b"),
          sum(expr("""CASE WHEN nv IS NULL THEN 0L
                     |ELSE ((x div g) * 1000000
                     |  + (((x % g) * 1000) div g) * 1000
                     |  + ((((x % g) * 1000) % g) * 1000) div g)
                     |  * (nv - v) END"""
            .stripMargin)).as("emd_fp"))
        .orderBy(col("event_type"))
    },

    // ---- Population stability index (PSI): the production ML-
    //      monitoring drift metric next to q_ks_drift's KS statistic —
    //      decile bins learned from the BASELINE half (even event ids,
    //      the KS split convention), both halves binned, PSI =
    //      Σ (pc − pb)·ln(pc/pb) with +1-smoothed 1e9-fp fractions
    //      (the 1e9 scale keeps the smoothed floor ≥ 1 to corpus
    //      sizes; the ln chain is the single identical-op-order
    //      double). Decile edges are exact baseline order statistics
    //      off the cents-quantized grid CDF; bin assignment is a
    //      9-row broadcast non-equi join. Per-bin rows + the PSI
    //      total over the ≤10-row bin frame ----
    QueryDef.sql(
      "q_psi",
      """WITH ev AS (
        |  SELECT CAST(floor(value * 1e2) AS BIGINT) AS v,
        |    event_id % 2 AS side
        |  FROM events
        |), grid AS (
        |  SELECT v,
        |    CAST(count(*) FILTER (side = 0) AS BIGINT) AS na,
        |    CAST(count(*) FILTER (side = 1) AS BIGINT) AS nb
        |  FROM ev GROUP BY v
        |), cum AS (
        |  SELECT v, na, nb,
        |    CAST(sum(na) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS ca,
        |    CAST(sum(na) OVER () AS BIGINT) AS nat
        |  FROM grid
        |), edges AS (
        |  SELECT k, min(v) AS edge
        |  FROM cum CROSS JOIN (VALUES (1), (2), (3), (4), (5), (6), (7),
        |    (8), (9)) ks(k)
        |  WHERE ca * 10 >= k * nat
        |  GROUP BY k
        |), binned AS (
        |  SELECT g.v, g.na, g.nb, CAST(count(e.edge) AS BIGINT) AS bin
        |  FROM grid g LEFT JOIN edges e ON e.edge < g.v
        |  GROUP BY g.v, g.na, g.nb
        |), bc AS (
        |  SELECT bin, CAST(sum(na) AS BIGINT) AS n_base,
        |    CAST(sum(nb) AS BIGINT) AS n_cur
        |  FROM binned GROUP BY bin
        |), tot AS (
        |  SELECT CAST(sum(n_base) AS BIGINT) AS tb,
        |    CAST(sum(n_cur) AS BIGINT) AS tc
        |  FROM bc
        |), p AS (
        |  SELECT bin, n_base, n_cur,
        |    ((n_base + 1) * 1000000000) // (tb + 10) AS pb_fp,
        |    ((n_cur + 1) * 1000000000) // (tc + 10) AS pc_fp
        |  FROM bc CROSS JOIN tot
        |)
        |SELECT bin, n_base, n_cur, pb_fp, pc_fp,
        |  CAST(floor((pc_fp - pb_fp) * ln((1e0 * pc_fp) / pb_fp) / 1e3)
        |    AS BIGINT) AS term_fp,
        |  CAST(sum(CAST(floor((pc_fp - pb_fp)
        |    * ln((1e0 * pc_fp) / pb_fp) / 1e3) AS BIGINT)) OVER ()
        |    AS BIGINT) AS psi_fp
        |FROM p""".stripMargin
    ) { (s, d) =>
      val ev2 = Tables.events(s, d)
        .select(expr("CAST(floor(value * 1e2) AS BIGINT)").as("v"),
          pmod(col("event_id"), lit(2)).as("side"))
      val grid = ev2.groupBy(col("v"))
        .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("na"),
          sum(when(col("side") === 1, 1L).otherwise(0L)).as("nb"))
      val wCum = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val cum = grid
        .withColumn("ca", sum(col("na")).over(wCum))
        .withColumn("nat", sum(col("na")).over(wAll))
      val ks = { import s.implicits._; (1 to 9).toDF("k") }
      val edges = cum.crossJoin(broadcast(ks))
        .filter(col("ca") * 10 >= col("k") * col("nat"))
        .groupBy(col("k")).agg(min(col("v")).as("edge"))
      val binned = grid.join(broadcast(edges), col("edge") < col("v"), "left")
        .groupBy(col("v"), col("na"), col("nb"))
        .agg(count(col("edge")).as("bin"))
      val bc = binned.groupBy(col("bin"))
        .agg(sum(col("na")).as("n_base"), sum(col("nb")).as("n_cur"))
      val tot = bc.agg(sum(col("n_base")).as("tb"), sum(col("n_cur")).as("tc"))
      val p = bc.crossJoin(broadcast(tot))
        .select(col("bin"), col("n_base"), col("n_cur"),
          expr("((n_base + 1) * 1000000000L) div (tb + 10)").as("pb_fp"),
          expr("((n_cur + 1) * 1000000000L) div (tc + 10)").as("pc_fp"))
      p.withColumn("term_fp",
          expr("CAST(floor((pc_fp - pb_fp) * ln((1e0 * pc_fp) / pb_fp) " +
            "/ 1e3) AS BIGINT)"))
        .withColumn("psi_fp",
          sum(col("term_fp")).over(Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
    }.intendsGlobalWindow(
      "windows run on the cents-quantized distinct-value grid and the " +
        "<= 10-row bin frame — value-range-bounded, never the corpus")
      .intendsNestedLoop(
        "broadcast sides are the 9-row decile-edge frame, the constant " +
          "k frame and the 1-row totals"),

    // ---- Categorical association: chi-square + Cramér's V between
    //      event type and day-of-week — the effect-size companion the
    //      testing tier lacked (q_kruskal compares DISTRIBUTIONS of a
    //      numeric; this measures association strength of two
    //      categoricals, V ∈ [0,1] comparable across tables). Per-cell
    //      (O·N − R·C)²/(N·R·C) through the single identical-op-order
    //      double chain (int64 products exact under 2^53), quantized
    //      per cell then summed exactly; V = sqrt off the already-
    //      quantized chi². Contingency cells ≤ types × 7 — metadata ----
    QueryDef.sql(
      "q_cramers_v",
      """WITH o AS (
        |  SELECT event_type, dayofweek(ts) AS dow,
        |    CAST(count(*) AS BIGINT) AS obs
        |  FROM events GROUP BY 1, 2
        |), r AS (
        |  SELECT event_type, CAST(sum(obs) AS BIGINT) AS rt
        |  FROM o GROUP BY event_type
        |), c AS (
        |  SELECT dow, CAST(sum(obs) AS BIGINT) AS ct FROM o GROUP BY dow
        |), n AS (
        |  SELECT CAST(sum(obs) AS BIGINT) AS nt,
        |    CAST(count(DISTINCT event_type) AS BIGINT) AS nr,
        |    CAST(count(DISTINCT dow) AS BIGINT) AS nc
        |  FROM o
        |), cells AS (
        |  SELECT CAST(floor((1e0 * obs * nt - 1e0 * rt * ct)
        |      * (1e0 * obs * nt - 1e0 * rt * ct)
        |      / (1e0 * rt * ct * nt) * 1e4) AS BIGINT) AS cell_fp,
        |    nt, nr, nc
        |  FROM o JOIN r USING (event_type) JOIN c USING (dow) CROSS JOIN n
        |)
        |SELECT nt AS n, nr AS n_rows, nc AS n_cols,
        |  (nr - 1) * (nc - 1) AS dof,
        |  CAST(sum(cell_fp) AS BIGINT) AS chi2_fp,
        |  CAST(floor(sqrt((1e0 * CAST(sum(cell_fp) AS BIGINT))
        |    / (1e4 * nt * least(nr - 1, nc - 1))) * 1e6) AS BIGINT)
        |    AS cramers_v_fp
        |FROM cells GROUP BY nt, nr, nc""".stripMargin
    ) { (s, d) =>
      val o = Tables.events(s, d)
        .groupBy(col("event_type"),
          (dayofweek(col("ts")) - 1).as("dow"))
        .agg(count(lit(1)).as("obs"))
      val r = o.groupBy(col("event_type")).agg(sum(col("obs")).as("rt"))
      val c = o.groupBy(col("dow").as("cdow")).agg(sum(col("obs")).as("ct"))
      val n = o.agg(sum(col("obs")).as("nt"),
        countDistinct(col("event_type")).as("nr"),
        countDistinct(col("dow")).as("nc"))
      o.join(r, "event_type")
        .join(c, col("cdow") === col("dow"))
        .crossJoin(broadcast(n))
        .select(
          expr("""CAST(floor((1e0 * obs * nt - 1e0 * rt * ct)
                 |  * (1e0 * obs * nt - 1e0 * rt * ct)
                 |  / (1e0 * rt * ct * nt) * 1e4) AS BIGINT)"""
            .stripMargin).as("cell_fp"),
          col("nt"), col("nr"), col("nc"))
        .groupBy(col("nt"), col("nr"), col("nc"))
        .agg(sum(col("cell_fp")).as("chi2_fp"))
        .select(col("nt").as("n"), col("nr").as("n_rows"),
          col("nc").as("n_cols"),
          ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
          col("chi2_fp"),
          expr("""CAST(floor(sqrt((1e0 * chi2_fp)
                 |  / (1e4 * nt * least(nr - 1, nc - 1))) * 1e6) AS BIGINT)"""
            .stripMargin).as("cramers_v_fp"))
    }.intendsNestedLoop(
      "broadcast side is the 1-row contingency-totals frame"),

    // ---- Entropic optimal transport (see ops.Sinkhorn): the drift
    //      tier's multi-dimensional leg — q_emd_drift's exact 1-D EMD
    //      does not generalize; the Sinkhorn plan says how much
    //      probability mass moved WHERE on the joint (value-decile ×
    //      3-hour-bucket) grid between the even/odd event populations,
    //      and ot_cost_fp is the regularized 2-D Wasserstein readout.
    //      Corpus touched once (two conditional histogram aggs);
    //      15 scaling rounds live on the ≤80-point supports. Value
    //      deciles come from a 1-row broadcast max (no quantile
    //      window); the Gibbs kernel is a shared integer-literal
    //      table ----
    QueryDef.sql(
      "q_sinkhorn_ot",
      s"""WITH ev0 AS MATERIALIZED (
         |  SELECT event_id % 2 AS h,
         |    CAST(floor(value * 1e2) AS BIGINT) AS cents,
         |    CAST(hour(ts) AS BIGINT) // 3 AS hb
         |  FROM events
         |), mx AS (
         |  SELECT max(cents) AS mxc FROM ev0
         |), graft_ot_cells AS MATERIALIZED (
         |  SELECT h, (cents * 10) // (mx.mxc + 1) AS vb, hb
         |  FROM ev0, mx
         |),
         |${graft.ops.Sinkhorn.oracleSql()}""".stripMargin
    ) { (s, d) =>
      val ev0 = Tables.events(s, d).select(
        (col("event_id") % 2).as("h"),
        expr("CAST(floor(value * 1e2) AS BIGINT)").as("cents"),
        expr("CAST(hour(ts) AS BIGINT) div 3").as("hb"))
      val mx = ev0.agg(max(col("cents")).as("mxc"))
      val cells = ev0.crossJoin(broadcast(mx))
        .select(col("h"), expr("(cents * 10) div (mxc + 1)").as("vb"),
          col("hb"))
      graft.ops.Sinkhorn.run(cells)
    }
    // No plan intent: the r9 driver-local Sinkhorn rewrite returns a
    // LocalTableScan; the corpus-touching crossJoins execute inside
    // eager sub-jobs and never appear in the returned frame's plan.
  )
}
