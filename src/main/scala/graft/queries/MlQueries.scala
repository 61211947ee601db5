package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecOps
import graft.model.Tables
import graft.ops.Classify

/** Classification / evaluation queries over the labelled embedding corpus
  * ([[graft.ops.Classify]]): nearest-centroid prediction, kNN
  * majority-vote, and the confusion-matrix eval — the quality-measurement
  * end of a training-data pipeline (how separable is the embedding space
  * the dedup/ANN operators run on?).
  */
object MlQueries {

  /** DuckDB CTE chain ending in `pred(vec_id, true_label, pred_label)`:
    * per-label fixed-point centroids + max-cosine assignment — the exact
    * twin of [[Classify.nearestCentroid]] (same mean arithmetic as the
    * k-means oracle's update step, same (cos DESC, label) tie-break).
    */
  private def centroidPredCtes: String =
    s"""cb AS (
       |  SELECT cent_id, list(val ORDER BY pos) AS cent_emb FROM (
       |    SELECT CAST(label AS BIGINT) AS cent_id, pos,
       |      CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
       |        / CAST(count(*) AS DOUBLE) AS val
       |    FROM (
       |      SELECT label, unnest(embedding) AS x,
       |        unnest(range(1, len(embedding) + 1)) AS pos
       |      FROM embeddings)
       |    GROUP BY label, pos)
       |  GROUP BY cent_id
       |), pred AS (
       |  SELECT vec_id, true_label, CAST(cent_id AS INT) AS pred_label FROM (
       |    SELECT e.vec_id, e.label AS true_label, c.cent_id,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${OracleVec.cos("e.embedding", "c.cent_emb")} DESC, c.cent_id)
       |        AS rk
       |    FROM embeddings e, cb c) WHERE rk = 1
       |)""".stripMargin

  /** DuckDB CTE chain ending in `m(q_id, pred_label, votes)`: the brute
    * top-5 kNN majority vote for the vec_id < 20 query frame — shared
    * by q_knn_classify and q_mcnemar.
    */
  private def knnPredCtes: String = {
    def dot(a: String, b: String) = OracleVec.dot(a, b)
    s"""q AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
       |  WHERE vec_id < 20
       |), p AS (
       |  SELECT q_id, c.vec_id AS c_id,
       |    ${dot("q_emb", "c.embedding")}
       |    / (sqrt(${dot("q_emb", "q_emb")})
       |       * sqrt(${dot("c.embedding", "c.embedding")})) AS cosine
       |  FROM q, embeddings c WHERE q_id <> c.vec_id
       |), nb AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |      ORDER BY cosine DESC, c_id) AS rank FROM p) WHERE rank <= 5
       |), v AS (
       |  SELECT q_id, e.label, count(*) AS votes
       |  FROM nb JOIN embeddings e ON nb.c_id = e.vec_id
       |  GROUP BY q_id, e.label
       |), m AS (
       |  SELECT q_id, label AS pred_label, votes FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |      ORDER BY votes DESC, label) AS rn FROM v) WHERE rn = 1
       |)""".stripMargin
  }

  /** Spark twin of [[knnPredCtes]]: (q_id, true_label, pred_label,
    * votes) for the vec_id < 20 query frame.
    */
  private def knnPred(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val emb = Tables.embeddings(s, d)
    val qv = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("c_id"))
    val nb = emb.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      .crossJoin(broadcast(qv))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine", VecOps.cosine(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("c_id"))
    Classify.knnVote(nb, emb.select(col("vec_id"), col("label")))
      .join(emb.select(col("vec_id").as("q_id"), col("label").as("true_label")), "q_id")
      .select(col("q_id"), col("true_label"), col("pred_label"), col("votes"))
  }

  val all: Seq[QueryDef] = Seq(

    // ---- Embedding-distribution drift between two dataset versions
    //      (vec_id parity stands in for v1/v2): cosine between the two
    //      mean vectors + mean squared-norm per half — the monitoring
    //      readout for an embedding pipeline (q_dist_drift/q_psi watch
    //      token/value distributions; this watches the VECTOR space a
    //      re-run encoder feeds to dedup/ANN). Exactness: per-dim sums
    //      are 1e6-quantized int64; the mean components are floor-
    //      quantized integers BEFORE the dot products, so the dots are
    //      exact int64 (≤ 128·1e12) and never an order-dependent double
    //      sum; per-row squared norms fold row-locally at 1e3 (int64-
    //      safe at any corpus size). Scale shape: one posexplode +
    //      bounded (2·d)-key agg, d-row self-join, single-row outputs ----
    QueryDef.sql(
      "q_embedding_drift",
      """WITH q AS (
        |  SELECT vec_id % 2 AS h, unnest(embedding) AS x,
        |    unnest(range(1, len(embedding) + 1)) AS pos
        |  FROM embeddings
        |), dm AS (
        |  SELECT h, pos,
        |    CAST(floor(CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1e6)
        |      AS BIGINT)) AS DOUBLE) / CAST(count(*) AS DOUBLE))
        |      AS BIGINT) AS m
        |  FROM q GROUP BY h, pos
        |), ip AS (
        |  SELECT CAST(sum(a.m * b.m) AS BIGINT) AS dot_ab,
        |    CAST(sum(a.m * a.m) AS BIGINT) AS dot_aa,
        |    CAST(sum(b.m * b.m) AS BIGINT) AS dot_bb
        |  FROM dm a JOIN dm b ON b.pos = a.pos
        |  WHERE a.h = 0 AND b.h = 1
        |), nr AS (
        |  SELECT h, CAST(count(*) AS BIGINT) AS n_vec,
        |    CAST(sum(sq2) AS BIGINT) // CAST(count(*) AS BIGINT)
        |      AS msn_fp
        |  FROM (
        |    SELECT vec_id % 2 AS h, vec_id,
        |      CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1e3) AS BIGINT)
        |        * CAST(floor(CAST(x AS DOUBLE) * 1e3) AS BIGINT))
        |        AS BIGINT) AS sq2
        |    FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)
        |    GROUP BY 1, 2)
        |  GROUP BY h
        |)
        |SELECT a.n_vec AS n_a, b.n_vec AS n_b,
        |  CASE WHEN dot_aa > 0 AND dot_bb > 0
        |    THEN CAST(floor(CAST(dot_ab AS DOUBLE)
        |      / (sqrt(CAST(dot_aa AS DOUBLE)) * sqrt(CAST(dot_bb AS DOUBLE)))
        |      * 1e6) AS BIGINT) ELSE NULL END AS cos_means_fp,
        |  a.msn_fp AS msn_a_fp, b.msn_fp AS msn_b_fp,
        |  a.msn_fp - b.msn_fp AS msn_diff_fp
        |FROM ip, nr a, nr b WHERE a.h = 0 AND b.h = 1""".stripMargin
    ) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      // ONE posexplode scan: per-dim integer sums for both halves as
      // conditional aggregates (Spark replans multiply-referenced
      // frames, so a per-half filter + self-join would re-run the
      // explode+agg; the pivot keeps it a single pass and drops the
      // pos self-join entirely)
      val ip = emb
        .select((col("vec_id") % 2).as("h"),
          posexplode(col("embedding")).as(Seq("pos0", "x")))
        .select(col("h"), (col("pos0") + 1).as("pos"),
          expr("CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)").as("qx"))
        .groupBy(col("pos"))
        .agg(
          sum(when(col("h") === 0, col("qx")).otherwise(0L)).as("sqa"),
          sum(when(col("h") === 0, 1L).otherwise(0L)).as("na"),
          sum(when(col("h") === 1, col("qx")).otherwise(0L)).as("sqb"),
          sum(when(col("h") === 1, 1L).otherwise(0L)).as("nb"))
        .selectExpr(
          "CAST(floor(CAST(sqa AS DOUBLE) / CAST(na AS DOUBLE)) AS BIGINT)"
            + " AS ma",
          "CAST(floor(CAST(sqb AS DOUBLE) / CAST(nb AS DOUBLE)) AS BIGINT)"
            + " AS mb")
        .agg(sum(expr("ma * mb")).as("dot_ab"),
          sum(expr("ma * ma")).as("dot_aa"),
          sum(expr("mb * mb")).as("dot_bb"))
      // ONE row-local fold scan for both halves' norm moments
      val nr = emb
        .select((col("vec_id") % 2).as("h"),
          expr("""aggregate(embedding, 0L, (acc, x) -> acc
            |  + CAST(floor(CAST(x AS DOUBLE) * 1e3) AS BIGINT)
            |  * CAST(floor(CAST(x AS DOUBLE) * 1e3) AS BIGINT))"""
            .stripMargin).as("sq2"))
        .agg(
          sum(when(col("h") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("h") === 1, 1L).otherwise(0L)).as("n_b"),
          sum(when(col("h") === 0, col("sq2")).otherwise(0L)).as("s2a"),
          sum(when(col("h") === 1, col("sq2")).otherwise(0L)).as("s2b"))
        .selectExpr("n_a", "n_b",
          "CAST(s2a AS BIGINT) div n_a AS msn_a_fp",
          "CAST(s2b AS BIGINT) div n_b AS msn_b_fp")
      ip.crossJoin(broadcast(nr))
        .selectExpr("n_a", "n_b",
          """CASE WHEN dot_aa > 0 AND dot_bb > 0
            |  THEN CAST(floor(CAST(dot_ab AS DOUBLE)
            |    / (sqrt(CAST(dot_aa AS DOUBLE)) * sqrt(CAST(dot_bb AS DOUBLE)))
            |    * 1e6) AS BIGINT) ELSE NULL END""".stripMargin
            + " AS cos_means_fp",
          "msn_a_fp", "msn_b_fp", "msn_a_fp - msn_b_fp AS msn_diff_fp")
    }.intendsNestedLoop(
      "broadcast side is the single-row per-half norm frame"),

    // ---- Nearest-centroid classification (linear-probe sanity check of
    //      the embedding space): centroids from ONE posexplode agg
    //      (labels x dim groups), assignment via the broadcast argmax —
    //      the corpus is never shuffled and never windowed. ----
    QueryDef.sql(
      "q_centroid_classify",
      s"""WITH $centroidPredCtes
         |SELECT vec_id, true_label, pred_label FROM pred""".stripMargin
    ) { (s, d) =>
      Classify.nearestCentroid(
        Tables.embeddings(s, d).select(col("vec_id"), col("embedding"), col("label")))
    },
    // (r10: no plan intent — centroid assignment is the row-local
    // AnnAssign loop over the collected codebook; the crossJoin is gone)

    // ---- Confusion-matrix eval of the same prediction chain:
    //      (true_label, pred_label, n) — integer-exact. ----
    QueryDef.sql(
      "q_eval_confusion",
      s"""WITH $centroidPredCtes
         |SELECT true_label, pred_label, count(*) AS n
         |FROM pred GROUP BY true_label, pred_label""".stripMargin
    ) { (s, d) =>
      Classify.nearestCentroid(
        Tables.embeddings(s, d).select(col("vec_id"), col("embedding"), col("label")))
        .groupBy(col("true_label"), col("pred_label"))
        .agg(count(lit(1)).as("n"))
    },
    // (r10: no plan intent — centroid assignment is the row-local
    // AnnAssign loop over the collected codebook; the crossJoin is gone)

    // ---- kNN majority-vote classification: brute exact top-5 neighbour
    //      frame (the ANN variants produce the same (q_id, c_id) shape)
    //      -> per-query vote with a partial-aggregable argmax. ----
    QueryDef.sql(
      "q_knn_classify",
      s"""WITH $knnPredCtes
         |SELECT m.q_id, e.label AS true_label, m.pred_label, m.votes
         |FROM m JOIN embeddings e ON m.q_id = e.vec_id""".stripMargin
    ) { (s, d) =>
      knnPred(s, d)
    }.intendsNestedLoop(
      "broadcast side is the 20-row query frame (brute kNN baseline)"),

    // ---- McNemar's paired test: do the centroid and kNN classifiers
    //      err DIFFERENTLY on the same examples? The paired-sample
    //      significance test the confusion matrices can't answer
    //      (accuracy deltas ignore pairing). Discordant cells b/c from
    //      one join of the two shared prediction chains; continuity-
    //      corrected chi2 = (|b−c|−1)²·S div (b+c), exact integers ----
    QueryDef.sql(
      "q_mcnemar",
      s"""WITH $centroidPredCtes, $knnPredCtes, paired AS (
         |  SELECT p.vec_id,
         |    CASE WHEN p.pred_label = p.true_label THEN 1 ELSE 0 END AS a_ok,
         |    CASE WHEN m.pred_label = p.true_label THEN 1 ELSE 0 END AS b_ok
         |  FROM pred p JOIN m ON m.q_id = p.vec_id
         |), cells AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN a_ok = b_ok THEN 1 ELSE 0 END) AS BIGINT) AS agree,
         |    CAST(sum(CASE WHEN a_ok = 1 AND b_ok = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
         |    CAST(sum(CASE WHEN a_ok = 0 AND b_ok = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c
         |  FROM paired
         |)
         |SELECT n, agree, b, c,
         |  CASE WHEN b + c > 0
         |    THEN (greatest(abs(b - c) - 1, 0) * greatest(abs(b - c) - 1, 0)
         |          * 1000000) // (b + c)
         |    ELSE CAST(0 AS BIGINT) END AS chi2_fp
         |FROM cells""".stripMargin
    ) { (s, d) =>
      val cent = Classify.nearestCentroid(
        Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"), col("label")))
        .select(col("vec_id"), col("true_label"),
          col("pred_label").as("a_pred"))
      val knn = knnPred(s, d)
        .select(col("q_id").as("vec_id"), col("pred_label").as("b_pred"))
      val paired = cent.join(knn, "vec_id")
        .select(
          when(col("a_pred") === col("true_label"), 1L).otherwise(0L).as("a_ok"),
          when(col("b_pred") === col("true_label"), 1L).otherwise(0L).as("b_ok"))
      paired.agg(count(lit(1)).as("n"),
          sum(when(col("a_ok") === col("b_ok"), 1L).otherwise(0L)).as("agree"),
          sum(when(col("a_ok") === 1L && col("b_ok") === 0L, 1L)
            .otherwise(0L)).as("b"),
          sum(when(col("a_ok") === 0L && col("b_ok") === 1L, 1L)
            .otherwise(0L)).as("c"))
        .select(col("n"), col("agree"), col("b"), col("c"),
          when(col("b") + col("c") > 0,
            expr("(greatest(abs(b - c) - 1, 0L) * greatest(abs(b - c) - 1, 0L)" +
              " * 1000000L) div (b + c)"))
            .otherwise(0L).as("chi2_fp"))
    }.intendsNestedLoop(
      "broadcast sides are the #labels-row centroid codebook and the " +
        "20-row query frame"),

    // ---- kNN classification over the IVF-PQ index — the shape a 100 TB
    //      label-propagation job actually runs: neighbours come from the
    //      compressed coarse-pruned index (nprobe cells, 16-byte codes,
    //      exact re-rank), not a brute scan, then the same
    //      partial-aggregable majority vote. The oracle replays the
    //      whole two-chain IVF-PQ search (shared CTEs with q_knn_ivfpq)
    //      plus the vote, so the gate is hash-exact end-to-end;
    //      MlAnnAgreementSpec pins the quality side (agreement with the
    //      brute-kNN vote on a clustered corpus). ----
    QueryDef.sql(
      "q_knn_classify_ann",
      s"""WITH ${OraclePq.ivfpqSearchCtes("vec_id < 20", nprobe = 4, shortlist = 32)},
         |nb AS (
         |  SELECT q_id, c_id FROM ranked WHERE rank <= 5
         |), v AS (
         |  SELECT q_id, e.label, count(*) AS votes
         |  FROM nb JOIN embeddings e ON nb.c_id = e.vec_id
         |  GROUP BY q_id, e.label
         |), m AS (
         |  SELECT q_id, label AS pred_label, votes FROM (
         |    SELECT *, row_number() OVER (PARTITION BY q_id
         |      ORDER BY votes DESC, label) AS rn FROM v) WHERE rn = 1
         |)
         |SELECT m.q_id, e.label AS true_label, m.pred_label, m.votes
         |FROM m JOIN embeddings e ON m.q_id = e.vec_id""".stripMargin
    ) { (s, d) =>
      import graft.ops.{IvfPq, Pq}
      val emb = Tables.embeddings(s, d)
      val raw = emb.select(col("vec_id"), col("embedding"))
      val norm = raw.select(col("vec_id"),
        Pq.normalized(col("embedding")).as("embedding"))
      val idx = IvfPq.build(raw, norm)
      val nb = IvfPq.search(idx, raw, Pq.M, col("vec_id") < 20,
        nprobe = 4, topK = 5, shortlist = 32)
        .select(col("q_id"), col("c_id"))
      Classify.knnVote(nb, emb.select(col("vec_id"), col("label")))
        .join(emb.select(col("vec_id").as("q_id"), col("label").as("true_label")), "q_id")
        .select(col("q_id"), col("true_label"), col("pred_label"), col("votes"))
    }.intendsNestedLoop(
      "broadcast sides are the sqrt(n) coarse codebook and the " +
        "(queries x m x k) ADC table"),

    // ---- Multinomial Naive Bayes text classifier (the fastText-style
    //      "quality/domain classifier" every curation pipeline trains):
    //      train on even doc_ids (label = lang), Laplace-smoothed token
    //      log-likelihoods, predict the odd half. Every ln() is quantized
    //      to floor(x*1e6) BEFORE summation (the Num/LmQueries scheme) so
    //      doc scores are exact integer sums; argmax via a
    //      partial-aggregable min(struct(-score, class)) — never a
    //      per-doc window on the Spark side.
    //      Scale shape (100 TB audit): the dense model is vocab x
    //      #classes rows — vocabulary-bounded, independent of corpus
    //      size; class/prior/vocab-size frames are broadcast scalars;
    //      scoring is one shuffled hash join on token followed by a
    //      partial-aggregable integer sum. Docs whose tokens are all
    //      out-of-vocabulary drop out identically on both engines. ----
    QueryDef.sql(
      "q_nb_classify",
      """WITH tok AS (
        |  SELECT doc_id, lang, token FROM (
        |    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
        |    FROM documents)
        |  WHERE token <> ''
        |), tr AS (
        |  SELECT * FROM tok WHERE doc_id % 2 = 0
        |), cls AS (
        |  SELECT lang AS class, count(DISTINCT doc_id) AS n_docs
        |  FROM tr GROUP BY lang
        |), ntr AS (
        |  SELECT count(DISTINCT doc_id) AS n FROM tr
        |), tc AS (
        |  SELECT lang AS class, token, count(*) AS cnt FROM tr GROUP BY 1, 2
        |), ctot AS (
        |  SELECT class, CAST(sum(cnt) AS BIGINT) AS tok_c FROM tc GROUP BY class
        |), vocab AS (
        |  SELECT DISTINCT token FROM tr
        |), vsz AS (
        |  SELECT count(*) AS v FROM vocab
        |), model AS (
        |  SELECT c.class, vb.token,
        |    CAST(floor(ln((COALESCE(tc.cnt, 0) + 1e0) / (ct.tok_c + vs.v))
        |         * 1e6) AS BIGINT) AS llfp
        |  FROM vocab vb
        |  CROSS JOIN cls c
        |  JOIN ctot ct ON ct.class = c.class
        |  CROSS JOIN vsz vs
        |  LEFT JOIN tc ON tc.class = c.class AND tc.token = vb.token
        |), prior AS (
        |  SELECT cls.class,
        |    CAST(floor(ln(cls.n_docs * 1e0 / ntr.n) * 1e6) AS BIGINT)
        |      AS prior_fp
        |  FROM cls CROSS JOIN ntr
        |), te AS (
        |  SELECT doc_id, lang AS true_label, token, count(*) AS m
        |  FROM tok WHERE doc_id % 2 = 1 GROUP BY 1, 2, 3
        |), sc AS (
        |  SELECT te.doc_id, te.true_label, model.class,
        |    prior.prior_fp + CAST(sum(te.m * model.llfp) AS BIGINT)
        |      AS score_fp
        |  FROM te
        |  JOIN model ON te.token = model.token
        |  JOIN prior ON prior.class = model.class
        |  GROUP BY te.doc_id, te.true_label, model.class, prior.prior_fp
        |)
        |SELECT doc_id, true_label, class AS pred_label, score_fp FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score_fp DESC, class) AS rn FROM sc) WHERE rn = 1""".stripMargin
    ) { (s, d) =>
      graft.ops.NaiveBayes.classify(
        Tables.documents(s, d).select(col("doc_id"), col("lang"), col("text")),
        "doc_id", "lang", "text",
        trainPred = col("doc_id") % 2 === 0,
        testPred = col("doc_id") % 2 === 1)
    }.intendsNestedLoop(
      "cross joins are against broadcast class-list / 1-row scalar frames " +
        "(#classes and vocab-size), never corpus-sized"),

    // ---- Grid DBSCAN (see ops.GridDbscan): density clustering of the
    //      embeddings in a deterministic 2-d JL projection (plane family
    //      offsets 96/97, disjoint from the LSH and projection tiers).
    //      Density = one groupBy over eps-grid cells; clusters =
    //      connected components of the adjacent-core-cell graph; no
    //      point-pair distance anywhere ----
    QueryDef.sql(
      "q_dbscan_grid", {
        def fold(j: Int): String =
          s"""list_reduce(list_prepend(0e0, list_transform(range(1, len(e.embedding) + 1),
             |      i -> CAST(e.embedding[i] AS DOUBLE)
             |        * ((((i * (1000003 + $j * 7919)) + ($j * 271 + 17)) % 1000) * 1e-3 - 5e-1))),
             |      (acc, x) -> acc + x)""".stripMargin
        s"""WITH RECURSIVE graft_pts AS (
           |  SELECT e.vec_id AS id, ${fold(96)} AS px, ${fold(97)} AS py
           |  FROM embeddings e
           |),
           |${graft.ops.GridDbscan.oracleSql(eps = "25e-2", minPts = 10)}""".stripMargin
      }
    ) { (s, d) =>
      import graft.functions.VecOps.planeDot
      val pts = Tables.embeddings(s, d).select(
        col("vec_id").as("id"),
        planeDot(col("embedding"), 1000003 + 96 * 7919, 96 * 271 + 17).as("px"),
        planeDot(col("embedding"), 1000003 + 97 * 7919, 97 * 271 + 17).as("py"))
      graft.ops.GridDbscan.cluster(pts, eps = 0.25, minPts = 10)
    }.intendsNestedLoop(
      "cross joins are against the broadcast 9-row neighbor-offset frame"),

    // ---- Decision stump by exact Gini split (the depth-1 CART /
    //      boosting base learner): best threshold on a 1-d JL
    //      projection of the embeddings (plane offset 98 — disjoint
    //      from the LSH/DBSCAN tiers) separating class 0 from the
    //      rest. Exactness: the feature IS the quantized integer
    //      floor(px*1e2), candidate splits are its distinct values,
    //      and the weighted-Gini cost is pure integer algebra —
    //      cost_fp(t) = sum over sides of ((n^2 - p^2 - q^2)*1e6) div n
    //      (= n*gini*1e6) from prefix-summed per-bucket class counts;
    //      argmin via TakeOrdered (ties -> smaller threshold).
    //      Scale shape: ONE corpus pass onto value-range-bounded score
    //      buckets; the prefix window and the argmin run over that
    //      bucket frame only. Headroom: n^2*1e6 < 2^63 bounds the
    //      labelled set at ~3e6 rows — drop the 1e6 scale above that. ----
    QueryDef.sql(
      "q_stump", {
        def fold(j: Int): String =
          s"""list_reduce(list_prepend(0e0, list_transform(range(1, len(e.embedding) + 1),
             |      i -> CAST(e.embedding[i] AS DOUBLE)
             |        * ((((i * (1000003 + $j * 7919)) + ($j * 271 + 17)) % 1000) * 1e-3 - 5e-1))),
             |      (acc, x) -> acc + x)""".stripMargin
        s"""WITH sc AS (
           |  SELECT CAST(floor(${fold(98)} * 1e2) AS BIGINT) AS s,
           |    CASE WHEN e.label = 0 THEN 1 ELSE 0 END AS y
           |  FROM embeddings e
           |), bkt AS (
           |  SELECT s, CAST(sum(y) AS BIGINT) AS p,
           |    CAST(count(*) - sum(y) AS BIGINT) AS q
           |  FROM sc GROUP BY s
           |), tot AS (
           |  SELECT CAST(sum(p) AS BIGINT) AS tp, CAST(sum(q) AS BIGINT) AS tq
           |  FROM bkt
           |), cum AS (
           |  SELECT s,
           |    CAST(sum(p) OVER (ORDER BY s
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |      AS cp,
           |    CAST(sum(q) OVER (ORDER BY s
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |      AS cq
           |  FROM bkt
           |), cand AS (
           |  SELECT s AS split_at, cp + cq AS nl, (tp - cp) + (tq - cq) AS nr,
           |    (((cp + cq) * (cp + cq) - cp * cp - cq * cq) * 1000000)
           |      // (cp + cq)
           |    + ((((tp - cp) + (tq - cq)) * ((tp - cp) + (tq - cq))
           |        - (tp - cp) * (tp - cp) - (tq - cq) * (tq - cq)) * 1000000)
           |      // ((tp - cp) + (tq - cq)) AS cost_fp
           |  FROM cum CROSS JOIN tot
           |  WHERE (tp - cp) + (tq - cq) > 0
           |)
           |SELECT split_at, cost_fp, nl, nr FROM cand
           |ORDER BY cost_fp, split_at LIMIT 1""".stripMargin
      }
    ) { (s, d) =>
      import graft.functions.VecOps.planeDot
      import org.apache.spark.sql.expressions.Window
      val sc = Tables.embeddings(s, d).select(
        floor(planeDot(col("embedding"), 1000003 + 98 * 7919, 98 * 271 + 17)
          * 1e2).cast("long").as("s"),
        when(col("label") === 0, 1L).otherwise(0L).as("y"))
      val bkt = sc.groupBy(col("s"))
        .agg(sum(col("y")).as("p"), (count(lit(1)) - sum(col("y"))).as("q"))
      val tot = bkt.agg(sum(col("p")).as("tp"), sum(col("q")).as("tq"))
      val w = Window.orderBy(col("s"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bkt
        .withColumn("cp", sum(col("p")).over(w))
        .withColumn("cq", sum(col("q")).over(w))
        .crossJoin(broadcast(tot))
        .filter((col("tp") - col("cp")) + (col("tq") - col("cq")) > 0)
        .select(col("s").as("split_at"),
          (expr("(((cp + cq) * (cp + cq) - cp * cp - cq * cq) * 1000000L) " +
            "div (cp + cq)") +
            expr("((((tp - cp) + (tq - cq)) * ((tp - cp) + (tq - cq)) " +
              "- (tp - cp) * (tp - cp) - (tq - cq) * (tq - cq)) * 1000000L) " +
              "div ((tp - cp) + (tq - cq))")).as("cost_fp"),
          (col("cp") + col("cq")).as("nl"),
          ((col("tp") - col("cp")) + (col("tq") - col("cq"))).as("nr"))
        .orderBy(col("cost_fp"), col("split_at")).limit(1)
    }.intendsNestedLoop(
      "broadcast side is the 1-row class-totals frame")
      .intendsGlobalWindow(
        "windowed frame is the per-bucket aggregate of the quantized " +
          "projection: value-range bounded (hundreds of rows), never " +
          "corpus-sized"),

    // ---- Gradient-boosted stumps (see ops.Boost): 3 squared-loss
    //      boosting rounds over the SAME quantized projection feature
    //      as q_stump (its boosting-loop completion). The whole loop
    //      runs on the value-range-bounded bucket frame — the corpus
    //      is scanned ONCE to build (s, n, sum_residual); every round
    //      is prefix-sum + broadcast-totals + TakeOrdered argmax over
    //      that frame. Exact int64 algebra end-to-end (1e3-fp target,
    //      truncating leaf means, shrinkage 1/2); the oracle unrolls
    //      the identical recurrence. ----
    QueryDef.sql(
      "q_boost", {
        def fold(j: Int): String =
          s"""list_reduce(list_prepend(0e0, list_transform(range(1, len(e.embedding) + 1),
             |      i -> CAST(e.embedding[i] AS DOUBLE)
             |        * ((((i * (1000003 + $j * 7919)) + ($j * 271 + 17)) % 1000) * 1e-3 - 5e-1))),
             |      (acc, x) -> acc + x)""".stripMargin
        graft.ops.Boost.oracleSql(
          s"""  SELECT s, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(y_fp) AS BIGINT) AS sr
             |  FROM (
             |    SELECT CAST(floor(${fold(98)} * 1e2) AS BIGINT) AS s,
             |      CASE WHEN e.label = 0 THEN 1000 ELSE 0 END AS y_fp
             |    FROM embeddings e)
             |  GROUP BY s""".stripMargin,
          rounds = 3)
      }
    ) { (s, d) =>
      import graft.functions.VecOps.planeDot
      val sc = Tables.embeddings(s, d).select(
        floor(planeDot(col("embedding"), 1000003 + 98 * 7919, 98 * 271 + 17)
          * 1e2).cast("long").as("s"),
        when(col("label") === 0, 1000L).otherwise(0L).as("y_fp"))
      graft.ops.Boost.train(sc, rounds = 3)
      // no plan intents: the per-round global window and broadcast-1-row
      // cross joins execute inside construction-time materialized rounds
      // (Boost.train collects each argmax); the RETURNED model plan is a
      // union of local-relation selects — declaring the intent would
      // trip the staleness gate (the q_pca_power precedent)
    },

    // ---- Mahalanobis outliers per supplier over (quantity, price):
    //      the MULTIVARIATE companion to q_outliers_mad — a row can be
    //      normal in each margin yet far off the group's quantity-price
    //      correlation ridge. Centered second moments Dxx/Dyy/Dxy are
    //      exact int64 (headroom: n^2 * y_max^2 < 2^63 -> groups up to
    //      ~29k rows at 1e5-range magnitudes; rescale y or sub-bucket
    //      the key beyond); the quadratic form
    //      d^2 = (Dyy*ndx^2 - 2*Dxy*ndx*ndy + Dxx*ndy^2) / det runs in
    //      doubles with the IDENTICAL textual op order on both engines
    //      (+,-,*,/ are IEEE-exact per op, so identical int64 inputs
    //      give bit-identical results — no ln/sqrt anywhere), then
    //      quantizes to 1e3 fp. Threshold: the marginals here are
    //      BOUNDED uniforms, which cap d^2 near 6 (max dx^2/var = 3
    //      per axis), so the textbook chi2(2, 0.999) = 13.8 cut flags
    //      nothing by construction; the query uses 5.5 (chi2 CDF
    //      1 - e^(-d2/2) = 0.936) to exercise the tail — production
    //      callers pass their own cut for heavy-tailed data. Scale shape: one moment groupBy + one
    //      co-partitioned join back on the group key — linear,
    //      partial-aggregable, no window ----
    QueryDef.sql(
      "q_mahalanobis",
      """WITH r AS (
        |  SELECT l_suppkey, l_orderkey, l_linenumber,
        |    CAST(l_quantity AS BIGINT) AS x,
        |    CAST(floor(l_extendedprice) AS BIGINT) AS y
        |  FROM lineitem
        |), m AS (
        |  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM r GROUP BY l_suppkey
        |), c AS (
        |  SELECT l_suppkey, n, sx, sy,
        |    n * sxx - sx * sx AS dxx,
        |    n * syy - sy * sy AS dyy,
        |    n * sxy - sx * sy AS dxy
        |  FROM m WHERE n >= 30
        |), s AS (
        |  SELECT r.l_suppkey, r.l_orderkey, r.l_linenumber,
        |    CAST(floor(
        |      (CAST(c.dyy AS DOUBLE) * (c.n * r.x - c.sx) * (c.n * r.x - c.sx)
        |       - 2e0 * CAST(c.dxy AS DOUBLE)
        |         * (c.n * r.x - c.sx) * (c.n * r.y - c.sy)
        |       + CAST(c.dxx AS DOUBLE) * (c.n * r.y - c.sy) * (c.n * r.y - c.sy))
        |      / (CAST(c.dxx AS DOUBLE) * CAST(c.dyy AS DOUBLE)
        |         - CAST(c.dxy AS DOUBLE) * CAST(c.dxy AS DOUBLE))
        |      * 1e3) AS BIGINT) AS d2_fp
        |  FROM r JOIN c USING (l_suppkey)
        |  WHERE CAST(c.dxx AS DOUBLE) * CAST(c.dyy AS DOUBLE)
        |        - CAST(c.dxy AS DOUBLE) * CAST(c.dxy AS DOUBLE) > 0e0
        |)
        |SELECT l_suppkey, l_orderkey, l_linenumber, d2_fp
        |FROM s WHERE d2_fp > 5500""".stripMargin
    ) { (s, d) =>
      val r = Tables.lineitem(s, d).select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("x"),
        floor(col("l_extendedprice")).cast("long").as("y"))
      val m = r.groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .filter(col("n") >= 30)
        .select(col("l_suppkey").as("sk"), col("n"), col("sx"), col("sy"),
          (col("n") * col("sxx") - col("sx") * col("sx")).as("dxx"),
          (col("n") * col("syy") - col("sy") * col("sy")).as("dyy"),
          (col("n") * col("sxy") - col("sx") * col("sy")).as("dxy"))
      r.join(m, col("l_suppkey") === col("sk"))
        .withColumn("det",
          expr("CAST(dxx AS DOUBLE) * CAST(dyy AS DOUBLE) " +
            "- CAST(dxy AS DOUBLE) * CAST(dxy AS DOUBLE)"))
        .filter(col("det") > 0d)
        .withColumn("d2_fp",
          expr("""CAST(floor(
                 |  (CAST(dyy AS DOUBLE) * (n * x - sx) * (n * x - sx)
                 |   - 2e0 * CAST(dxy AS DOUBLE) * (n * x - sx) * (n * y - sy)
                 |   + CAST(dxx AS DOUBLE) * (n * y - sy) * (n * y - sy))
                 |  / det * 1e3) AS BIGINT)""".stripMargin))
        .filter(col("d2_fp") > 5500)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "d2_fp")
    },

    // ---- closed-form ridge regression (2 features + intercept) ----
    //
    // Multivariate linear model fit in ONE distributed pass: the 3x3
    // normal-equation system (X'X + lambda*I_noint) b = X'y is assembled
    // from nine exact fixed-point moments (one hash aggregation over one
    // lineitem scan — the map-side-combining shape that survives any row
    // count), then solved on the 1-row moment frame by Cramer's rule.
    // lambda = 1e0 penalizes the two slope coefficients, not the
    // intercept (standard ridge convention).
    //
    // Cross-engine exactness: BOTH engines execute the SAME SQL text, so
    // the moment doubles are identical (fixed-point sums) and every
    // subsequent +,-,*,/ is a correctly-rounded IEEE op applied in an
    // identical expression tree. Features are pre-scaled (qs = qty/1e1,
    // y = price/1e4) so each quantized term stays <= ~2.5e7/row; the
    // [[Num]] 2^53 caller contract then holds through ~4e8 rows (sf10+).
    QueryDef.sql("q_ridge", MlQueries.ridgeSql("lineitem")) { (s, d) =>
      Tables.lineitem(s, d).createOrReplaceTempView("graft_ridge_li_v")
      s.sql(MlQueries.ridgeSql("graft_ridge_li_v"))
    },

    // ---- ECOD outlier scores over the embedding corpus (Li et al.
    //      2022, "ECOD: unsupervised outlier detection using empirical
    //      cumulative distribution functions" — the parameter-free
    //      baseline modern curation pipelines reach for before anything
    //      learned): per dimension, the left/right empirical tail
    //      probability of each value; score = sum over dims of
    //      -ln(tail), aggregated both ways, final score the larger of
    //      the two (the paper adds a skewness-picked "auto" variant;
    //      the max of the two one-sided sums is its bound and keeps the
    //      arithmetic exact). Tails are RANGE-frame counts so ties share
    //      their ECDF mass — order-independent; -ln quantized to 1e6
    //      (the q_dist_drift/q_lm_score convention).
    //      Scale shape: ONE posexplode pass, ONE exchange on dim (both
    //      tail counts + n ride the same window partitioning), then a
    //      vec_id hash agg. Per-dim window sort is n·log n rows per
    //      reducer with d reducers; at extreme n swap the exact rank
    //      for the q_quantiles_dist bucket-ECDF (same downstream
    //      algebra) — documented, not needed at bench scales. ----
    QueryDef.sql(
      "q_ecod",
      """WITH ex AS (
        |  SELECT vec_id, CAST(x AS DOUBLE) AS v, pos FROM (
        |    SELECT vec_id, unnest(embedding) AS x,
        |      unnest(range(1, len(embedding) + 1)) AS pos
        |    FROM embeddings)
        |), r AS (
        |  SELECT vec_id,
        |    CAST(count(*) OVER (PARTITION BY pos ORDER BY v
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cle,
        |    CAST(count(*) OVER (PARTITION BY pos ORDER BY v DESC
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cge,
        |    CAST(count(*) OVER (PARTITION BY pos) AS BIGINT) AS n
        |  FROM ex
        |), t AS (
        |  SELECT vec_id,
        |    CAST(floor(-ln(cle * 1e0 / n) * 1e6) AS BIGINT) AS tl,
        |    CAST(floor(-ln(cge * 1e0 / n) * 1e6) AS BIGINT) AS tr
        |  FROM r
        |), o AS (
        |  SELECT vec_id, CAST(sum(tl) AS BIGINT) AS o_left_fp,
        |    CAST(sum(tr) AS BIGINT) AS o_right_fp
        |  FROM t GROUP BY vec_id
        |)
        |SELECT vec_id, o_left_fp, o_right_fp,
        |  greatest(o_left_fp, o_right_fp) AS o_fp
        |FROM o""".stripMargin
    ) { (s, d) =>
      val ex = Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(col("vec_id"), col("pos"), col("x").cast("double").as("v"))
      val byDim = Window.partitionBy(col("pos"))
      val asc = byDim.orderBy(col("v"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val desc = byDim.orderBy(col("v").desc)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      ex
        .withColumn("cle", count(lit(1)).over(asc))
        .withColumn("cge", count(lit(1)).over(desc))
        .withColumn("n", count(lit(1)).over(byDim))
        .select(col("vec_id"),
          expr("CAST(floor(-ln(cle * 1e0 / n) * 1e6) AS BIGINT)").as("tl"),
          expr("CAST(floor(-ln(cge * 1e0 / n) * 1e6) AS BIGINT)").as("tr"))
        .groupBy(col("vec_id"))
        .agg(sum(col("tl")).cast("long").as("o_left_fp"),
          sum(col("tr")).cast("long").as("o_right_fp"))
        .select(col("vec_id"), col("o_left_fp"), col("o_right_fp"),
          greatest(col("o_left_fp"), col("o_right_fp")).as("o_fp"))
    },

    // ---- Greedy k-center selection (see ops.KCenter): 6 maximally
    //      diverse corpus points by farthest-point traversal — the
    //      annotation-budget / coreset-seeding pick. Per round ONE
    //      corpus pass against the broadcast 1-row newest pick + a
    //      TakeOrdered(1) argmin; the running max-similarity
    //      telescopes, so earlier picks are never rescanned ----
    QueryDef.sql(
      "q_kcenter",
      s"WITH ${graft.ops.KCenter.oracleSql(k = 6)}"
    ) { (s, d) =>
      graft.ops.KCenter.select(
        Tables.embeddings(s, d).select("vec_id", "embedding"), k = 6)
      // per-round broadcast nested-loops against 1-row pick frames run
      // EAGERLY inside the round checkpoints; the returned plan is a
      // union of materialized 1-row frames, so no intent declaration
    },

    // ---- quadratic-kernel MMD^2 between embedding populations (vec_id
    //      parity = v1/v2): the SECOND-moment drift readout —
    //      q_embedding_drift watches the mean vector; this one catches a
    //      covariance change with equal means (an encoder re-run that
    //      rotates or collapses directions). For k(x,y) = (x·y)^2,
    //      MMD^2 = ||E_A[xx^T] − E_B[xx^T]||_F^2 exactly, so the kernel
    //      statistic needs NO pairwise pass: per-vector outer products
    //      (1e3-quantized int64), one (h, idx)-agg, exact floor-div
    //      means via the pmod identity (DuckDB // truncates where a
    //      plain floor-div would round toward −inf — subtracting the
    //      positive mod first makes the division exact on both engines),
    //      then one d^2-bounded diff. trace_sq_fp = the diagonal
    //      (per-dimension variance) share. Headroom: sums <= n·2.8e5
    //      (n to ~3e13 rows); the final sum <= d^2·(2·2.8e5)^2 ~ 1.3e15.
    //      Scale: ONE posexplode scan (n·d^2 rows — inherent to exact
    //      second moments), partial-aggable, everything after is
    //      d^2-bounded ----
    QueryDef.sql(
      "q_mmd_drift",
      """WITH q AS MATERIALIZED (
        |  SELECT vec_id, vec_id % 2 AS h,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 1e3) AS BIGINT)) AS qv
        |  FROM embeddings
        |), p AS (
        |  SELECT h,
        |    unnest(flatten(list_transform(qv,
        |      xi -> list_transform(qv, xj -> xi * xj)))) AS pv,
        |    unnest(range(0, len(qv) * len(qv))) AS idx,
        |    len(qv) AS dlen
        |  FROM q
        |), nh AS (
        |  SELECT h, CAST(count(*) AS BIGINT) AS nv FROM q GROUP BY h
        |), sums AS (
        |  SELECT h, idx, CAST(max(dlen) AS BIGINT) AS dlen,
        |    CAST(sum(pv) AS BIGINT) AS sp
        |  FROM p GROUP BY h, idx
        |), means AS (
        |  SELECT h, idx, dlen,
        |    (sp - ((sp % nv) + nv) % nv) // nv AS mq
        |  FROM sums JOIN nh USING (h)
        |)
        |SELECT
        |  (SELECT nv FROM nh WHERE h = 0) AS n_a,
        |  (SELECT nv FROM nh WHERE h = 1) AS n_b,
        |  CAST(sum((a.mq - b.mq) * (a.mq - b.mq)) AS BIGINT) AS mmd_fp,
        |  CAST(sum(CASE WHEN a.idx % (a.dlen + 1) = 0
        |    THEN (a.mq - b.mq) * (a.mq - b.mq) ELSE 0 END) AS BIGINT)
        |    AS trace_sq_fp
        |FROM means a JOIN means b ON a.idx = b.idx
        |WHERE a.h = 0 AND b.h = 1""".stripMargin
    ) { (s, d) =>
      val q = Tables.embeddings(s, d).select(
        (col("vec_id") % 2).as("h"),
        expr("transform(embedding, " +
          "x -> CAST(floor(CAST(x AS DOUBLE) * 1e3) AS BIGINT))").as("qv"))
      val p = q.select(col("h"), size(col("qv")).cast("long").as("dlen"),
        posexplode(expr("flatten(transform(qv, " +
          "xi -> transform(qv, xj -> xi * xj)))")).as(Seq("idx", "pv")))
      val nh = q.groupBy("h").agg(count(lit(1)).as("nv"))
      val means = p.groupBy("h", "idx")
        .agg(max(col("dlen")).as("dlen"), sum(col("pv")).as("sp"))
        .join(broadcast(nh), "h")
        .select(col("h"), col("idx").cast("long").as("idx"), col("dlen"),
          expr("(sp - ((sp % nv) + nv) % nv) div nv").as("mq"))
      val a = means.filter(col("h") === 0)
        .select(col("idx"), col("dlen"), col("mq").as("mqa"))
      val b = means.filter(col("h") === 1)
        .select(col("idx"), col("mq").as("mqb"))
      val ns = q.agg(
        sum(when(col("h") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("h") === 1, 1L).otherwise(0L)).as("n_b"))
      a.join(b, "idx")
        .agg(
          sum((col("mqa") - col("mqb")) * (col("mqa") - col("mqb")))
            .as("mmd_fp"),
          sum(when(col("idx") % (col("dlen") + 1) === 0,
            (col("mqa") - col("mqb")) * (col("mqa") - col("mqb")))
            .otherwise(0L)).as("trace_sq_fp"))
        .crossJoin(broadcast(ns))
        .select(col("n_a"), col("n_b"), col("mmd_fp"), col("trace_sq_fp"))
    }.intendsNestedLoop(
      "broadcast sides are the 2-row per-half count frame and the 1-row " +
        "(n_a, n_b) scalar frame")
  )

  /** Shared Spark/DuckDB SQL for q_ridge (see the QueryDef comment). */
  def ridgeSql(lineitem: String): String =
    s"""WITH feat AS (
       |  SELECT l_quantity / 1e1 AS qs, l_discount AS dc,
       |    l_extendedprice / 1e4 AS y
       |  FROM $lineitem
       |), m AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n,
       |    ${Num.dsumSql("qs")} AS s1, ${Num.dsumSql("dc")} AS s2,
       |    ${Num.dsumSql("qs * qs")} AS s11,
       |    ${Num.dsumSql("qs * dc")} AS s12,
       |    ${Num.dsumSql("dc * dc")} AS s22,
       |    ${Num.dsumSql("y")} AS sy,
       |    ${Num.dsumSql("qs * y")} AS s1y,
       |    ${Num.dsumSql("dc * y")} AS s2y
       |  FROM feat
       |), r AS (
       |  SELECT n, s1, s2, s11 + 1e0 AS a11, s12, s22 + 1e0 AS a22,
       |    sy, s1y, s2y
       |  FROM m
       |), dd AS (
       |  SELECT n, s1, s2, a11, s12, a22, sy, s1y, s2y,
       |    n * (a11 * a22 - s12 * s12) - s1 * (s1 * a22 - s12 * s2)
       |      + s2 * (s1 * s12 - a11 * s2) AS det
       |  FROM r
       |)
       |SELECT
       |  (sy * (a11 * a22 - s12 * s12) - s1 * (s1y * a22 - s12 * s2y)
       |    + s2 * (s1y * s12 - a11 * s2y)) / det AS beta0_scaled,
       |  (n * (s1y * a22 - s12 * s2y) - sy * (s1 * a22 - s12 * s2)
       |    + s2 * (s1 * s2y - s1y * s2)) / det AS beta_qty_scaled,
       |  (n * (a11 * s2y - s12 * s1y) - s1 * (s1 * s2y - s1y * s2)
       |    + sy * (s1 * s12 - a11 * s2)) / det AS beta_disc_scaled
       |FROM dd""".stripMargin
}
