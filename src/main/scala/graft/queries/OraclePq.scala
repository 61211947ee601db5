package graft.queries

/** Shared DuckDB oracle snippets for the product-quantization ANN of
  * [[graft.ops.Pq]] — the per-subspace k-means unroll, PQ encoding, and
  * ADC scoring, all bit-identical to the Spark side under the IvfIndex
  * determinism contract (md5-ordered seeds, min-L2 assignment with
  * (d2 ASC, cent_id) tie-break, fixed-point exact centroid means,
  * left-fold dot products in subspace order).
  */
private[queries] object OraclePq {

  import graft.ops.Pq.M

  private def dot(a: String, b: String) = OracleVec.dot(a, b)

  /** ((a.a - 2*a.b) + b.b) — same association as Pq.d2. */
  private def d2(a: String, b: String) =
    s"(${dot(a, a)} - 2e0 * ${dot(a, b)} + ${dot(b, b)})"

  /** Min-L2 nearest-codeword assignment of every (vec_id, sub_id) in
    * `src` against codebook `cb`.
    */
  private def assignCte(name: String, cb: String, src: String = "sq"): String =
    s"""$name AS (
       |  SELECT vec_id, sub_id, sub_emb, cent_id FROM (
       |    SELECT q.vec_id, q.sub_id, q.sub_emb, c.cent_id,
       |      row_number() OVER (PARTITION BY q.vec_id, q.sub_id
       |        ORDER BY ${d2("q.sub_emb", "c.cent_emb")} ASC, c.cent_id) AS rk
       |    FROM $src q JOIN $cb c ON c.sub_id = q.sub_id) WHERE rk = 1
       |)""".stripMargin

  /** Per-(sub, cent, pos) fixed-point exact mean, list re-assembled in
    * position order — twin of the Spark update in Pq.codebooks.
    */
  private def updateCte(name: String, a: String): String =
    s"""$name AS (
       |  SELECT sub_id, cent_id, list(val ORDER BY pos) AS cent_emb FROM (
       |    SELECT sub_id, cent_id, pos,
       |      CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
       |        / CAST(count(*) AS DOUBLE) AS val
       |    FROM (
       |      SELECT sub_id, cent_id, unnest(sub_emb) AS x,
       |        unnest(range(1, len(sub_emb) + 1)) AS pos
       |      FROM $a)
       |    GROUP BY sub_id, cent_id, pos)
       |  GROUP BY sub_id, cent_id
       |)""".stripMargin

  /** Shared base: k choice (pkq), normalization (ne), query/corpus
    * sub-vectors (sq), md5-ordered seed ranks (pseeds).
    */
  def baseCtes: String =
    s"""pkq AS (
       |  SELECT least(256, greatest(4, CAST(ceil(sqrt(count(*))) AS INT))) AS k
       |  FROM embeddings
       |), ne AS (
       |  SELECT vec_id,
       |    list_transform(embedding,
       |      x -> CAST(x AS DOUBLE) / sqrt(${dot("embedding", "embedding")})) AS nemb
       |  FROM embeddings
       |), sq AS (
       |  SELECT e.vec_id, CAST(t.s AS INT) AS sub_id,
       |    e.nemb[CAST(t.s * (len(e.nemb)//$M) + 1 AS INT)
       |           : CAST((t.s+1) * (len(e.nemb)//$M) AS INT)] AS sub_emb
       |  FROM ne e, range(0, $M) t(s)
       |), pseeds AS (
       |  SELECT vec_id,
       |    row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
       |      AS cent_id
       |  FROM embeddings
       |)""".stripMargin

  /** The full chain: [[baseCtes]], 2 Lloyd iterations (pcb0..pcb2),
    * final assignment (pa3) and `codes`.
    */
  def codesCtes: String =
    s"""$baseCtes, pcb0 AS (
       |  SELECT s.sub_id, sd.cent_id, s.sub_emb AS cent_emb
       |  FROM pseeds sd JOIN sq s USING (vec_id), pkq WHERE sd.cent_id < pkq.k
       |), ${assignCte("pa1", "pcb0")}, ${updateCte("pcb1", "pa1")},
       |${assignCte("pa2", "pcb1")}, ${updateCte("pcb2", "pa2")},
       |${assignCte("pa3", "pcb2")},
       |codes AS (SELECT vec_id, sub_id, cent_id AS code FROM pa3)""".stripMargin

  /** RESIDUAL PQ chain over the coarse cells: per-cell fixed-point mean
    * of the normalized vectors (cmeans), residual vectors (re), residual
    * sub-vectors (rsq), the same seeded 2-iteration Lloyd over residuals
    * (rcb0..rcb2), and residual `rcodes`. Requires [[baseCtes]] (or
    * [[codesCtes]]) and a `cells(vec_id, cent_id)` CTE in scope.
    */
  def resCodesCtes: String =
    s"""cmeans AS (
       |  SELECT cent_id, list(val ORDER BY pos) AS cent_mean FROM (
       |    SELECT cl.cent_id, pos,
       |      CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
       |        / CAST(count(*) AS DOUBLE) AS val
       |    FROM (
       |      SELECT vec_id, unnest(nemb) AS x,
       |        unnest(range(1, len(nemb) + 1)) AS pos
       |      FROM ne) e JOIN cells cl USING (vec_id)
       |    GROUP BY cl.cent_id, pos)
       |  GROUP BY cent_id
       |), re AS (
       |  SELECT e.vec_id,
       |    list_transform(range(1, len(e.nemb) + 1),
       |      i -> e.nemb[i] - cm.cent_mean[i]) AS nemb
       |  FROM ne e JOIN cells cl USING (vec_id)
       |  JOIN cmeans cm ON cm.cent_id = cl.cent_id
       |), rsq AS (
       |  SELECT e.vec_id, CAST(t.s AS INT) AS sub_id,
       |    e.nemb[CAST(t.s * (len(e.nemb)//$M) + 1 AS INT)
       |           : CAST((t.s+1) * (len(e.nemb)//$M) AS INT)] AS sub_emb
       |  FROM re e, range(0, $M) t(s)
       |), rcb0 AS (
       |  SELECT s.sub_id, sd.cent_id, s.sub_emb AS cent_emb
       |  FROM pseeds sd JOIN rsq s USING (vec_id), pkq WHERE sd.cent_id < pkq.k
       |), ${assignCte("ra1", "rcb0", "rsq")}, ${updateCte("rcb1", "ra1")},
       |${assignCte("ra2", "rcb1", "rsq")}, ${updateCte("rcb2", "ra2")},
       |${assignCte("ra3", "rcb2", "rsq")},
       |rcodes AS (SELECT vec_id, sub_id, cent_id AS code FROM ra3)""".stripMargin

  /** The full IVF-PQ search chain (coarse Lloyd unroll + probes + PQ
    * codes + ADC + exact re-rank) as WITH-body CTEs ending in
    * `ranked(q_id, c_id, score_pq, cosine, rank)` — rank 1 = best by
    * exact cosine within the shortlist. `queryPred` filters corpus rows
    * on an unqualified `vec_id`. Twin of [[graft.ops.IvfPq.search]];
    * shared by q_knn_ivfpq and q_knn_classify_ann so both gates replay
    * ONE definition of the chain.
    */
  /** The RESIDUAL IVF-PQ search chain: coarse Lloyd unroll + probes +
    * residual PQ codes ([[resCodesCtes]]) + ADC over residual codewords
    * plus the exact per-(query, cell) correction term q·c (for any
    * per-cell constant c, q·x = q·(x−c) + q·c — the residual
    * decomposition that keeps quantization error at the within-cell
    * scale), then exact re-rank. Ends in the same
    * `ranked(q_id, c_id, score_pq, cosine, rank)` as
    * [[ivfpqSearchCtes]]. Twin of [[graft.ops.IvfPq.searchResidual]].
    */
  def ivfpqResSearchCtes(queryPred: String, nprobe: Int, shortlist: Int): String = {
    def cosDuck(a: String, b: String) = OracleVec.cos(a, b)
    s"""${OracleKmeans.codebookCtes},
       |scored AS (
       |  SELECT e.vec_id, e.embedding, c.cent_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${cosDuck("e.embedding", "c.cent_emb")} DESC, c.cent_id) AS rk
       |  FROM embeddings e, cb2 c
       |), cells AS (
       |  SELECT vec_id, cent_id FROM scored WHERE rk = 1
       |), probes AS (
       |  SELECT vec_id AS q_id, cent_id AS probe_cent
       |  FROM scored WHERE ($queryPred) AND rk <= $nprobe
       |), $baseCtes, $resCodesCtes,
       |tbl AS (
       |  SELECT q.vec_id AS q_id, q.sub_id, c.cent_id,
       |    ${dot("q.sub_emb", "c.cent_emb")} AS pdot
       |  FROM sq q JOIN rcb2 c ON c.sub_id = q.sub_id WHERE ($queryPred)
       |), corr AS (
       |  SELECT p.q_id, p.probe_cent,
       |    ${dot("qn.nemb", "cm.cent_mean")} AS qc
       |  FROM probes p JOIN ne qn ON qn.vec_id = p.q_id
       |  JOIN cmeans cm ON cm.cent_id = p.probe_cent
       |), cand AS (
       |  SELECT p.q_id, ce.vec_id AS c_id, ce.cent_id
       |  FROM probes p JOIN cells ce ON ce.cent_id = p.probe_cent
       |  WHERE ce.vec_id <> p.q_id
       |), adc AS (
       |  SELECT ca.q_id, ca.c_id, ca.cent_id,
       |    list(t.pdot ORDER BY t.sub_id) AS ps
       |  FROM cand ca
       |  JOIN rcodes co ON co.vec_id = ca.c_id
       |  JOIN tbl t ON t.q_id = ca.q_id AND t.sub_id = co.sub_id
       |    AND t.cent_id = co.code
       |  GROUP BY ca.q_id, ca.c_id, ca.cent_id
       |), sc AS (
       |  SELECT a.q_id, a.c_id,
       |    list_reduce(list_prepend(0e0, a.ps), (acc, v) -> acc + v)
       |      + cr.qc AS score_pq
       |  FROM adc a JOIN corr cr
       |    ON cr.q_id = a.q_id AND cr.probe_cent = a.cent_id
       |), short AS (
       |  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY score_pq DESC, c_id) AS srk FROM sc)
       |  WHERE srk <= $shortlist
       |), rr AS (
       |  SELECT s.q_id, s.c_id, s.score_pq,
       |    ${cosDuck("qe.embedding", "ce.embedding")} AS cosine
       |  FROM short s JOIN embeddings qe ON qe.vec_id = s.q_id
       |               JOIN embeddings ce ON ce.vec_id = s.c_id
       |), ranked AS (
       |  SELECT q_id, c_id, score_pq, cosine,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY cosine DESC, c_id) AS rank
       |  FROM rr
       |)""".stripMargin
  }

  def ivfpqSearchCtes(queryPred: String, nprobe: Int, shortlist: Int): String = {
    def cosDuck(a: String, b: String) = OracleVec.cos(a, b)
    s"""${OracleKmeans.codebookCtes},
       |scored AS (
       |  SELECT e.vec_id, e.embedding, c.cent_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${cosDuck("e.embedding", "c.cent_emb")} DESC, c.cent_id) AS rk
       |  FROM embeddings e, cb2 c
       |), cells AS (
       |  SELECT vec_id, cent_id FROM scored WHERE rk = 1
       |), probes AS (
       |  SELECT vec_id AS q_id, cent_id AS probe_cent
       |  FROM scored WHERE ($queryPred) AND rk <= $nprobe
       |), $codesCtes,
       |tbl AS (
       |  SELECT q.vec_id AS q_id, q.sub_id, c.cent_id,
       |    ${dot("q.sub_emb", "c.cent_emb")} AS pdot
       |  FROM sq q JOIN pcb2 c ON c.sub_id = q.sub_id WHERE ($queryPred)
       |), cand AS (
       |  SELECT p.q_id, ce.vec_id AS c_id
       |  FROM probes p JOIN cells ce ON ce.cent_id = p.probe_cent
       |  WHERE ce.vec_id <> p.q_id
       |), adc AS (
       |  SELECT ca.q_id, ca.c_id, list(t.pdot ORDER BY t.sub_id) AS ps
       |  FROM cand ca
       |  JOIN codes co ON co.vec_id = ca.c_id
       |  JOIN tbl t ON t.q_id = ca.q_id AND t.sub_id = co.sub_id
       |    AND t.cent_id = co.code
       |  GROUP BY ca.q_id, ca.c_id
       |), sc AS (
       |  SELECT q_id, c_id,
       |    list_reduce(list_prepend(0e0, ps), (acc, v) -> acc + v) AS score_pq
       |  FROM adc
       |), short AS (
       |  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY score_pq DESC, c_id) AS srk FROM sc)
       |  WHERE srk <= $shortlist
       |), rr AS (
       |  SELECT s.q_id, s.c_id, s.score_pq,
       |    ${cosDuck("qe.embedding", "ce.embedding")} AS cosine
       |  FROM short s JOIN embeddings qe ON qe.vec_id = s.q_id
       |               JOIN embeddings ce ON ce.vec_id = s.c_id
       |), ranked AS (
       |  SELECT q_id, c_id, score_pq, cosine,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY cosine DESC, c_id) AS rank
       |  FROM rr
       |)""".stripMargin
  }
}
