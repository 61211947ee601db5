package graft.queries

/** Shared DuckDB oracle snippets for the deterministic seeded k-means of
  * [[graft.ops.IvfIndex]] — single source for the queries that embed the
  * codebook build (q_knn_ivf, q_semdedup) so the Lloyd unroll cannot
  * drift between them. See IvfIndex for the cross-engine contract
  * (md5-ordered seeds, max-cosine assignment with (cs DESC, cent_id)
  * tie-break, fixed-point exact centroid means).
  */
private[queries] object OracleKmeans {

  private def cosDuck(a: String, b: String) = OracleVec.cos(a, b)

  /** One Lloyd assignment CTE: nearest centroid of codebook `cb`. */
  def assignCte(name: String, cb: String): String =
    s"""$name AS (
       |  SELECT vec_id, embedding, cent_id FROM (
       |    SELECT e.vec_id, e.embedding, c.cent_id,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosDuck("e.embedding", "c.cent_emb")} DESC, c.cent_id) AS rk
       |    FROM embeddings e, $cb c) WHERE rk = 1
       |)""".stripMargin

  /** Centroid update: per-(cent,pos) fixed-point exact mean (same op
    * order as Num.dsum / count on the Spark side), list re-assembled in
    * position order.
    */
  def updateCte(name: String, a: String): String =
    s"""$name AS (
       |  SELECT cent_id, list(val ORDER BY pos) AS cent_emb FROM (
       |    SELECT cent_id, pos,
       |      CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
       |        / CAST(count(*) AS DOUBLE) AS val
       |    FROM (
       |      SELECT cent_id, unnest(embedding) AS x,
       |        unnest(range(1, len(embedding) + 1)) AS pos
       |      FROM $a)
       |    GROUP BY cent_id, pos)
       |  GROUP BY cent_id
       |)""".stripMargin

  /** The full 2-iteration codebook chain (kq, cb0, a1, cb1, a2, cb2);
    * the final codebook CTE is `cb2`, k = greatest(4, ceil(sqrt(n))).
    */
  def codebookCtes: String =
    s"""kq AS (
       |  SELECT greatest(4, CAST(ceil(sqrt(count(*))) AS INT)) AS k FROM embeddings
       |), cb0 AS (
       |  SELECT cent_id, embedding AS cent_emb FROM (
       |    SELECT vec_id, embedding,
       |      row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
       |        AS cent_id
       |    FROM embeddings) s, kq WHERE s.cent_id < kq.k
       |), ${assignCte("a1", "cb0")}, ${updateCte("cb1", "a1")},
       |${assignCte("a2", "cb1")}, ${updateCte("cb2", "a2")}""".stripMargin

  /** The full IVF search chain on top of [[codebookCtes]]: corpus
    * assignment, nprobe=2 probe set for queries `vec_id < 10`, candidate
    * scoring, and the top-`topK` CTE `ivf(q_id, c_id, rank)` — single
    * source for the retrieval-eval oracles (q_retrieval_eval, q_ndcg)
    * so the search unroll cannot drift between metrics.
    */
  def ivfSearchCtes(topK: Int): String =
    s"""$codebookCtes,
       |scored AS (
       |  SELECT e.vec_id, e.embedding, c.cent_id,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${cosDuck("e.embedding", "c.cent_emb")} DESC, c.cent_id) AS rk
       |  FROM embeddings e, cb2 c
       |), assign AS (
       |  SELECT vec_id, embedding, cent_id FROM scored WHERE rk = 1
       |), probes AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb, cent_id AS probe_cent
       |  FROM scored WHERE vec_id < 10 AND rk <= 2
       |), p AS (
       |  SELECT pr.q_id, a.vec_id AS c_id,
       |    ${cosDuck("pr.q_emb", "a.embedding")} AS cosine
       |  FROM probes pr JOIN assign a ON a.cent_id = pr.probe_cent
       |  WHERE a.vec_id <> pr.q_id
       |), ivf AS MATERIALIZED (
       |  SELECT q_id, c_id, rank FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |      ORDER BY cosine DESC, c_id) AS rank FROM p) WHERE rank <= $topK
       |)""".stripMargin
}
