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

  /** Min-L2 nearest-codeword assignment of every (vec_id, sub_id) in `sq`
    * against codebook `cb`.
    */
  private def assignCte(name: String, cb: String): String =
    s"""$name AS (
       |  SELECT vec_id, sub_id, sub_emb, cent_id FROM (
       |    SELECT q.vec_id, q.sub_id, q.sub_emb, c.cent_id,
       |      row_number() OVER (PARTITION BY q.vec_id, q.sub_id
       |        ORDER BY ${d2("q.sub_emb", "c.cent_emb")} ASC, c.cent_id) AS rk
       |    FROM sq q JOIN $cb c ON c.sub_id = q.sub_id) WHERE rk = 1
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

  /** The full chain: normalization (ne), sub-vectors (sq), shared pseeds,
    * 2 Lloyd iterations (pcb0..pcb2), final assignment (pa3) and `codes`.
    */
  def codesCtes: String =
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
       |), pcb0 AS (
       |  SELECT s.sub_id, sd.cent_id, s.sub_emb AS cent_emb
       |  FROM pseeds sd JOIN sq s USING (vec_id), pkq WHERE sd.cent_id < pkq.k
       |), ${assignCte("pa1", "pcb0")}, ${updateCte("pcb1", "pa1")},
       |${assignCte("pa2", "pcb1")}, ${updateCte("pcb2", "pa2")},
       |${assignCte("pa3", "pcb2")},
       |codes AS (SELECT vec_id, sub_id, cent_id AS code FROM pa3)""".stripMargin
}
