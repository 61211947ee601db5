package graft.queries

/** Shared DuckDB oracle snippets for the embedding/vector queries — the
  * SQL twins of [[graft.functions.VecDot]] / [[graft.functions.VecPlaneDot]]
  * and the hyperplane LSH bucket. Single source so a change to the fold
  * or plane family cannot drift between the four queries that embed them
  * (q_knn_brute, q_knn_lsh, q_knn_ivf, q_dedup_embedding).
  */
private[graft] object OracleVec {

  /** Left-fold dot product over two list columns (index order, double).
    * NULL on length mismatch, mirroring VecDot's null semantics exactly —
    * without the guard the fold would return a partial (non-null) dot when
    * len(b) > len(a), silently diverging from the engine if embedding
    * dimensions ever vary.
    */
  def dot(a: String, b: String): String =
    s"""(CASE WHEN len($a) <> len($b) THEN NULL
       |      ELSE list_reduce(list_prepend(0e0, list_transform(range(1, len($a) + 1),
       |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (acc, v) -> acc + v) END)""".stripMargin

  /** Cosine similarity composed from three dot folds. */
  def cos(a: String, b: String): String =
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"

  /** Banded hyperplane-signature CTE chain over `embeddings`, ending in
    * `ebands(vec_id, band_id, band_val)` — the DuckDB twin of
    * `ExtQueries.lshBanded`. Plane j's component at (1-based) element i is
    * `(((i * (1000003 + j*7919)) + (j*271 + 17)) % 1000) * 1e-3 - 5e-1`,
    * folded left in index order: bit-identical to the native
    * [[graft.functions.VecPlaneDot]] codegen loop (DuckDB range() yields
    * BIGINT, matching the expression's 64-bit index arithmetic).
    *
    * Band width `r` is data-adaptive via the same integer rule as the
    * Spark side — the smallest r with 2^r * 8 >= n (capped at maxBits) —
    * so both engines derive identical signatures at any corpus size.
    */
  def bandsCte(nBands: Int, maxBits: Int): String =
    s"""rq AS (
       |  SELECT CAST(t.r AS INT) AS r
       |  FROM range(1, ${maxBits + 1}) t(r),
       |       (SELECT count(*) AS n FROM embeddings) c
       |  WHERE (CAST(1 AS BIGINT) << CAST(t.r AS INT)) * 8 >= c.n OR t.r = $maxBits
       |  ORDER BY t.r LIMIT 1
       |), ebits AS (
       |  SELECT e.vec_id, t.j, rq.r,
       |    list_reduce(list_prepend(0e0, list_transform(range(1, len(e.embedding) + 1),
       |      i -> CAST(e.embedding[i] AS DOUBLE)
       |        * ((((i * (1000003 + t.j * 7919)) + (t.j * 271 + 17)) % 1000) * 1e-3 - 5e-1))),
       |      (acc, x) -> acc + x) >= 0e0 AS bit
       |  FROM embeddings e, rq, range(0, ${nBands.toLong * maxBits}) t(j)
       |  WHERE t.j < $nBands * rq.r
       |), ebands AS (
       |  SELECT vec_id, CAST(j // r AS INT) AS band_id,
       |    CAST(sum(CASE WHEN bit THEN (CAST(1 AS BIGINT) << CAST(j % r AS INT))
       |             ELSE 0 END) AS BIGINT) AS band_val
       |  FROM ebits GROUP BY vec_id, j // r, r
       |)""".stripMargin
}
