package graft.queries

/** Shared DuckDB oracle snippets for the embedding/vector queries — the
  * SQL twins of [[graft.functions.VecDot]] / [[graft.functions.VecPlaneDot]]
  * and the hyperplane LSH bucket. Single source so a change to the fold
  * or plane family cannot drift between the four queries that embed them
  * (q_knn_brute, q_knn_lsh, q_knn_ivf, q_dedup_embedding).
  */
private[queries] object OracleVec {

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

  /** Component j of pseudo-random hyperplane family `plane`: the
    * ((i*a + b) % 1000)/1000 - 0.5 construction, 64-bit index arithmetic
    * (DuckDB range() is BIGINT; the native expression matches). */
  def hcomp(j: Int): String =
    s"(((i * ${1000003 + j * 7919}) + ${j * 271 + 17}) % 1000) * 1e-3 - 5e-1"

  /** Projection of `v` onto hyperplane j. */
  def planeDot(v: String, j: Int): String =
    s"""list_reduce(list_prepend(0e0, list_transform(range(1, len($v) + 1),
       |      i -> CAST($v[i] AS DOUBLE) * (${hcomp(j)}))), (acc, x) -> acc + x)""".stripMargin

  /** 8-bit sign bucket over planes 0..7 (twin of ExtQueries.lshBucket). */
  def bucket(v: String): String =
    (0 until 8)
      .map(j => s"(CASE WHEN ${planeDot(v, j)} >= 0e0 THEN ${1 << j} ELSE 0 END)")
      .mkString(" + ")
}
