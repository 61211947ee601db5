package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy k-center selection over an embedding corpus (Gonzalez 1985
  * farthest-point traversal, the 2-approximation for the k-center
  * objective) — the DIVERSITY-maximizing data-selection primitive:
  * coreset seeding, annotation-budget allocation, "pick k maximally
  * different documents" — the complement of [[Mmr]]'s query-relative
  * reranking (this selects globally, with no query).
  *
  * Similarity is cosine; "farthest from the selected set" = minimum
  * max-similarity. Start from the min vec_id (deterministic), then k−1
  * rounds of: update each point's running max-similarity to the
  * selected set against ONLY the newest pick (one broadcast 1-row
  * frame — the selected-set max telescopes, so no per-round rescan of
  * all picks), take the argmin (ties → min vec_id) as the next pick.
  * Cosines are the same double fold on both engines (the q_knn_brute
  * contract: bit-identical expression chains, not quantization), picks
  * and ordering are therefore exact.
  *
  * A picked point's similarity to itself is ~1.0 — the maximum — so it
  * sorts last in the argmin and is never re-picked (exact duplicates
  * of an already-picked vector tie deterministically by vec_id on both
  * engines).
  *
  * Scale shape per round: ONE corpus pass (broadcast nested-loop
  * against the 1-row newest pick) + a TakeOrdered(1) argmin — no
  * corpus shuffle, no window; the cover frame checkpoints per round so
  * lineage stays flat. k rounds = k corpus scans, the irreducible cost
  * of the greedy algorithm.
  */
object KCenter {

  private val cosSql =
    "(vec_dot(embedding, p_emb) / (SQRT(vec_dot(embedding, embedding))" +
      " * SQRT(vec_dot(p_emb, p_emb))))"

  /** (pick, vec_id) for the k greedily-selected centers of `emb`
    * (columns vec_id, embedding). pick is 1-based selection order.
    */
  def select(emb: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    val corpus = Iterate.materialize(
      emb.select(col("vec_id"), col("embedding")))
    // every pick frame is MATERIALIZED (1 row) before the cover frame it
    // was computed from is released — the final union must not reach back
    // into unpersisted checkpoints
    val first = Iterate.materialize(corpus.orderBy(col("vec_id")).limit(1))
    var picks = Vector[DataFrame](
      first.select(lit(1).as("pick"), col("vec_id")))
    var cover = Iterate.materialize(
      corpus.crossJoin(
          broadcast(first.select(col("embedding").as("p_emb"))))
        .select(col("vec_id"), col("embedding"), expr(cosSql).as("best")))
    corpus.unpersist()
    for (i <- 2 to k) {
      val pick = Iterate.materialize(
        cover.orderBy(col("best"), col("vec_id")).limit(1))
      picks :+= pick.select(lit(i).as("pick"), col("vec_id"))
      if (i < k) {
        val next = Iterate.materialize(
          cover.crossJoin(broadcast(pick.select(col("embedding").as("p_emb"))))
            .select(col("vec_id"), col("embedding"),
              greatest(col("best"), expr(cosSql)).as("best")))
        cover.unpersist()
        cover = next
      }
    }
    cover.unpersist()
    picks.reduce(_ union _).select(col("pick"), col("vec_id"))
  }

  /** The same greedy rounds as chained DuckDB CTEs over `embeddings`
    * (vec_id, embedding) — the oracle twin of [[select]]; ends
    * selecting (pick, vec_id).
    */
  def oracleSql(k: Int): String = {
    def cos(a: String, b: String) = graft.queries.OracleVec.cos(a, b)
    val sb = new StringBuilder
    sb.append(
      s"""p1 AS (
         |  SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 1
         |), cv1 AS MATERIALIZED (
         |  SELECT e.vec_id, e.embedding,
         |    ${cos("e.embedding", "p.embedding")} AS best
         |  FROM embeddings e, p1 p
         |)""".stripMargin)
    for (i <- 2 to k) {
      sb.append(
        s""",
           |p$i AS (
           |  SELECT vec_id, embedding FROM cv${i - 1}
           |  ORDER BY best, vec_id LIMIT 1
           |)""".stripMargin)
      if (i < k) sb.append(
        s""",
           |cv$i AS MATERIALIZED (
           |  SELECT cv.vec_id, cv.embedding,
           |    greatest(cv.best, ${cos("cv.embedding", "p.embedding")}) AS best
           |  FROM cv${i - 1} cv, p$i p
           |)""".stripMargin)
    }
    sb.append("\n")
    sb.append((1 to k)
      .map(i => s"SELECT $i AS pick, vec_id FROM p$i")
      .mkString("", "\nUNION ALL\n", ""))
    sb.toString
  }
}
