package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PCA by fixed-point power iteration — the
  * embedding-whitening / dimensionality-analysis pass of an embedding
  * pipeline (project every vector onto the dominant principal component;
  * the same machinery extends to top-k by deflation).
  *
  * Reference scope: extension surface (no linear algebra anywhere in
  * the reference); sits next to the JL projection and int8 quantization
  * in the embedding tier.
  *
  * Numeric contract — exact integer arithmetic end to end, so the run
  * is bit-identical at any parallelism and in the DuckDB oracle:
  *  - quantize: q_i = floor(x_i * 1e4) (row-local, the only float op;
  *    floor of an IEEE multiply is identical cross-engine),
  *  - centered Gram: C_ij = n * sum(q_i q_j) - S_i S_j (all int64),
  *  - rescale to A_ij = trunc-div(C_ij, max|C| div 1e6 + 1), so
  *    |A| <= 1e6; division is spelled as explicit truncate-toward-zero
  *    (sign(x) * (|x| div d)) on BOTH engines — Spark `div` and
  *    DuckDB `//` both truncate toward zero today (verified), and the
  *    explicit form keeps the contract independent of any engine
  *    changing its negative-operand convention,
  *  - power rounds from v0 = all-ones * 1e6: u = A v, then renormalize
  *    v' = trunc-div(u, max|u| div 1e6 + 1). Covariance is PSD, so the
  *    iteration converges toward the dominant eigenvector (up to the
  *    deterministic fixed-point truncation, which both engines share).
  *
  * Scale shape: the Gram pass is the ONLY corpus-touching work — the
  * d^2 product terms are generated row-locally (two nested explodes, no
  * self-join shuffle) and collapse map-side to <= d^2 rows per partition
  * before one d^2-key exchange; n never appears in any shuffle key. The
  * d x d iteration operates on index metadata (d^2 rows) and the final
  * projection is one broadcast join + a partial-aggregable per-vector
  * sum. Int64 headroom: |C| <= 2 n^2 scale^2 must stay inside 2^63 —
  * at scale=1e4 that bounds n at ~2e5 worst-case vectors (unit-norm
  * embeddings sit far below the bound); lower the quantization scale
  * for larger corpora (the contract names the precision, not the
  * representation — same convention as [[PageRank]]).
  */
object PcaPower {

  private def materialize(df: DataFrame): DataFrame = Iterate.materialize(df)

  /** Truncate-toward-zero division (identical in Spark and DuckDB for
    * any sign): sign(x) * (abs(x) div d), d > 0.
    */
  private def tdiv(x: String, d: String): String =
    s"(CASE WHEN $x < 0 THEN -(-($x) div ($d)) ELSE ($x) div ($d) END)"

  /** Sufficient statistics for the centered Gram matrix — EXACTLY
    * additive across corpus slices (integer sums), which is what makes
    * the incremental path below identical to a full recompute:
    * (gram: (i, j, g), sums: (i, s), n).
    */
  final case class Stats(gram: DataFrame, sums: DataFrame, n: Long)

  private def quantized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1e4) AS BIGINT))")
        .as("qarr"))

  /** (vec_id, i, q) pairs from a quantized (vec_id, qarr) frame. */
  private def explodeQ(q: DataFrame): DataFrame =
    q.select(col("vec_id"), col("qarr"),
        posexplode(col("qarr")).as(Seq("i0", "q")))
      .select(col("vec_id"), (col("i0") + 1).cast("long").as("i"), col("q"))

  /** Statistics from an already-quantized (ideally checkpointed) frame:
    * the d^2 product terms are generated row-locally (second explode
    * over the carried array) and partial-aggregated before the single
    * d^2-key shuffle.
    */
  private def statsFromQ(q: DataFrame): Stats = {
    val sums = explodeQ(q).groupBy(col("i")).agg(sum(col("q")).as("s"))
    val gram = q
      .select(col("qarr"), posexplode(col("qarr")).as(Seq("i0", "qi")))
      .select(col("i0"), col("qi"), posexplode(col("qarr")).as(Seq("j0", "qj")))
      .groupBy((col("i0") + 1).cast("long").as("i"),
        (col("j0") + 1).cast("long").as("j"))
      .agg(sum(col("qi") * col("qj")).as("g"))
    Stats(gram, sums, q.count())
  }

  /** One corpus read -> additive statistics (the quantized frame is
    * checkpointed so sums, Gram, and the count share a single scan of
    * the source).
    */
  def stats(emb: DataFrame): Stats = statsFromQ(materialize(quantized(emb)))

  /** Fold a new corpus slice into existing statistics — the incremental
    * index-maintenance path (the [[IvfPq]] append / [[Rollup]] merge
    * convention): integer sums are exactly additive, so the merged
    * statistics — and everything derived from them — are BIT-IDENTICAL
    * to a full recompute over the union.
    */
  def mergeStats(a: Stats, b: Stats): Stats = Stats(
    a.gram.union(b.gram).groupBy(col("i"), col("j"))
      .agg(sum(col("g")).as("g")),
    a.sums.union(b.sums).groupBy(col("i")).agg(sum(col("s")).as("s")),
    a.n + b.n)

  /** Project every embedding onto the dominant principal component.
    * Input: (vec_id, embedding: array<float|double>) with fixed
    * dimension `d`. Output: (vec_id, pc1_fp) — the exact integer
    * projection sum(q_i * v_i) onto the converged fixed-point
    * eigenvector.
    */
  def project(emb: DataFrame, d: Int, iters: Int = 8): DataFrame = {
    // ONE checkpointed quantized frame feeds the sums, the Gram, the
    // count, AND the final projection — a single read of the source
    val q = materialize(quantized(emb))
    projectFromQ(statsFromQ(q), q, d, iters)
  }

  /** [[project]] from precomputed (possibly incrementally merged)
    * statistics; the corpus is read once, for the projection only.
    */
  def projectWith(
      st: Stats, emb: DataFrame, d: Int, iters: Int): DataFrame =
    projectFromQ(st, quantized(emb), d, iters)

  /** Fixed-point dominant eigenvector of the centered Gram described by
    * `st`: (i, v) as a d-row local relation (index metadata).
    */
  def eigvec(st: Stats, d: Int, iters: Int): DataFrame = {
    require(d >= 2 && iters >= 1)
    val n = st.n
    val sums = st.sums
    val gram = st.gram
    val c = gram.join(sums.select(col("i"), col("s").as("si")), "i")
      .join(sums.select(col("i").as("j"), col("s").as("sj")), "j")
      .select(col("i"), col("j"),
        (lit(n) * col("g") - col("si") * col("sj")).as("c"))
    val ma = c.agg(max(abs(col("c"))).as("m"))
    // A and every v are d^2 / d rows of index metadata: local relations
    val a = IvfIndex.materialize(
      c.crossJoin(broadcast(ma))
        .select(col("i"), col("j"),
          expr(tdiv("c", "m div 1000000 + 1")).as("a")))
    var v = IvfIndex.materialize(
      a.sparkSession.range(1, d + 1).toDF("i").withColumn("v", lit(1000000L)))
    for (_ <- 1 to iters) {
      val u = a.join(broadcast(v.select(col("i").as("j"), col("v"))), "j")
        .groupBy(col("i")).agg(sum(col("a") * col("v")).as("u"))
      val mu = u.agg(max(abs(col("u"))).as("m"))
      v = IvfIndex.materialize(
        u.crossJoin(broadcast(mu))
          .select(col("i"), expr(tdiv("u", "m div 1000000 + 1")).as("v")))
    }
    v
  }

  private def projectFromQ(
      st: Stats, q: DataFrame, d: Int, iters: Int): DataFrame =
    // the explode is consumed exactly once (the projection join)
    explodeQ(q).join(broadcast(eigvec(st, d, iters)), "i")
      .groupBy(col("vec_id"))
      .agg(sum(col("q") * col("v")).as("pc1_fp"))

  /** Top-2 components by deflation: PC1 as [[project]]; then every
    * vector's integer residual q' = q - tdiv(dot(q, v1) * v1_i,
    * dot(v1, v1)) (row-local once v1 broadcasts), a second Gram/power
    * pass over the residuals, and PC2 = residual . v2. Output:
    * (vec_id, pc1_fp, pc2_fp). Everything stays exact int64, so the
    * oracle unrolls both chains; the deflation step is the standard
    * Hotelling residual, with the rational projection coefficient
    * truncated deterministically on both engines.
    */
  def projectTop2(emb: DataFrame, d: Int, iters: Int = 8): DataFrame =
    projectTopK(emb, d, k = 2, iters)

  /** Top-k components by looped Hotelling deflation — the general form
    * of [[projectTop2]]: component c's eigenvector comes from a
    * Gram/power chain over the (c-1)-th residual corpus, its projection
    * pc{c}_fp is `residual_(c-1) . v_c`, and the next residual is
    * q' = q - tdiv(dot(q, v_c) * v_c_i, dot(v_c, v_c)) (row-local once
    * v_c broadcasts; greatest(vv, 1) guards the degenerate all-equal
    * corpus where v_c = 0, so residuals degrade to the input instead of
    * NULLing out). Output: (vec_id, pc1_fp .. pc{k}_fp), all exact
    * int64 — the oracle stacks k prefixed chain unrolls.
    *
    * Scale shape: k corpus-touching Gram passes (each the row-local
    * double-explode with map-side d^2 collapse) + k broadcast
    * projection joins; each residual corpus is checkpointed so chain
    * c+1 starts from rows, not a k-deep lineage. k is a small constant
    * (an embedding map wants 2-10 components), so the cost is k * the
    * single-component pass — never a d^3 eigendecomposition and never
    * a corpus collect.
    */
  def projectTopK(emb: DataFrame, d: Int, k: Int, iters: Int = 8): DataFrame = {
    require(k >= 1 && k <= d)
    var q = materialize(quantized(emb))
    var acc: DataFrame = null // (vec_id, pc1_fp .. pc{c}_fp) so far
    for (c <- 1 to k) {
      val vc = eigvec(statsFromQ(q), d, iters)
      val expl = explodeQ(q)
      // the projection IS the deflation coefficient — computed once,
      // reused as both the output column and the residual's dq
      val dq = expl.join(broadcast(vc), "i")
        .groupBy(col("vec_id")).agg(sum(col("q") * col("v")).as(s"pc${c}_fp"))
      acc = if (acc == null) dq else acc.join(dq, "vec_id")
      if (c < k) {
        val vv = vc.agg(sum(col("v") * col("v")).as("vv"))
        val resid = expl.join(broadcast(vc), "i")
          .join(dq.select(col("vec_id"), col(s"pc${c}_fp").as("dq")), "vec_id")
          .crossJoin(broadcast(vv))
          .select(col("vec_id"), col("i"),
            (col("q") - expr(tdiv("dq * v", "greatest(vv, 1)"))).as("q"))
        // residual rows -> re-assembled (vec_id, qarr) so the next pass
        // reuses the row-local double-explode Gram path
        q = materialize(
          resid.groupBy(col("vec_id"))
            .agg(expr("transform(array_sort(collect_list(struct(i, q))), s -> s.q)")
              .as("qarr")))
      }
    }
    acc.select(col("vec_id") +: (1 to k).map(c => col(s"pc${c}_fp")): _*)
  }

  private def tdivDuck(x: String, dv: String): String =
    s"(CASE WHEN $x < 0 THEN -((-($x)) // ($dv)) ELSE ($x) // ($dv) END)"

  /** The quantized explode CTE `expl` from `embeddings`. */
  private def explDuck(d: Int): String =
    s"""expl AS MATERIALIZED (
       |  SELECT vec_id, CAST(t.i AS BIGINT) AS i,
       |    CAST(floor(CAST(embedding[t.i] AS DOUBLE) * 1e4) AS BIGINT) AS q
       |  FROM embeddings, range(1, ${d + 1}) t(i)
       |)""".stripMargin

  /** One Gram + power-iteration chain from an (vec_id, i, q) CTE named
    * `src`, every CTE name prefixed with `p` so chains can stack (the
    * deflation oracle runs two). Final eigenvector CTE: `${p}v$iters`.
    */
  private def chainDuck(p: String, src: String, d: Int, iters: Int): String = {
    val head =
      s"""${p}sn AS MATERIALIZED (
         |  SELECT i, CAST(sum(q) AS BIGINT) AS s FROM $src GROUP BY i
         |), ${p}nn AS (SELECT count(DISTINCT vec_id) AS n FROM $src),
         |${p}g AS MATERIALIZED (
         |  SELECT a.i, b.i AS j, CAST(sum(a.q * b.q) AS BIGINT) AS g
         |  FROM $src a JOIN $src b USING (vec_id) GROUP BY 1, 2
         |), ${p}c AS MATERIALIZED (
         |  SELECT g.i, g.j, nn.n * g.g - sa.s * sb.s AS c
         |  FROM ${p}g g CROSS JOIN ${p}nn nn
         |  JOIN ${p}sn sa ON sa.i = g.i JOIN ${p}sn sb ON sb.i = g.j
         |), ${p}ma AS (SELECT max(abs(c)) AS m FROM ${p}c),
         |${p}am AS MATERIALIZED (
         |  SELECT i, j, ${tdivDuck("c", "m // 1000000 + 1")} AS a
         |  FROM ${p}c CROSS JOIN ${p}ma
         |), ${p}v0 AS (
         |  SELECT CAST(t.i AS BIGINT) AS i, CAST(1000000 AS BIGINT) AS v
         |  FROM range(1, ${d + 1}) t(i)
         |)""".stripMargin
    val steps = (1 to iters).map { r =>
      s"""${p}u$r AS MATERIALIZED (
         |  SELECT am.i, CAST(sum(am.a * v.v) AS BIGINT) AS u
         |  FROM ${p}am am JOIN ${p}v${r - 1} v ON v.i = am.j GROUP BY am.i
         |), ${p}mu$r AS (SELECT max(abs(u)) AS m FROM ${p}u$r),
         |${p}v$r AS MATERIALIZED (
         |  SELECT i, ${tdivDuck("u", "m // 1000000 + 1")} AS v
         |  FROM ${p}u$r CROSS JOIN ${p}mu$r
         |)""".stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  /** The identical computation as DuckDB CTEs over `embeddings`
    * (vec_id, embedding) — the oracle twin of [[project]]; kept
    * adjacent so the quantization/rescale steps cannot drift.
    */
  def oracleSql(d: Int, iters: Int = 8): String =
    Seq(explDuck(d), chainDuck("", "expl", d, iters)).mkString(",\n") +
      s"""
         |SELECT e.vec_id, CAST(sum(e.q * v.v) AS BIGINT) AS pc1_fp
         |FROM expl e JOIN v$iters v ON v.i = e.i
         |GROUP BY e.vec_id""".stripMargin

  /** Oracle twin of [[projectTop2]]: first chain, Hotelling residual
    * (truncated rational projection), second chain over the residuals,
    * both projections.
    */
  def oracleTop2Sql(d: Int, iters: Int = 8): String =
    Seq(
      explDuck(d),
      chainDuck("", "expl", d, iters),
      s"""vv AS (SELECT CAST(sum(v * v) AS BIGINT) AS vv FROM v$iters),
         |dq AS MATERIALIZED (
         |  SELECT e.vec_id, CAST(sum(e.q * v.v) AS BIGINT) AS dq
         |  FROM expl e JOIN v$iters v ON v.i = e.i GROUP BY e.vec_id
         |), expl2 AS MATERIALIZED (
         |  SELECT e.vec_id, e.i,
         |    e.q - ${tdivDuck("dq.dq * v.v", "greatest(vv.vv, 1)")} AS q
         |  FROM expl e JOIN v$iters v ON v.i = e.i
         |  JOIN dq ON dq.vec_id = e.vec_id CROSS JOIN vv
         |)""".stripMargin,
      chainDuck("p2", "expl2", d, iters)
    ).mkString(",\n") +
      s"""
         |SELECT dq.vec_id, dq.dq AS pc1_fp, p2.pc2_fp FROM dq
         |JOIN (
         |  SELECT e.vec_id, CAST(sum(e.q * v.v) AS BIGINT) AS pc2_fp
         |  FROM expl2 e JOIN p2v$iters v ON v.i = e.i GROUP BY e.vec_id) p2
         |  ON p2.vec_id = dq.vec_id""".stripMargin

  /** Oracle twin of [[projectTopK]]: k stacked prefixed chains, each
    * followed by its projection CTE and (below k) the truncated-rational
    * Hotelling residual feeding the next chain.
    */
  def oracleTopKSql(d: Int, k: Int, iters: Int = 8): String = {
    require(k >= 1 && k <= d)
    val parts = scala.collection.mutable.ArrayBuffer(explDuck(d))
    for (c <- 1 to k) {
      val pfx = if (c == 1) "" else s"p$c"
      val src = if (c == 1) "expl" else s"expl$c"
      parts += chainDuck(pfx, src, d, iters)
      parts +=
        s"""dq$c AS MATERIALIZED (
           |  SELECT e.vec_id, CAST(sum(e.q * v.v) AS BIGINT) AS pc${c}_fp
           |  FROM $src e JOIN ${pfx}v$iters v ON v.i = e.i
           |  GROUP BY e.vec_id
           |)""".stripMargin
      if (c < k) parts +=
        s"""vv$c AS (SELECT CAST(sum(v * v) AS BIGINT) AS vv FROM ${pfx}v$iters),
           |expl${c + 1} AS MATERIALIZED (
           |  SELECT e.vec_id, e.i,
           |    e.q - ${tdivDuck(s"dq$c.pc${c}_fp * v.v", s"greatest(vv$c.vv, 1)")} AS q
           |  FROM $src e JOIN ${pfx}v$iters v ON v.i = e.i
           |  JOIN dq$c ON dq$c.vec_id = e.vec_id CROSS JOIN vv$c
           |)""".stripMargin
    }
    parts.mkString(",\n") +
      s"""
         |SELECT dq1.vec_id, ${(1 to k).map(c => s"dq$c.pc${c}_fp").mkString(", ")}
         |FROM dq1 ${(2 to k).map(c => s"JOIN dq$c USING (vec_id)").mkString(" ")}""".stripMargin
  }
}
