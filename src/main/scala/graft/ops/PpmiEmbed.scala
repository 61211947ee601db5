package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PPMI co-occurrence spectral embedding — the count-based word-vector
  * construction (Levy & Goldberg 2014: SVD over the positive-PMI
  * co-occurrence matrix IS implicit word2vec): windowed word
  * co-occurrence counts → PPMI weighting → dominant spectral direction
  * by fixed-point power iteration. The on-engine "train a tiny
  * embedding from the corpus" primitive: the resulting per-word
  * salience component is the first coordinate every spectral embedding
  * starts from (further components = Hotelling deflation, the
  * [[PcaPower.projectTopK]] machinery).
  *
  * Exactness: counts are exact int64; PPMI_fp =
  * `greatest(0, floor(ln((c_ab·T)/(c_a·c_b)) · 1e6))` — the int64
  * products are exact below 2^53 (headroom: T ≲ 9e15, i.e. ~2e15
  * window pairs; subsample beyond), the single divide+ln+floor chain is
  * textually identical on both engines (the q_char_entropy ln
  * convention). Power rounds are pure integer: u = M·v (|u| <=
  * |V|·p_max·1e6 ≈ 3e15), renormalized `v' = u div (max(u) div 1e6 + 1)`
  * ([[PcaPower]]'s rescale). M is nonnegative and v_0 > 0, so every
  * iterate stays nonnegative (Perron-Frobenius) — plain `div` IS floor.
  *
  * Scale shape: the corpus-sized stages are one positioned-pair explode
  * and one hash agg; everything after lives on the top-`topV` vocab
  * (M <= topV², v = topV rows — index metadata, local relations).
  * Words whose PPMI row is all zero drop out of the iteration (their
  * component is an implicit exact 0) — documented, same on both
  * engines.
  */
object PpmiEmbed {

  /** (word, n_cooc, sal_fp): the dominant-eigenvector component per
    * vocab word after `iters` power rounds, with its co-occurrence
    * marginal. `docs` must have a `text` column of space-separated
    * tokens.
    */
  def run(docs: DataFrame, topV: Int = 150, iters: Int = 6): DataFrame = {
    val t = docs.select(split(col("text"), " ").as("toks"),
      size(split(col("text"), " ")).as("n"))
    val p1 = t.filter(col("n") >= 2).select(explode(expr(
      "transform(sequence(1, n - 1), " +
        "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"))
      .as("pr"))
    val p2 = t.filter(col("n") >= 3).select(explode(expr(
      "transform(sequence(1, n - 2), " +
        "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 2)))"))
      .as("pr"))
    val pd = p1.union(p2).select(
      expr("element_at(split(pr, ' '), 1)").as("wa"),
      expr("element_at(split(pr, ' '), 2)").as("wb"))
    val sym = pd.union(pd.select(col("wb").as("wa"), col("wa").as("wb")))
    val vocab = IvfIndex.materialize(
      docs.select(explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w")).limit(topV)
        .select(col("w")))
    val cab = sym
      .join(broadcast(vocab.select(col("w").as("wa"))), "wa")
      .join(broadcast(vocab.select(col("w").as("wb"))), "wb")
      .groupBy(col("wa"), col("wb")).agg(count(lit(1)).as("c"))
    val ca = IvfIndex.materialize(
      cab.groupBy(col("wa")).agg(sum(col("c")).as("ca")))
    val tt = cab.agg(sum(col("c")).as("t"))
    val m = IvfIndex.materialize(
      cab.join(ca.select(col("wa"), col("ca").as("caa")), "wa")
        .join(ca.select(col("wa").as("wb"), col("ca").as("cbb")), "wb")
        .crossJoin(broadcast(tt))
        .select(col("wa").as("a"), col("wb").as("b"),
          expr("""greatest(0L, CAST(floor(
                 |  ln((1e0 * c * t) / (1e0 * caa * cbb)) * 1e6)
                 |  AS BIGINT))""".stripMargin).as("p"))
        .filter(col("p") > 0))
    var v = IvfIndex.materialize(
      ca.select(col("wa").as("wd"), lit(1000000L).as("v")))
    for (_ <- 1 to iters) {
      val u = m.join(v, col("wd") === col("b"))
        .groupBy(col("a")).agg(sum(col("p") * col("v")).as("u"))
      val mx = u.agg(max(col("u")).as("mx"))
      v = IvfIndex.materialize(
        u.crossJoin(broadcast(mx))
          .select(col("a").as("wd"),
            expr("u div (mx div 1000000 + 1)").as("v")))
    }
    v.join(ca.select(col("wa").as("wd"), col("ca").as("n_cooc")), "wd")
      .select(col("wd").as("word"), col("n_cooc"), col("v").as("sal_fp"))
  }

  /** The identical pipeline + unrolled power rounds as DuckDB CTEs over
    * a `(text)` relation (default the `documents` table; the graph-
    * embedding composition passes a walk-sentence CTE) — kept adjacent
    * so the two cannot drift. Ends selecting (word, n_cooc, sal_fp).
    */
  def oracleSql(
      topV: Int = 150, iters: Int = 6,
      srcTable: String = "documents"): String = {
    val head =
      s"""pt AS (
         |  SELECT string_split(text, ' ') AS toks,
         |    len(string_split(text, ' ')) AS n
         |  FROM $srcTable
         |), ppr AS (
         |  SELECT unnest(list_transform(range(1, n),
         |    i -> concat(toks[i], ' ', toks[i + 1]))) AS pr
         |  FROM pt WHERE n >= 2
         |  UNION ALL
         |  SELECT unnest(list_transform(range(1, n - 1),
         |    i -> concat(toks[i], ' ', toks[i + 2])))
         |  FROM pt WHERE n >= 3
         |), ppd AS (
         |  SELECT string_split(pr, ' ')[1] AS wa,
         |    string_split(pr, ' ')[2] AS wb
         |  FROM ppr
         |), psym AS (
         |  SELECT wa, wb FROM ppd UNION ALL SELECT wb, wa FROM ppd
         |), pvocab AS (
         |  SELECT w FROM (
         |    SELECT unnest(string_split(text, ' ')) AS w FROM $srcTable)
         |  GROUP BY w ORDER BY count(*) DESC, w LIMIT $topV
         |), pcab AS (
         |  SELECT wa, wb, CAST(count(*) AS BIGINT) AS c
         |  FROM psym
         |  JOIN pvocab va ON va.w = psym.wa
         |  JOIN pvocab vb ON vb.w = psym.wb
         |  GROUP BY wa, wb
         |), pca AS (
         |  SELECT wa, CAST(sum(c) AS BIGINT) AS ca FROM pcab GROUP BY wa
         |), ptt AS (
         |  SELECT CAST(sum(c) AS BIGINT) AS t FROM pcab
         |), pm AS MATERIALIZED (
         |  SELECT pcab.wa AS a, pcab.wb AS b,
         |    greatest(0, CAST(floor(
         |      ln((1e0 * c * t) / (1e0 * caa.ca * cbb.ca)) * 1e6)
         |      AS BIGINT)) AS p
         |  FROM pcab
         |  JOIN pca caa ON caa.wa = pcab.wa
         |  JOIN pca cbb ON cbb.wa = pcab.wb
         |  CROSS JOIN ptt
         |  WHERE greatest(0, CAST(floor(
         |      ln((1e0 * c * t) / (1e0 * caa.ca * cbb.ca)) * 1e6)
         |      AS BIGINT)) > 0
         |), pv0 AS (
         |  SELECT wa AS wd, CAST(1000000 AS BIGINT) AS v FROM pca
         |)""".stripMargin
    val rounds = (1 to iters).map { r =>
      s"""pu$r AS MATERIALIZED (
         |  SELECT pm.a AS wd, CAST(sum(pm.p * v.v) AS BIGINT) AS u
         |  FROM pm JOIN pv${r - 1} v ON v.wd = pm.b
         |  GROUP BY pm.a
         |), pmx$r AS (SELECT max(u) AS mx FROM pu$r),
         |pv$r AS MATERIALIZED (
         |  SELECT wd, u // (mx // 1000000 + 1) AS v
         |  FROM pu$r CROSS JOIN pmx$r
         |)""".stripMargin
    }
    val tail =
      s"""
         |SELECT v.wd AS word, pca.ca AS n_cooc, v.v AS sal_fp
         |FROM pv$iters v JOIN pca ON pca.wa = v.wd""".stripMargin
    (head +: rounds).mkString(",\n") + tail
  }
}
