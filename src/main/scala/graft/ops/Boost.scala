package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gradient-boosted regression stumps (Friedman 2001, squared loss) on a
  * quantized 1-d feature — the boosting loop over the depth-1 base
  * learner of `q_stump`.
  *
  * Exactness: rows enter as (s, y_fp) with s the quantized integer
  * feature bucket and y_fp the 1e3-fixed-point target. Because every row
  * in a bucket sits on the same side of every threshold, the ENTIRE
  * boosting state is the bucket frame (s, n, sr = Σ residual_fp): a
  * round's best split maximizes the SSE-gain surrogate
  * cs²//cn + (S−cs)²//(N−cn) over prefix sums, its shrunk leaf values
  * are (mean div 2) (ν = 1/2, integer truncation — toward zero on both
  * engines), and the residual update subtracts n·leaf from each
  * bucket's sum. All pure int64 algebra, so the DuckDB oracle unrolls
  * the same recurrence ([[oracleSql]]) and the result is hash-exact.
  *
  * Scale shape: ONE corpus pass builds the bucket frame (bounded by the
  * feature's value range, never the corpus); it is materialized as a
  * local relation ([[IvfIndex.materialize]] — metadata-sized by the
  * same argument as a codebook) and every round is algebra over that
  * frame: prefix window, broadcast 1-row totals, TakeOrdered argmax.
  * The corpus is never touched again.
  *
  * Headroom: |cs| <= N·2e3 ⇒ cs² < 2^63 bounds the labelled set at
  * N ~ 1.5e6 rows at the 1e3 target scale; above that drop the target
  * scale (the loss ordering is scale-invariant).
  */
object Boost {

  /** `sc`: (s BIGINT bucket, y_fp BIGINT target). Returns the model —
    * one row per round: (round, split_at, left_fp, right_fp, gain_fp).
    */
  def train(sc: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"need at least one round, got $rounds")
    val b0 = IvfIndex.materialize(
      sc.groupBy(col("s"))
        .agg(count(lit(1)).as("n"), sum(col("y_fp")).as("sr")))
    // a single bucket admits no split (the nn - cn > 0 filter empties
    // every candidate set) — fail loudly instead of returning an
    // empty/rounds-deficient model; b0 is a local relation, the count
    // is free
    require(b0.count() >= 2,
      "boosting needs >= 2 feature buckets; the quantized feature is " +
        "constant — widen the quantization or pick another projection")
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var b = b0
    var model: DataFrame = null
    for (t <- 1 to rounds) {
      val tot = b.agg(sum(col("n")).as("nn"), sum(col("sr")).as("ss"))
      val best = b
        .withColumn("cn", sum(col("n")).over(w))
        .withColumn("cs", sum(col("sr")).over(w))
        .crossJoin(broadcast(tot))
        .filter(col("nn") - col("cn") > 0)
        .select(col("s").as("split_at"),
          expr("(cs * cs) div cn + ((ss - cs) * (ss - cs)) div (nn - cn)")
            .as("gain_fp"),
          expr("(cs div cn) div 2").as("lv"),
          expr("((ss - cs) div (nn - cn)) div 2").as("rv"))
        .orderBy(col("gain_fp").desc, col("split_at")).limit(1)
      // 1-row argmax metadata: materialize so the model row and the
      // residual update share one computation (and the round chain
      // stays a local-relation fold, not a reexecuted lineage)
      val bestM = IvfIndex.materialize(best)
      val row = bestM.select(lit(t).as("round"), col("split_at"),
        col("lv").as("left_fp"), col("rv").as("right_fp"), col("gain_fp"))
      model = if (model == null) row else model.unionAll(row)
      b = b.crossJoin(broadcast(bestM))
        .select(col("s"), col("n"),
          (col("sr") - col("n") *
            when(col("s") <= col("split_at"), col("lv"))
              .otherwise(col("rv"))).as("sr"))
    }
    model
  }

  /** DuckDB twin: the same recurrence unrolled round-by-round in chained
    * CTEs. Caller supplies the `b0` CTE body (SELECT s, n, sr ...).
    */
  def oracleSql(b0Select: String, rounds: Int): String = {
    val ctes = (1 to rounds).map { t =>
      s"""cum$t AS (
         |  SELECT s, n, sr,
         |    CAST(sum(n) OVER (ORDER BY s
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cn,
         |    CAST(sum(sr) OVER (ORDER BY s
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cs
         |  FROM b${t - 1}
         |), tot$t AS (
         |  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(sr) AS BIGINT) AS ss
         |  FROM b${t - 1}
         |), best$t AS (
         |  SELECT s AS split_at,
         |    (cs * cs) // cn + ((ss - cs) * (ss - cs)) // (nn - cn)
         |      AS gain_fp,
         |    (cs // cn) // 2 AS lv,
         |    ((ss - cs) // (nn - cn)) // 2 AS rv
         |  FROM cum$t CROSS JOIN tot$t WHERE nn - cn > 0
         |  ORDER BY gain_fp DESC, split_at LIMIT 1
         |), b$t AS (
         |  SELECT b.s, b.n,
         |    b.sr - b.n * (CASE WHEN b.s <= x.split_at THEN x.lv ELSE x.rv
         |      END) AS sr
         |  FROM b${t - 1} b CROSS JOIN best$t x
         |)""".stripMargin
    }.mkString(",\n")
    val out = (1 to rounds).map { t =>
      s"""SELECT $t AS round, split_at, lv AS left_fp, rv AS right_fp,
         |  gain_fp FROM best$t""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH b0 AS (
       |$b0Select
       |),
       |$ctes
       |$out""".stripMargin
  }
}
