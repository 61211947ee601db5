package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Differentially-private count release via the discrete (two-sided
  * geometric) mechanism — the integer-valued Laplace analogue
  * (Ghosh/Roughgarden/Sundararajan 2009: the geometric mechanism is
  * universally utility-optimal for counts). Completes the privacy tier
  * next to k-anonymity / l-diversity / t-closeness: those audit a
  * release, this PERTURBS one with a calibrated ε guarantee.
  *
  * Mechanism: noisy_n = n + Z with P(Z = k) ∝ α^|k|, α = 9/10, i.e.
  * ε = ln(10/9) ≈ 0.105 per release (counts have sensitivity 1).
  *
  * Everything is exact int64, so both engines draw the IDENTICAL noise:
  *   - α-powers on a 2^59 fixed-point scale: A_0 = 2^59,
  *     A_k = (A_(k-1) * 9) div 10, until A_K = 0 (K ≈ 380 rows) —
  *     mechanism METADATA, constant-size, data-independent.
  *   - CDF of Z: P(Z ≤ k) = 1 - α^(k+1)/(1+α) for k ≥ 0, and
  *     α^(-k)/(1+α) for k < 0; with α = 9/10, 1/(1+α) = 10/19, so
  *     C_k = S - (A_(k+1)*10) div 19  /  (A_(-k)*10) div 19 — pure
  *     integer ops on the A table (max A*10 < 5.8e18 < 2^63).
  *   - the uniform draw is the 60-bit md5 prefix of the group key,
  *     halved into [0, 2^59); Z = the unique k with C_(k-1) ≤ u < C_k.
  *
  * Determinism caveat (stated, not hidden): hash-seeded noise makes the
  * release REPRODUCIBLE — required here for the cross-engine oracle and
  * the same trade every hash-threshold sampler in this repo makes. True
  * ε-DP against an adversary who knows the pipeline needs the hash
  * replaced by a secret-keyed PRF (swap `md5p60(key)` for
  * `md5p60(secret || key)`); the mechanism and its calibration are
  * unchanged.
  *
  * Scale shape: one hash agg for the counts, then a broadcast range
  * join against the ~760-row CDF table — no shuffle after the agg, at
  * any group count.
  */
object DpNoise {

  /** 2^59 — the fixed-point scale of the α-power table. */
  val Scale: Long = 1L << 59

  /** α^k on the 2^59 scale, index 0..K with A(K) = 0 (exclusive end
    * marker); identical to the oracle's recursive CTE.
    */
  lazy val alphaPowers: Vector[Long] = {
    val b = Vector.newBuilder[Long]
    var a = Scale
    while (a > 0) { b += a; a = a * 9 / 10 }
    b += 0L
    b.result()
  }

  /** The CDF rows (k, lo, hi): noise k is drawn when lo <= u < hi. */
  lazy val cdfRows: Vector[(Int, Long, Long)] = {
    val aPow = alphaPowers
    val kMax = aPow.length - 1 // A(kMax) = 0
    def a(i: Int): Long = if (i < aPow.length) aPow(i) else 0L
    def cdf(k: Int): Long =
      if (k >= 0) Scale - a(k + 1) * 10 / 19
      else a(-k) * 10 / 19
    (-kMax to kMax).map { k =>
      val lo = if (k == -kMax) 0L else cdf(k - 1)
      (k, lo, cdf(k))
    }.filter { case (_, lo, hi) => hi > lo }.toVector
  }

  /** The CDF table as a DataFrame (k, lo, hi) — broadcast-sized. */
  def cdfTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    cdfRows.toDF("k", "lo", "hi")
  }

  /** Add discrete-geometric noise to `counts` (columns: key: string,
    * n: long). Output: (key, n_noisy) — the true n is deliberately NOT
    * in the output (it is the secret being protected).
    */
  def release(counts: DataFrame): DataFrame = {
    val spark = counts.sparkSession
    counts
      .withColumn("u", expr("md5p60(key) div 2"))
      .join(broadcast(cdfTable(spark)),
        col("u") >= col("lo") && col("u") < col("hi"))
      .select(col("key"), (col("n") + col("k")).as("n_noisy"))
  }

  /** DuckDB twin of the whole mechanism over a `graft_counts`
    * (key, n) relation — recursive CTE for the α-powers, windowed lag
    * for the CDF intervals, the same range probe.
    */
  def oracleSql: String =
    s"""apow(k, a) AS (
       |  SELECT 0, CAST($Scale AS BIGINT)
       |  UNION ALL SELECT k + 1, (a * 9) // 10 FROM apow WHERE a > 0
       |), cdf0 AS (
       |  SELECT k,
       |    CASE WHEN k >= 0
       |      THEN $Scale - (COALESCE((SELECT a FROM apow x
       |                               WHERE x.k = cdf_k.k + 1), 0) * 10) // 19
       |      ELSE ((SELECT a FROM apow x WHERE x.k = -cdf_k.k) * 10) // 19
       |    END AS hi
       |  FROM (SELECT k FROM apow UNION SELECT -k FROM apow) cdf_k(k)
       |), cdf AS (
       |  SELECT k, COALESCE(lag(hi) OVER (ORDER BY k), 0) AS lo, hi
       |  FROM cdf0
       |)
       |SELECT key, n + k AS n_noisy
       |FROM (SELECT key, n,
       |        CAST(concat('0x', substr(md5(key), 1, 15)) AS BIGINT) // 2
       |          AS u
       |      FROM graft_counts) c
       |JOIN cdf ON c.u >= cdf.lo AND c.u < cdf.hi""".stripMargin
}
