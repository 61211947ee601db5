package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent, cross-engine-deterministic numeric reductions.
  *
  * Summing doubles is order-dependent, so a parallel engine can't reproduce a
  * serial oracle bit-for-bit; and casting doubles to high-scale decimals is
  * itself engine-dependent (DuckDB quantizes via a double multiply, Spark via
  * exact binary expansion). The portable scheme used by every large
  * aggregation here:
  *
  *   1. quantize each term with `floor(x * 1e6)` — two IEEE-754 ops that are
  *      bit-identical in any engine;
  *   2. sum the resulting integers exactly (decimal(38,0) accumulator in
  *      Spark, int128 in DuckDB) — order-independent, no overflow until
  *      ~1e22 rows at 1e9-magnitude values;
  *   3. convert back with one correctly-rounded cast and one double divide.
  *
  * The defined semantics are "sum at fixed 6-decimal precision" — stable at
  * any parallelism, any partitioning, any scale factor.
  *
  * CALLER CONTRACT: keep the quantized sum below 2^53. The integer
  * accumulation never overflows, but converting an exact integer above
  * 2^53 back to double itself rounds — and engines round differently
  * there (DuckDB int128 vs JVM BigDecimal, observed 1-ulp divergence).
  * For large-magnitude terms, pre-scale (divide by a power of ten) so
  * `|sum(term)| * 1e6 < 9e15`, and name the column `*_scaled`.
  */
object Num {

  /** Exact fixed-point sum of a double column (6-decimal precision). */
  def dsum(c: Column): Column =
    sum(floor(c * lit(1e6)).cast(DecimalType(38, 0))).cast("double") / lit(1e6)

  def dsumSql(term: String): String =
    s"CAST(sum(CAST(floor(($term) * 1e6) AS BIGINT)) AS DOUBLE) / 1e6"

  /** Exact fixed-point average (null-skipping, like AVG). */
  def davg(c: Column): Column = dsum(c) / count(c)

  def davgSql(term: String): String =
    s"${dsumSql(term)} / count($term)"

  /** 2-decimal (money) variants for large-magnitude columns: the coarser
    * quantization keeps `sum * 1e2` under 2^53 through ~sf100 for
    * TPC-H-style revenue sums, where the 1e6 quantization would cross the
    * exact-double bound and hit engine-dependent int->double rounding.
    */
  def dsum2(c: Column): Column =
    sum(floor(c * lit(1e2)).cast(DecimalType(38, 0))).cast("double") / lit(1e2)

  def dsum2Sql(term: String): String =
    s"CAST(sum(CAST(floor(($term) * 1e2) AS BIGINT)) AS DOUBLE) / 1e2"

  def davg2(c: Column): Column = dsum2(c) / count(c)

  def davg2Sql(term: String): String =
    s"${dsum2Sql(term)} / count($term)"
}
