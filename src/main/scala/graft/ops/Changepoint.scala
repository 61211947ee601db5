package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUSUM single-changepoint location (Page 1954 / Pettitt-style mean
  * split): per series, the index t maximizing |n*cum_t - t*total| — the
  * integer-cleared form of argmax |cumsum(y - mean)| (multiplying
  * through by n removes the division, so the whole statistic stays in
  * exact int64 and both engines agree bit-for-bit). Complements the
  * reference-adjacent q_mean_shift: that flags LOCAL fixed-window
  * shifts; this locates the single most-likely global split.
  *
  * Scale shape: ONE exchange on the series key carries the ordered
  * cumulative sum, the full-partition totals frame, and the argmax
  * row_number — no second shuffle, no driver collect, O(1) state per
  * row. Int64 headroom (the PageRank/PcaPower convention):
  * |d| <= n^2 * y_max — cents quantization with y <= 5e4 admits ~13M
  * rows per series; beyond that, run per time-bucket or quantize
  * coarser.
  */
object Changepoint {

  /** One row per series: (sym, n, cp_t, cp_ts, cusum_fp) where cp_t is
    * the 1-based index of the argmax (earliest on ties) and cusum_fp
    * the signed statistic there. `fpExpr` maps the value column to the
    * int64 fixed-point series (default: cents).
    */
  def locate(
      df: DataFrame, sym: String, ts: String, id: String, value: String,
      fpExpr: String => String = v => s"CAST(floor($v * 1e2 + 5e-1) AS BIGINT)")
      : DataFrame = {
    val wo = Window.partitionBy(col("symbol")).orderBy(col("ts"), col("id"))
    val wAll = Window.partitionBy(col("symbol"))
    df.select(col(sym).as("symbol"), col(ts).as("ts"), col(id).as("id"),
        expr(fpExpr(value)).as("y"))
      .withColumn("t", row_number().over(wo).cast("long"))
      .withColumn("cum", sum(col("y")).over(
        wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("total", sum(col("y")).over(wAll))
      .withColumn("d", col("n") * col("cum") - col("t") * col("total"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("symbol")).orderBy(abs(col("d")).desc, col("t").asc)))
      .filter(col("rnk") === 1)
      .select(col("symbol"), col("n"), col("t").as("cp_t"),
        col("ts").as("cp_ts"), col("d").as("cusum_fp"))
  }
}
