package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / ordering / packing for training-data
  * preparation, as a reusable library surface (the oracle queries
  * `q_sample_docs` / `q_shuffle_order` / `q_pack_bins` delegate here).
  *
  * Everything is keyed on a stable md5 hash of the id — NOT rand() — so
  * results are identical at any parallelism, on any retry, and across
  * engines; ordering and packing are SHARD-LOCAL (dataloaders consume
  * shards independently), so there is no global sort anywhere.
  *
  * Requires `md5p60` (GraftExtensions / Md5Prefix60.register).
  */
object Sharding {

  /** Stable per-row 0..99 bucket from the id. */
  def hashBucket(id: String): Column =
    expr(s"md5p60(CAST($id AS STRING)) % 100")

  /** Hash-Bernoulli stratified sample: keep a row iff its bucket falls
    * below `ratePercent` (a per-row Column, e.g.
    * `when($"lang" === "en", 20).otherwise(50)`). Appends the `bucket`
    * column for auditability.
    */
  def stratifiedSample(df: DataFrame, id: String, ratePercent: Column): DataFrame =
    df.withColumn("bucket", hashBucket(id))
      .filter(col("bucket") < ratePercent)

  /** Deterministic training order: (input columns, shard, rank_in_shard).
    * Rank is PER SHARD over the hash order — reproducible shuffle without
    * a global sort.
    */
  def shuffleOrder(df: DataFrame, id: String, shards: Int): DataFrame = {
    val w = Window.partitionBy(col("__hv") % shards)
      .orderBy(col("__hv"), col(id))
    df.withColumn("__hv", expr(s"md5p60(CAST($id AS STRING))"))
      .withColumn("shard", col("__hv") % shards)
      .withColumn("rank_in_shard", row_number().over(w).cast("long"))
      .drop("__hv")
  }

  /** Sequence packing into fixed token-budget bins: shard-locally, rows in
    * hash order accumulate `sizeCol` until the budget rolls over. Output
    * appends (shard, cum_tokens, bin_id); each shard packs independently,
    * so the operator scales with shards and needs no sequential pass.
    */
  def packBins(
      df: DataFrame, id: String, sizeCol: String,
      shards: Int, budget: Long): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("__hv"), col(id))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("__hv", expr(s"md5p60(CAST($id AS STRING))"))
      .withColumn("shard", col("__hv") % shards)
      .withColumn("cum_tokens", sum(col(sizeCol)).over(w))
      .withColumn("bin_id", expr(s"(cum_tokens - 1) div $budget"))
      .drop("__hv")
  }
}
