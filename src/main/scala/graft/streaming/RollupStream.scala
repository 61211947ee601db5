package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Rollup

/** Streaming twin of [[graft.ops.Rollup]]: a `foreachBatch` sink that
  * maintains an at-rest per-key rollup as micro-batches arrive — the
  * standing materialized view over a stream.
  *
  * Exactly-once without a table format: each batch writes a NEW
  * versioned snapshot `v=<batchId>` (merge of the latest snapshot BELOW
  * this batch id with the batch's summary). If the engine retries a
  * batch after a mid-write failure, the retry recomputes from the same
  * predecessor and overwrites the same version — idempotent by
  * construction, because a snapshot's content is a pure function of
  * (predecessor, batch). Readers take the max version; old versions are
  * pruned after `keepVersions`.
  *
  * Per batch the work is O(batch + keys): the batch is summarized alone
  * and merged against the keys-sized snapshot — history is never
  * rescanned, same contract as the batch-side `Rollup.merge`.
  */
object RollupStream {

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Snapshot versions present under `storeDir`, ascending. */
  def versions(spark: SparkSession, storeDir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(storeDir)
    val f = fs(spark, storeDir)
    if (!f.exists(p)) Seq.empty
    else
      f.listStatus(p).toSeq
        .map(_.getPath.getName)
        .filter(_.startsWith("v="))
        .map(_.stripPrefix("v=").toLong)
        .sorted
  }

  /** The current rollup (latest snapshot), or None before the first
    * batch commits.
    */
  def snapshot(spark: SparkSession, storeDir: String): Option[DataFrame] =
    versions(spark, storeDir).lastOption
      .map(v => spark.read.parquet(s"$storeDir/v=$v"))

  /** One batch of maintenance — public so the exactly-once retry
    * contract is directly testable.
    */
  def processBatch(
      storeDir: String,
      keys: Seq[String],
      valueCol: String,
      keepVersions: Int = 3)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val delta = Rollup.summarize(batch, keys, valueCol)
    // predecessor = latest snapshot STRICTLY below this batch id: a retry
    // of batch N must not read the partial/complete v=N it is replacing
    val pred = versions(spark, storeDir).filter(_ < batchId).lastOption
    val merged = pred match {
      case Some(v) => Rollup.merge(spark.read.parquet(s"$storeDir/v=$v"), delta)
      case None => delta
    }
    merged.write.mode("overwrite").parquet(s"$storeDir/v=$batchId")
    val f = fs(spark, storeDir)
    versions(spark, storeDir).filter(_ < batchId).dropRight(keepVersions - 1)
      .foreach(v =>
        f.delete(new org.apache.hadoop.fs.Path(s"$storeDir/v=$v"), true))
  }

  /** Start the maintenance sink over a streaming frame. */
  def start(
      input: DataFrame,
      storeDir: String,
      keys: Seq[String],
      valueCol: String,
      checkpointDir: String,
      keepVersions: Int = 3): StreamingQuery =
    input.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(processBatch(storeDir, keys, valueCol, keepVersions) _)
      .start()
}
