package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Targeted row deletion from an at-rest parquet store — the
  * "right-to-be-forgotten" / retention-purge maintenance pass. At 100 TB
  * the only viable shape is FILE-PRUNED copy-on-write: find the files
  * that actually contain a doomed key and rewrite ONLY those; every
  * other byte of the store is untouched (this is precisely Delta/Iceberg
  * DELETE semantics, expressed on plain parquet).
  *
  *   1. one scan joins the store (with `_metadata.file_path` projected)
  *      against the broadcast delete-key set — LEFT SEMI, so it yields
  *      the affected file list (driver-side, bounded by the file count,
  *      in practice by the keys' locality);
  *   2. affected files are re-read (file-path pushdown prunes the scan
  *      to exactly those files), anti-joined against the keys, and the
  *      survivors appended as new files;
  *   3. the old files are deleted only after the append commits.
  *
  * Step 3 makes the swap non-atomic for concurrent readers (the window
  * where both old and new files exist double-counts survivors) — plain
  * parquet has no manifest to flip. Production stores put a table format
  * (Delta/Iceberg) or a partition-rename protocol on top; the
  * file-pruned rewrite underneath is identical.
  *
  * Clustering the store by the delete key (z-order or range layout, see
  * [[ZOrder]] / [[graft.sources.PartitionedStore]]) is what makes step 1
  * prune hard: scattered keys touch every file, clustered keys touch a
  * handful.
  */
object TargetedDelete {

  /** Delete every row of the parquet store at `path` whose `keyCol` is in
    * `keys` ((keyCol)-schema DataFrame), rewriting only affected files.
    * Returns (affectedFiles, totalFiles).
    */
  def deleteRows(
      spark: SparkSession,
      path: String,
      keyCol: String,
      keys: DataFrame): (Long, Long) = {
    val store = spark.read.parquet(path)
    val keySet = broadcast(keys.select(col(keyCol)).distinct())
    val withFile = store.withColumn("__file", col("_metadata.file_path"))
    val affected = withFile
      .join(keySet, Seq(keyCol), "left_semi")
      .select(col("__file")).distinct()
      .collect().map(_.getString(0))
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val total = {
      val it = fs.listFiles(p, true)
      var n = 0L
      while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    }
    if (affected.nonEmpty) {
      // file-path pushdown: only the affected files are re-read
      withFile
        .filter(col("__file").isin(affected.toSeq: _*))
        .join(keySet, Seq(keyCol), "left_anti")
        .drop("__file")
        .write.mode("append").parquet(path)
      affected.foreach(f =>
        fs.delete(new org.apache.hadoop.fs.Path(new java.net.URI(f)), false))
      // drop the session's cached file listing for the path: a reader
      // planning from the stale listing would hit the deleted files
      spark.catalog.refreshByPath(path)
    }
    (affected.length.toLong, total)
  }
}
