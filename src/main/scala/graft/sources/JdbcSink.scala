package graft.sources

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.DataFrame

/** JDBC warehouse sink — the K4 parity path for users whose target is a
  * SQL store rather than the parquet [[PartitionedStore]] (reference:
  * row-at-a-time psycopg2 INSERTs into QuestDB,
  * /root/reference/docker/consumer.py:45-102,223).
  *
  * Spark-first shape: `df.write.format("jdbc")` appends whole partitions
  * through executor-side batched inserts (no driver-side row loop), and
  * the streaming variant is the standard `foreachBatch` recipe with a
  * commit-log table:
  *
  * {{{
  *   enriched.writeStream.foreachBatch(
  *     JdbcSink.exactlyOnceBatchWriter(url, props, "stock_data", "graft_commits", "q1"))
  * }}}
  *
  * GUARANTEE (stated precisely): Structured Streaming replays whole
  * micro-batches with the same batchId after a failure; the commit log
  * makes those replays no-ops, so the sink is exactly-once at
  * batch granularity — the same level every foreachBatch-JDBC recipe
  * provides. What it does NOT cover is a task-level retry *inside* a
  * half-written batch on a store without transactional appends; closing
  * that needs a staging table + atomic swap or idempotent upsert keys,
  * which is a property of the target schema, not of the engine.
  */
object JdbcSink {

  /** Batch append of `df` into `table` (executor-side batched inserts). */
  def writeBatch(
      df: DataFrame, url: String, props: Properties, table: String): Unit =
    df.write.mode("append").jdbc(url, table, props)

  /** Create the commit-log table if absent: (query_id, batch_id).
    * Existence is probed under the backend's unquoted-identifier folding
    * (as-is, UPPER for Derby/Oracle-style folding, lower for
    * Postgres/MySQL-style) so the CREATE is not re-attempted — and a
    * concurrent/racing CREATE of an existing table is tolerated anyway.
    */
  def ensureCommitLog(url: String, props: Properties, commitTable: String): Unit = {
    val conn = DriverManager.getConnection(url, props)
    try {
      def probe(): Boolean =
        Seq(commitTable, commitTable.toUpperCase, commitTable.toLowerCase)
          .distinct.exists { name =>
            val rs = conn.getMetaData.getTables(null, null, name, null)
            try rs.next() finally rs.close()
          }
      if (!probe()) {
        val st = conn.createStatement()
        try st.executeUpdate(
          s"CREATE TABLE $commitTable (query_id VARCHAR(64) NOT NULL, " +
            "batch_id BIGINT NOT NULL, PRIMARY KEY (query_id, batch_id))")
        catch {
          // lost a create race (or an identifier-folding variant the
          // probe missed): fine iff the table exists now
          case e: java.sql.SQLException => if (!probe()) throw e
        } finally st.close()
      }
    } finally conn.close()
  }

  private def alreadyCommitted(
      url: String, props: Properties, commitTable: String,
      queryId: String, batchId: Long): Boolean = {
    val conn = DriverManager.getConnection(url, props)
    try {
      val ps = conn.prepareStatement(
        s"SELECT 1 FROM $commitTable WHERE query_id = ? AND batch_id = ?")
      try {
        ps.setString(1, queryId); ps.setLong(2, batchId)
        val rs = ps.executeQuery()
        try rs.next() finally rs.close()
      } finally ps.close()
    } finally conn.close()
  }

  private def markCommitted(
      url: String, props: Properties, commitTable: String,
      queryId: String, batchId: Long): Unit = {
    val conn = DriverManager.getConnection(url, props)
    try {
      val ps = conn.prepareStatement(
        s"INSERT INTO $commitTable (query_id, batch_id) VALUES (?, ?)")
      try { ps.setString(1, queryId); ps.setLong(2, batchId); ps.executeUpdate() }
      finally ps.close()
    } finally conn.close()
  }

  /** foreachBatch function with replayed-batch suppression via the commit
    * log — pass to `writeStream.foreachBatch`. The commit log is ensured
    * ONCE here, at writer construction (it cannot disappear between
    * batches), not per micro-batch. Commit-log insert happens AFTER the
    * data append: a crash between the two replays the batch
    * (at-least-once edge), never silently drops it.
    */
  def exactlyOnceBatchWriter(
      url: String,
      props: Properties,
      table: String,
      commitTable: String,
      queryId: String): (DataFrame, Long) => Unit = {
    ensureCommitLog(url, props, commitTable)
    (df: DataFrame, batchId: Long) =>
      if (!alreadyCommitted(url, props, commitTable, queryId, batchId)) {
        writeBatch(df, url, props, table)
        markCommitted(url, props, commitTable, queryId, batchId)
      }
  }
}
