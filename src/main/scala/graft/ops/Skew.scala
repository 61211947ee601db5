package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter grouping keys.
  *
  * A plain `groupBy(k)` hash-partitions every row of a hot key into ONE
  * reducer — at 100 TB a single skewed symbol/user can stall the stage.
  * AQE's skew handling only splits *join* partitions; for aggregations the
  * standard fix is salting: phase 1 aggregates on (key, salt) spreading the
  * hot key over `salts` reducers, phase 2 merges the per-salt partials.
  * Only decomposable aggregates (sum/count/min/max, and avg as sum+count)
  * can be salted this way; the helper exposes exactly those.
  *
  * The salt must be deterministic for retry-safety (a task retry must
  * re-salt a row identically), so it hashes the whole input row rather
  * than using rand().
  *
  * KNOWN LIMITATION: because the salt is a pure function of row content,
  * fully IDENTICAL duplicate rows of a hot key all land in the same salt
  * bucket and get no fan-out. That trade is deliberate: the alternative —
  * mixing in a per-partition row index (e.g. monotonically_increasing_id)
  * — is only retry-stable when the source partitioning and row order are
  * themselves stable (true for file scans, NOT true downstream of a
  * shuffle), and a retry-unstable salt breaks exactly-once sinks. Callers
  * with identical-duplicate-row skew should pre-aggregate the duplicates
  * first (groupBy all columns + count — itself content-hash-partitioned,
  * but each group collapses to one row so the hot reducer does O(dups)
  * trivial work, not O(dups) full aggregation states) and feed the
  * weighted rows here.
  */
object Skew {

  final case class SaltedAgg(alias: String, partial: Column => Column,
      merge: Column => Column)

  val sumAgg: String => SaltedAgg =
    c => SaltedAgg(c, sum, sum)
  val countAgg: SaltedAgg =
    SaltedAgg("count", _ => count(lit(1)), sum)
  val minAgg: String => SaltedAgg =
    c => SaltedAgg(c, min, min)
  val maxAgg: String => SaltedAgg =
    c => SaltedAgg(c, max, max)

  /** Two-phase salted aggregation.
    *
    * @param df     input
    * @param keys   grouping key columns
    * @param salts  salt fan-out (≈ number of reducers a hot key spreads to)
    * @param aggs   (inputCol -> SaltedAgg) pairs; output column = alias
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      salts: Int,
      aggs: Seq[(String, SaltedAgg)]): DataFrame = {
    require(salts > 0)
    val salted = df.withColumn(
      "__salt", pmod(hash(df.columns.map(col).toSeq: _*), lit(salts)))
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(
        aggs.head._2.partial(col(aggs.head._1)).as(s"__p_${aggs.head._2.alias}"),
        aggs.tail.map { case (c, a) => a.partial(col(c)).as(s"__p_${a.alias}") }: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(
        aggs.head._2.merge(col(s"__p_${aggs.head._2.alias}"))
          .as(aggs.head._2.alias),
        aggs.tail.map { case (_, a) =>
          a.merge(col(s"__p_${a.alias}")).as(a.alias)
        }: _*)
  }
}
