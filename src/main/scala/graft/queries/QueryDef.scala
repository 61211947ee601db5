package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator-query: a Spark DataFrame program plus (where the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle statement
  * over the same parquet tables. Column names must match exactly between the
  * two (the harness sorts columns by name before hashing).
  *
  * Plan intent: `PlanQualitySpec` sweeps EVERY registered query for
  * scale-hazard shapes (cartesian/nested-loop joins, unpartitioned windows).
  * A query whose *intended* physical shape trips a gate must declare that
  * intent here, with a justification — so a new query can never silently
  * skip the gate (the old spec-local whitelist could drift out of sync, and
  * did, in round 2).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    planIntent: PlanIntent = PlanIntent()) {

  /** Declare that this query intentionally plans a BroadcastNestedLoopJoin
    * (e.g. a cross join against a broadcast index-metadata/centroid frame
    * whose size is bounded by k ~ sqrt(n) or a constant, never by the
    * corpus). `why` must state the bound on the broadcast side.
    */
  def intendsNestedLoop(why: String): QueryDef =
    copy(planIntent = planIntent.copy(broadcastNestedLoop = Some(why)))

  /** Declare that this query intentionally plans a window with an empty
    * partitionSpec. `why` must state why the windowed frame stays tiny
    * (already limited, or bounded by wall-clock rather than data volume).
    */
  def intendsGlobalWindow(why: String): QueryDef =
    copy(planIntent = planIntent.copy(globalWindow = Some(why)))
}

/** Declared physical-plan shapes that would otherwise fail the plan gates,
  * each with the justification for why the shape is safe at 100 TB.
  */
final case class PlanIntent(
    broadcastNestedLoop: Option[String] = None,
    globalWindow: Option[String] = None)

object QueryDef {
  def sql(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  /** Rows-only check (no SQL-expressible oracle, e.g. approximate ops). */
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
