package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator-query: a Spark DataFrame program plus (where the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle statement
  * over the same parquet tables. Column names must match exactly between the
  * two (the harness sorts columns by name before hashing).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  /** Rows-only check (no SQL-expressible oracle, e.g. approximate ops). */
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
