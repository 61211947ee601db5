package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — the validation gate a 100 TB ingest runs
  * before publishing a partition (dbt-test / Deequ territory), expressed
  * as plain aggregates:
  *
  *   - every ROW-LEVEL check (null fraction, range, set membership,
  *     format) is a conditional count folded into ONE aggregate over ONE
  *     scan of the table — adding a check adds a column to the agg, not
  *     a pass over the data;
  *   - uniqueness rides the same aggregate via count - count(DISTINCT)
  *     (Catalyst expands distinct aggregates in the same job);
  *   - referential integrity is a LEFT ANTI join against the referenced
  *     key set (broadcast when the dimension is small — the usual case).
  *
  * Output is a tiny (check, violations, passed) table — the thing a
  * pipeline gates on and a dashboard trends.
  */
object Expectations {

  /** One-scan row-level + uniqueness checks.
    *
    * @param rowChecks (name, violation predicate) — counted where true
    * @param uniqueCols columns that must be globally unique
    */
  def check(
      df: DataFrame,
      rowChecks: Seq[(String, Column)],
      uniqueCols: Seq[String] = Nil): DataFrame = {
    val aggs =
      rowChecks.map { case (n, viol) =>
        sum(when(viol, 1L).otherwise(0L)).as(n)
      } ++ uniqueCols.map { c =>
        (count(col(c)) - count_distinct(col(c))).as(s"${c}_unique")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val names = rowChecks.map(_._1) ++ uniqueCols.map(c => s"${c}_unique")
    one.select(explode(array(names.map(n =>
      struct(lit(n).as("check"), col(n).cast("long").as("violations"))): _*))
      .as("r"))
      .select(col("r.check").as("check"), col("r.violations").as("violations"),
        (col("r.violations") === 0L).as("passed"))
  }

  /** Referential-integrity check: rows of `df` whose `fkCol` has no match
    * in `dim.pkCol` (nulls don't count — pair with a nonnull row check).
    * Returns the same one-row (check, violations, passed) shape.
    */
  def refCheck(
      name: String,
      df: DataFrame,
      fkCol: String,
      dim: DataFrame,
      pkCol: String): DataFrame =
    df.filter(col(fkCol).isNotNull)
      .join(broadcast(dim.select(col(pkCol).as(fkCol)).distinct()),
        Seq(fkCol), "left_anti")
      .agg(count(lit(1)).cast("long").as("violations"))
      .select(lit(name).as("check"), col("violations"),
        (col("violations") === 0L).as("passed"))
}
