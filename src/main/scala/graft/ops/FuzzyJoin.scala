package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join (entity resolution / typo dedup)
  * via symmetric deletion neighborhoods — the SymSpell blocking scheme.
  *
  * Completeness (why the blocking loses nothing): fix an optimal edit
  * script between a and b with at most tau operations. Every substitution
  * deletes one aligned character from EACH string, every insertion deletes
  * one from b, every deletion one from a — so deleting at most tau
  * characters from each side reaches a common string. Hence
  * `lev(a,b) <= tau` implies the tau-deletion neighborhoods intersect, and
  * an equality join on neighborhood members yields every true pair as a
  * candidate. Exact `levenshtein` then verifies (the join is a superset:
  * two deletions meeting in the middle can witness distance up to 2*tau).
  *
  * Scale shape: neighborhood generation is per-row (no pairwise work) with
  * fan-out 1 + L + L(L-1)/2 for tau=2 on length-L strings; candidates come
  * from ONE equi-shuffle on the variant string; verification is a per-pair
  * O(L^2) dynamic program on the surviving candidates only. Production
  * SymSpell caps the fan-out by generating variants of a fixed-length
  * prefix only (paired with a length-band filter) — a recall-preserving
  * cap for tau<=2 when the prefix is >= tau longer than the common-prefix
  * bound; left un-capped here so the oracle equivalence is by
  * construction.
  */
object FuzzyJoin {

  /** All distinct strings reachable from column `__s` by deleting at most
    * 2 characters — the string itself ++ single deletions ++ ordered
    * double deletions. Pure codegen'd SQL (transform/flatten), no UDF.
    */
  private def delVariants2: Column = {
    val del1 = expr(
      """transform(sequence(1, length(__s)),
        |  i -> concat(substring(__s, 1, i - 1),
        |              substring(__s, i + 1, length(__s))))""".stripMargin)
    val del2 = expr(
      """CASE WHEN length(__s) >= 2 THEN
        |  flatten(transform(sequence(1, length(__s) - 1),
        |    i -> transform(sequence(i + 1, length(__s)),
        |      j -> concat(substring(__s, 1, i - 1),
        |                  substring(__s, i + 1, j - i - 1),
        |                  substring(__s, j + 1, length(__s))))))
        |ELSE array() END""".stripMargin)
    array_distinct(concat(array(col("__s")), del1, del2))
  }

  /** Distinct unordered pairs (a_name < b_name) of distinct values of
    * `strCol` within edit distance <= 2, with the exact distance.
    */
  def selfJoin(df: DataFrame, strCol: String): DataFrame = {
    val names = df
      .select(col(strCol).as("__s"))
      .filter(col("__s").isNotNull && length(col("__s")) >= 1)
      .distinct()
    val vars = names
      .select(col("__s").as("name"), explode(delVariants2).as("variant"))
    vars.as("a")
      .join(vars.as("b"),
        col("a.variant") === col("b.variant") && col("a.name") < col("b.name"))
      .select(col("a.name").as("a_name"), col("b.name").as("b_name"))
      .distinct()
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .filter(col("dist") <= 2)
  }
}
