package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra-Gries heavy hitters as a mergeable Spark [[Aggregator]], plus the
  * two-pass exact-recount operator built on it.
  *
  * The sketch keeps at most k-1 (token, count) entries. Invariants (the
  * classic MG guarantees, independent of partition/merge order):
  *
  *   - NO FALSE NEGATIVES: every token with true frequency > n/k is in
  *     the final sketch;
  *   - estimate error: sketch_count in [true - n/k, true].
  *
  * The candidate SET depends on merge order (Spark's partial-aggregate
  * tree is nondeterministic), so the sketch alone is not oracle-stable.
  * [[exactHeavyHitters]] therefore re-counts the <= k-1 candidates
  * exactly in a second pass and keeps those with true count > n/k —
  * a fully DETERMINISTIC result (equal to the naive full-groupBy answer,
  * which is what the DuckDB oracle computes), at sketch cost:
  *
  *   - pass 1: one scan, map-side partial sketches of k-1 entries,
  *     merged into one k-1-entry state — no shuffle of the corpus, no
  *     full-vocabulary aggregation state (for n-gram vocabularies the
  *     full groupBy state is O(corpus); the sketch is O(k));
  *   - pass 2: broadcast the <= k-1 candidates, one filtered scan +
  *     grouped count over only the matching rows.
  */
object HeavyHitters {

  /** Mergeable Misra-Gries sketch over a string column; state is a
    * bounded map of at most k-1 entries.
    */
  final class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 2, "Misra-Gries needs k >= 2")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
      b.get(tok) match {
        case Some(c) => b.updated(tok, c + 1)
        case None if b.size < k - 1 => b.updated(tok, 1L)
        case None =>
          // decrement-all: drop zeros, every surviving count -1
          b.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
      }

    override def merge(
        b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
      val sum = b2.foldLeft(b1) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      }
      if (sum.size < k) sum
      else {
        // subtract the k-th largest count from everyone, drop non-positive
        // (the standard MG merge; preserves the error bound)
        val kth = sum.values.toSeq.sortBy(-_).apply(k - 1)
        sum.flatMap { case (t, c) => if (c > kth) Some(t -> (c - kth)) else None }
      }
    }

    override def finish(r: Map[String, Long]): Map[String, Long] = r

    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }

  /** The raw sketch over `df`'s `tok` column: one map of <= k-1 entries. */
  def sketch(df: DataFrame, k: Int, tok: String = "tok"): Map[String, Long] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(tok)).as[String]
      .select(new MisraGries(k).toColumn.name("sketch"))
      .head()
  }

  /** Tokens of `df.tok` whose exact count strictly exceeds n/k, with
    * their exact counts: (tok, cnt). Equal to the full-groupBy answer;
    * computed via sketch candidates + broadcast recount (see object doc).
    * Output comparison is exact-integer: cnt * k > n.
    */
  def exactHeavyHitters(df: DataFrame, k: Int, tok: String = "tok"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = df.count()
    val cands = sketch(df, k, tok).keys.toSeq.toDF(tok)
    df.select(col(tok))
      .join(broadcast(cands), Seq(tok))
      .groupBy(col(tok))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > n)
  }
}
