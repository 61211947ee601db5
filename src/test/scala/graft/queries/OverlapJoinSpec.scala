package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** The bin-fragmented interval-overlap join's dedup rule, exercised
  * directly on adversarial intervals: the bin-fragmented pair counts
  * must equal the naive quadratic join on random windows that straddle
  * bin boundaries, share start bins, nest, and touch at endpoints.
  * (q_overlap_join pins the real-table query against the DuckDB naive
  * join; this pins the RULE itself on shapes the table may not contain.)
  */
class OverlapJoinSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Bin-fragmented overlap pair count per key — the q_overlap_join
    * plan shape (32-unit bins, first-shared-bin dedup), over abstract
    * integer intervals.
    */
  private def fragmented(rows: Seq[(Long, Long, Long, Long)])
      : Map[Long, Long] = {
    import org.apache.spark.sql.functions._
    val w = rows.toDF("key", "id", "s", "e")
      .withColumn("sbin", expr("s div 32"))
      .withColumn("ebin", expr("e div 32"))
    val frag = w.withColumn("bin", explode(expr("sequence(sbin, ebin)")))
    val a = frag.select(col("key"), col("bin"), col("id").as("ka"),
      col("s").as("sa"), col("e").as("ea"), col("sbin").as("ba"))
    val b = frag.select(col("key"), col("bin"), col("id").as("kb"),
      col("s").as("sb"), col("e").as("eb"), col("sbin").as("bb"))
    a.join(b, Seq("key", "bin"))
      .filter(col("ka") < col("kb")
        && col("bin") === greatest(col("ba"), col("bb"))
        && col("sa") <= col("eb") && col("sb") <= col("ea"))
      .groupBy(col("key")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
  }

  private def naive(rows: Seq[(Long, Long, Long, Long)]): Map[Long, Long] =
    rows.groupBy(_._1).flatMap { case (k, rs) =>
      val n = (for {
        x <- rs; y <- rs
        if x._2 < y._2 && x._3 <= y._4 && y._3 <= x._4
      } yield 1).size.toLong
      if (n > 0) Some(k -> n) else None
    }

  test("boundary shapes: shared start bins, bin-straddlers, nesting, " +
      "endpoint touch") {
    val rows = Seq[(Long, Long, Long, Long)](
      (1, 1, 0, 31), (1, 2, 31, 40), // touch at the bin edge
      (1, 3, 10, 20), (1, 4, 12, 100), // nested + long straddler
      (1, 5, 64, 64), // degenerate point interval
      (1, 6, 63, 65), // straddles exactly one boundary
      (2, 7, 0, 200), (2, 8, 199, 400), (2, 9, 500, 600)) // far apart
    fragmented(rows) shouldBe naive(rows)
  }

  test("matches the naive join on random interval soups") {
    val rnd = new scala.util.Random(61)
    val rows = (0 until 400).map { i =>
      val s = rnd.nextInt(1000).toLong
      (rnd.nextInt(6).toLong, i.toLong, s, s + rnd.nextInt(150))
    }
    fragmented(rows) shouldBe naive(rows)
  }

  test("no duplicates even when pairs share MANY bins") {
    // two 10-bin-long intervals almost fully overlapping: they share
    // ~10 bins but must be counted exactly once
    val rows = Seq[(Long, Long, Long, Long)](
      (1, 1, 0, 320), (1, 2, 5, 325))
    fragmented(rows) shouldBe Map(1L -> 1L)
  }
}
