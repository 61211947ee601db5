package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Property checks for the round-5 diagnostics tier (q_acf,
  * q_changepoint, q_data_card) beyond the DuckDB hash gate: range
  * invariants, and independent serial recomputation of the changepoint
  * and the order-statistic medians on the real sf0.001 tables.
  */
class TimeSeriesDiagnosticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q_acf: every coefficient is in [-1, 1] and lags are 1..3") {
    val rows = run("q_acf").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lagK = r.getAs[Int]("lag_k")
      assert(lagK >= 1 && lagK <= 3)
      if (!r.isNullAt(r.fieldIndex("acf"))) {
        val a = r.getAs[Double]("acf")
        assert(a >= -1.0 - 1e-12 && a <= 1.0 + 1e-12, s"acf out of range: $a")
      }
    }
  }

  test("q_changepoint: one row per symbol, argmax matches a serial replay") {
    val got = run("q_changepoint").collect()
      .map(r => r.getAs[String]("symbol") ->
        ((r.getAs[Long]("cp_t"), r.getAs[Long]("cusum_fp"), r.getAs[Long]("n"))))
      .toMap
    val series = graft.model.Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts"), col("event_id"),
        expr("CAST(floor(value * 1e2 + 5e-1) AS BIGINT)").as("y"))
      .collect()
      .map(r => (r.getAs[String](0), r.getAs[java.sql.Timestamp](1),
        r.getAs[Long](2), r.getAs[Long](3)))
      .groupBy(_._1)
    assert(got.keySet == series.keySet)
    series.foreach { case (sym, rs) =>
      val ys = rs.sortBy(r => (r._2.getTime, r._3)).map(_._4)
      val n = ys.length.toLong
      val total = ys.sum
      var cum = 0L
      var bestT = 0L
      var bestD = 0L
      var bestAbs = -1L
      ys.zipWithIndex.foreach { case (y, i) =>
        cum += y
        val d = n * cum - (i + 1) * total
        if (math.abs(d) > bestAbs) { bestAbs = math.abs(d); bestT = i + 1; bestD = d }
      }
      assert(got(sym) == ((bestT, bestD, n)), s"mismatch for $sym")
    }
  }

  test("Changepoint.locate: a planted mean shift is located at the shift") {
    import spark.implicits._
    // 40 rows of 100 cents then 40 rows of 200 cents -> argmax |D| at t=40
    val df = (1 to 80).map(i =>
        (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"),
          if (i <= 40) 1.00 else 2.00))
      .toDF("event_id", "ts", "value")
      .withColumn("event_type", lit("planted"))
    val row = graft.ops.Changepoint
      .locate(df, "event_type", "ts", "event_id", "value")
      .collect()
    assert(row.length == 1)
    assert(row.head.getAs[Long]("cp_t") == 40L)
    // D_40 = n*cum_40 - 40*total = 80*4000 - 40*12000 = -160000
    assert(row.head.getAs[Long]("cusum_fp") == -160000L)
  }

  test("q_data_card: medians match a serial order-statistic recomputation") {
    val got = run("q_data_card").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("median_tokens"),
          r.getAs[Long]("p90_tokens"))))
      .toMap
    val docs = graft.model.Tables.documents(spark, sfDir)
      .select(col("lang"), col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .groupBy(r => (r._1, r._2))
    assert(got.keySet == docs.keySet)
    docs.foreach { case (key, rs) =>
      val sorted = rs.sortBy(r => (r._4, r._3)).map(_._4)
      val n = sorted.length
      val med = sorted((n + 1) / 2 - 1)
      val p90 = sorted((9 * n + 9) / 10 - 1)
      assert(got(key) == ((n.toLong, med, p90)), s"mismatch for $key")
    }
  }
}
