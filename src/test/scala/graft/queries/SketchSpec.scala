package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, TestSpark}

/** Sketch/statistics tier contracts beyond the oracle hash-match:
  * KMV's estimate quality and MERGE algebra, winnowing's shared-run
  * guarantee and density, sequential-pattern definition parity, and
  * Welch/assortativity serial cross-checks.
  */
class SketchSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"

  test("q_kmv: estimate within 30% of exact once the sketch saturates, " +
      "exact below k") {
    val rows = SparkEntry.queries("q_kmv")(spark, sfDir).collect()
    rows should not be empty
    rows.foreach { r =>
      val (nExact, skSize, est) = (r.getLong(1), r.getLong(2), r.getLong(4))
      if (skSize < graft.ops.Kmv.K) {
        est shouldBe nExact // sketch holds everything: exact count
      } else {
        skSize shouldBe graft.ops.Kmv.K.toLong
        withClue(s"${r.getString(0)}: est=$est exact=$nExact") {
          // k=64 gives rse ~ 1/sqrt(62) ~ 12.7%; 30% is > 2 sigma
          math.abs(est - nExact).toDouble / nExact should be < 0.30
        }
      }
    }
  }

  test("KMV merge algebra: k smallest of the union == sketch of the " +
      "concatenated stream (mergeable-summaries property)") {
    import spark.implicits._
    val k = graft.ops.Kmv.K
    // two deterministic disjoint-ish streams with overlap
    val s1 = (0 until 500).map(i => s"u$i")
    val s2 = (300 until 900).map(i => s"u$i")
    def sketch(xs: Seq[String]): Seq[Long] = {
      val df = xs.toDF("v")
        .select(expr("md5p60(v)").as("h")).distinct()
      df.withColumn("rk",
          row_number().over(Window.orderBy(col("h"))))
        .filter(col("rk") <= k)
        .orderBy("h").collect().map(_.getLong(0)).toSeq
    }
    val sk1 = sketch(s1)
    val sk2 = sketch(s2)
    // merge = k smallest DISTINCT values of the two sketches' union
    val merged = (sk1 ++ sk2).distinct.sorted.take(k)
    val direct = sketch(s1 ++ s2)
    merged shouldBe direct
  }

  test("q_winnow: every shared >= 6-token run yields a shared " +
      "fingerprint; density is bounded") {
    val rows = SparkEntry.queries("q_winnow")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    rows should not be empty
    // density: winnowing keeps at most one fingerprint per window
    // position, i.e. n_fp <= n_windows <= n_tokens
    // exact duplicates (the generator plants ~0.2%) share ALL
    // fingerprints — find at least one duplicated fp_csv
    val byCsv = rows.values.groupBy(_._2)
    byCsv.exists(_._2.size > 1) shouldBe true
  }

  test("winnowing guarantee on a planted pair: two docs sharing a " +
      "6-token run share a fingerprint") {
    import spark.implicits._
    // run the exact q_winnow pipeline over a synthetic 2-doc table
    val shared = "alpha beta gamma delta epsilon zeta eta" // 7 tokens
    val docs = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"nine eight $shared seven")).toDF("doc_id", "text")
    val tok = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", expr("size(toks)"))
    val hh = tok
      .select(col("doc_id"), (col("n") - 2).cast("long").as("n_sh"),
        col("toks"), explode(expr("sequence(1, n - 2)")).as("pos"))
      .select(col("doc_id"), col("pos"), col("n_sh"),
        expr("md5p60(concat_ws(' ', slice(toks, pos, 3)))").as("h"))
    val wm = hh.withColumn("wmin", min(col("h")).over(
      Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(0, 3)))
    val fp = wm.filter(col("pos") <= greatest(lit(1L), col("n_sh") - 3))
      .select(col("doc_id"), col("wmin")).distinct().collect()
      .groupBy(_.getLong(0)).map { case (d, rs) =>
        d -> rs.map(_.getLong(1)).toSet }
    // a shared run of w+k-1 = 4+3-1 = 6+ tokens contains a full common
    // window of shingles -> its min is selected in both docs
    (fp(1L) intersect fp(2L)) should not be empty
  }

  test("q_seq_patterns matches a serial definition at sf0.001") {
    val got = SparkEntry.queries("q_seq_patterns")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // serial reference over collected events
    val ev = graft.model.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val types = ev.map(_._2).distinct
    val want = (for {
      a <- types; b <- types if a != b
    } yield {
      val sup = byUser.count { case (_, rows) =>
        val ta = rows.filter(_._2 == a).map(_._3)
        val tb = rows.filter(_._2 == b).map(_._3)
        ta.nonEmpty && tb.nonEmpty && ta.min < tb.max
      }
      (a, b) -> sup.toLong
    }).filter(_._2 > 0).toMap
    got shouldBe want
  }

  test("q_welch: t2 and df match a serial double computation") {
    val r = SparkEntry.queries("q_welch")(spark, "/root/testdata/sf0.001")
      .head
    val cents = graft.model.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"),
        expr("CAST(floor(value * 1e2 + 5e-1) AS BIGINT)").as("c"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val g1 = cents.filter(_._1 == "click").map(_._2)
    val g2 = cents.filter(_._1 == "view").map(_._2)
    def mv(g: Array[Long]): (Double, Double) = {
      val n = g.length.toDouble
      val m = g.sum / n
      val v = g.map(x => (x - m) * (x - m)).sum / (n - 1)
      (m, v)
    }
    val (m1, v1) = mv(g1); val (m2, v2) = mv(g2)
    val t2 = (m1 - m2) * (m1 - m2) / (v1 / g1.length + v2 / g2.length)
    // quantized comparison (the engine chain orders ops differently
    // from this reference, so allow 1 ulp at the 1e6 scale)
    math.abs(r.getAs[Long]("t2_fp") - math.floor(t2 * 1e6).toLong) should be <= 2L
  }

  test("q_assortativity r is in [-1e6, 1e6] and matches the Pearson " +
      "identity on the symmetric edge list") {
    val r = SparkEntry.queries("q_assortativity")(
      spark, "/root/testdata/sf0.001").head
    val (m, sxy, sx, sxx) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val rfp = r.getAs[Long]("r_fp")
    rfp should be >= -1000000L
    rfp should be <= 1000000L
    val expect = math.floor(
      (m.toDouble * sxy - sx.toDouble * sx) /
        (m.toDouble * sxx - sx.toDouble * sx) * 1e6).toLong
    rfp shouldBe expect
  }

  test("q_transitivity is consistent with q_triangles' per-node totals") {
    val r = SparkEntry.queries("q_transitivity")(
      spark, "/root/testdata/sf0.001").head
    val (nTri, nWedge) = (r.getLong(0), r.getLong(1))
    nTri should be > 0L
    nWedge should be >= 3 * nTri // every triangle contributes 3 wedges
    r.getAs[Long]("trans_fp") shouldBe (3 * nTri * 1000000L) / nWedge
  }
}
