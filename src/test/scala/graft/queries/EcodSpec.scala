package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** ECOD outlier scoring (q_ecod): serial ECDF reference on a planted
  * fixture (the query fn runs against a temp table dir), the
  * planted-outlier-wins property, and the constant-dimension null case.
  */
class EcodSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixtureDir(vecs: Seq[(Long, Seq[Float])]): String = {
    val dir = java.nio.file.Files.createTempDirectory("ecod_fix").toString
    vecs.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "embedding", "CAST(0 AS INT) AS label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def run(vecs: Seq[(Long, Seq[Float])]): Map[Long, (Long, Long, Long)] =
    graft.SparkEntry.queries("q_ecod")(spark, fixtureDir(vecs))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  /** Serial reference: per-dim tie-aware ECDF tails, quantized -ln. */
  private def serialEcod(
      vecs: Seq[(Long, Seq[Float])]): Map[Long, (Long, Long, Long)] = {
    val n = vecs.length
    val d = vecs.head._2.length
    vecs.map { case (id, v) =>
      val terms = (0 until d).map { j =>
        val x = v(j).toDouble
        val col = vecs.map(_._2(j).toDouble)
        val cle = col.count(_ <= x)
        val cge = col.count(_ >= x)
        val tl = math.floor(-math.log(cle * 1.0 / n) * 1e6).toLong
        val tr = math.floor(-math.log(cge * 1.0 / n) * 1e6).toLong
        (tl, tr)
      }
      val l = terms.map(_._1).sum
      val r = terms.map(_._2).sum
      id -> (l, r, math.max(l, r))
    }.toMap
  }

  test("matches the serial ECDF reference, ties included") {
    val vecs = Seq[(Long, Seq[Float])](
      (1L, Seq(0.1f, 2.0f)), (2L, Seq(0.1f, 1.0f)), (3L, Seq(0.3f, 1.0f)),
      (4L, Seq(0.7f, 0.5f)), (5L, Seq(0.3f, 9.0f)))
    run(vecs) shouldBe serialEcod(vecs)
  }

  test("a planted extreme point gets the top score") {
    val cloud = (1L to 20L).map(i =>
      (i, Seq((i % 5).toFloat / 10f, (i % 7).toFloat / 10f)))
    val planted = (99L, Seq(50f, -50f))
    val got = run(cloud :+ planted)
    val top = got.maxBy(_._2._3)._1
    top shouldBe 99L
  }

  test("constant dimensions contribute zero (every tail is the full mass)") {
    val vecs = (1L to 6L).map(i => (i, Seq(1.5f, -2f)))
    run(vecs).values.foreach { case (l, r, o) =>
      l shouldBe 0L; r shouldBe 0L; o shouldBe 0L
    }
  }
}
