package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkEntry, TestSpark}

/** Duffield-Lund-Thorup edge case: with n <= k candidates the (k+1)-th
  * priority does not exist and DLT defines tau = 0, w_hat = w — the
  * sample is the whole population and the estimator is exact. The
  * pre-fix plan produced ZERO rows here (empty tau frame annihilated
  * the cross join).
  */
class PrioritySampleSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  test("n <= k yields the whole population with w_hat = w and zero error") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_prio").toString
    val docs = (1L to 5L).map(i =>
      (i, s"text $i", "en", "web", 10L * i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val out = SparkEntry.queries("q_priority_sample")(spark, dir)
        .orderBy("doc_id").collect()
      out.length shouldBe 5
      val exact = (1L to 5L).map(10L * _).sum
      out.foreach { r =>
        val w = r.getAs[Long]("w")
        r.getAs[Long]("w_hat_fp") shouldBe w * 100
        r.getAs[Long]("est_total_fp") shouldBe exact * 100
        r.getAs[Long]("exact_total") shouldBe exact
        r.getAs[Long]("err_fp") shouldBe 0L
      }
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir))
  }
}
