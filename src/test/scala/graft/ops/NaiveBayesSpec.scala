package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Model-quality check the oracle gate can't express: on a corpus whose
  * classes have genuinely distinct token distributions, the classifier
  * must actually separate them (the driver's word-soup corpus only pins
  * the arithmetic). Also pins determinism under repartitioning — the
  * fixed-point scores make the argmax independent of physical layout.
  */
class NaiveBayesSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // three classes with 80% class-specific vocabulary, 20% shared noise
  private def corpus: Seq[(Long, String, String)] = {
    val shared = (0 until 20).map(i => s"common$i")
    def doc(id: Long, cls: String, vocab: Int => String): (Long, String, String) = {
      val specific = (0 until 16).map(j => vocab(((id * 31 + j * 7) % 40).toInt))
      val noise = (0 until 4).map(j => shared(((id * 13 + j * 11) % 20).toInt))
      (id, cls, (specific ++ noise).mkString(" "))
    }
    (0L until 300L).map { id =>
      id % 3 match {
        case 0 => doc(id, "sport", i => s"sport_w$i")
        case 1 => doc(id, "tech", i => s"tech_w$i")
        case _ => doc(id, "food", i => s"food_w$i")
      }
    }
  }

  test("separable classes are recovered with >= 95% accuracy on the held-out half") {
    val docs = corpus.toDF("doc_id", "label", "text")
    val pred = NaiveBayes.classify(docs, "doc_id", "label", "text",
      trainPred = col("doc_id") % 2 === 0, testPred = col("doc_id") % 2 === 1)
    val rows = pred.select($"true_label", $"pred_label").as[(String, String)].collect()
    rows.length shouldBe 150
    val acc = rows.count { case (t, p) => t == p }.toDouble / rows.length
    acc should be >= 0.95
  }

  test("scores and predictions are identical under repartitioning") {
    val docs = corpus.toDF("doc_id", "label", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      NaiveBayes.classify(df, "doc_id", "label", "text",
        trainPred = col("doc_id") % 2 === 0, testPred = col("doc_id") % 2 === 1)
        .orderBy($"doc_id")
        .as[(Long, String, String, Long)].collect().toSeq
    run(docs.repartition(1)) shouldBe run(docs.repartition(13))
  }
}
