package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier — the fastText-style
  * quality/domain classifier every corpus-curation pipeline trains on a
  * labelled subset and applies to the whole crawl.
  *
  * Determinism: every `ln` is quantized to `floor(x * 1e6)` BEFORE any
  * summation (the `Num`/`LmQueries` scheme), so document scores are exact
  * integer sums and the prediction is reproducible cross-engine
  * (oracle-gated by `q_nb_classify`); argmax ties break to the
  * lexicographically smallest class.
  *
  * Scale shape (100 TB audit): the dense model is vocab x #classes rows —
  * vocabulary-bounded, independent of corpus size; class totals, priors
  * and the vocab size are broadcast scalar frames; scoring is one shuffled
  * hash join on token followed by a partial-aggregable integer sum, and
  * the per-doc argmax is `min(struct(-score, class))` — never a window.
  * Tokens unseen in training drop out of scoring identically everywhere.
  */
object NaiveBayes {

  /** Train on `docs` rows matching `trainPred`, score rows matching
    * `testPred`. `docs` must have (idCol, labelCol, textCol); tokens are
    * whitespace-split. Returns (idCol, true_label, pred_label, score_fp).
    */
  def classify(
      docs: DataFrame, idCol: String, labelCol: String, textCol: String,
      trainPred: Column, testPred: Column): DataFrame = {
    val tok = docs
      .select(col(idCol), col(labelCol),
        explode(split(col(textCol), " ")).as("token"),
        trainPred.as("is_train"), testPred.as("is_test"))
      .filter(col("token") =!= "")
    val tr = tok.filter(col("is_train"))
    val cls = tr.groupBy(col(labelCol).as("class"))
      .agg(countDistinct(col(idCol)).as("n_docs"))
    val ntr = tr.agg(countDistinct(col(idCol)).as("n"))
    val tc = tr.groupBy(col(labelCol).as("class"), col("token"))
      .agg(count(lit(1)).as("cnt"))
    val ctot = tc.groupBy(col("class")).agg(sum(col("cnt")).as("tok_c"))
    val vocab = tr.select(col("token")).distinct()
    val vsz = vocab.agg(count(lit(1)).as("v"))
    val model = vocab
      .crossJoin(broadcast(cls.select(col("class"))))
      .join(broadcast(ctot), "class")
      .crossJoin(broadcast(vsz))
      .join(tc, Seq("class", "token"), "left")
      .select(col("class"), col("token"),
        floor(log((coalesce(col("cnt"), lit(0)) + lit(1.0)) /
          (col("tok_c") + col("v"))) * lit(1e6)).cast("long").as("llfp"))
    val prior = cls.crossJoin(broadcast(ntr))
      .select(col("class"),
        floor(log(col("n_docs") * lit(1.0) / col("n")) * lit(1e6))
          .cast("long").as("prior_fp"))
    val te = tok.filter(col("is_test"))
      .groupBy(col(idCol), col(labelCol).as("true_label"), col("token"))
      .agg(count(lit(1)).as("m"))
    val sc = te
      .join(model, "token")
      .join(broadcast(prior), "class")
      .groupBy(col(idCol), col("true_label"), col("class"), col("prior_fp"))
      .agg((col("prior_fp") + sum(col("m") * col("llfp"))).as("score_fp"))
    sc.groupBy(col(idCol), col("true_label"))
      .agg(min(struct((-col("score_fp")).as("neg"), col("class"))).as("w"))
      .select(col(idCol), col("true_label"),
        col("w.class").as("pred_label"), (-col("w.neg")).as("score_fp"))
  }
}
