package graft.pipelines

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.model.Tables

/** End-to-end curation over the sf0.001 documents table: stage
  * accounting is monotone and matches the stage operators run
  * standalone; decontamination drops exactly the eval-matching docs;
  * chunk and packing invariants hold on the final frame; and the whole
  * pipeline is deterministic across repartitionings.
  */
class CorpusPipelineSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val docs = Tables.documents(spark, sfDir)

  test("stage accounting is monotone and exact-dedup matches distinct content") {
    val (_, counts) = CorpusPipeline.curateWithCounts(docs)
    val byStage = counts.map(c => c.stage -> c.rows).toMap
    val order = Seq("input", "exact_dedup", "near_dedup", "quality",
      "decontaminated")
    order.sliding(2).foreach { case Seq(a, b) =>
      byStage(b) should be <= byStage(a)
    }
    byStage("input") shouldBe docs.count()
    byStage("exact_dedup") shouldBe
      docs.select(md5(col("text"))).distinct().count()
    byStage("chunks") should be >= byStage("decontaminated")
  }

  test("eval-set docs are decontaminated away; others survive") {
    import spark.implicits._
    // use two surviving docs' own text as the "benchmark" — they must
    // then be flagged (full shingle overlap) and dropped
    val survivors = CorpusPipeline.docStages(docs, None).last._2
      .select("doc_id").as[Long].collect().sorted.take(2)
    val ev = docs.filter(col("doc_id").isin(survivors: _*))
      .select(col("doc_id"), col("text"))
    val after = CorpusPipeline.docStages(docs, Some(ev)).last._2
      .select("doc_id").as[Long].collect().toSet
    survivors.foreach(s => after should not contain s)
    val before = CorpusPipeline.docStages(docs, None).last._2
      .select("doc_id").as[Long].collect().toSet
    (before -- after -- survivors.toSet).foreach { dropped =>
      fail(s"doc $dropped dropped without matching the eval set")
    }
  }

  test("chunk and packing invariants hold; pipeline is repartition-deterministic") {
    import spark.implicits._
    val out = CorpusPipeline.curate(docs, chunkSize = 32, chunkStride = 24,
      packShards = 4, packBudget = 256L)
    // every chunk within size; bin sums respect the rollover contract
    // (the boundary-straddling chunk lands in the bin its cumsum ends
    // in, so a bin can exceed the budget by at most chunkSize - 1)
    out.filter(col("n_chunk_tokens") > 32).count() shouldBe 0L
    out.groupBy("shard", "bin_id")
      .agg(sum("n_chunk_tokens").as("s"))
      .filter(col("s") > 256L + 31L).count() shouldBe 0L
    // determinism: identical packed output at a different parallelism
    val out2 = CorpusPipeline.curate(docs.repartition(13), chunkSize = 32,
      chunkStride = 24, packShards = 4, packBudget = 256L)
    val key = Seq("doc_id", "chunk_id", "shard", "cum_tokens", "bin_id")
    out.select(key.head, key.tail: _*).as[(Long, Long, Long, Long, Long)]
      .collect().toSet shouldBe
      out2.select(key.head, key.tail: _*).as[(Long, Long, Long, Long, Long)]
        .collect().toSet
  }
}
