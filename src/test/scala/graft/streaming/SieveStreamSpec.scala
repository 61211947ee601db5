package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.streaming.SieveStream.{Best, Doc}

/** SieveStreaming vs batch greedy on the driver's real documents table:
  * the one-pass sieve must clear its (1/2 − ε) = 0.3 guarantee relative
  * to the greedy value (greedy ≤ OPT), both single-shard and through
  * the shard-then-combine composition; report versions must be
  * monotone per shard.
  */
class SieveStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def bigrams(text: String): Set[String] = {
    val t = text.split(" ").filter(_.nonEmpty)
    if (t.length < 2) Set.empty
    else t.sliding(2).map(_.mkString(" ")).toSet
  }

  private lazy val corpus: Seq[(Long, Set[String])] = {
    import spark.implicits._
    graft.model.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().toSeq.map { case (id, tx) => id -> bigrams(tx) }
      .filter(_._2.nonEmpty).sortBy(_._1)
  }

  /** Plain greedy max-coverage reference. */
  private def greedy(
      docs: Seq[(Long, Set[String])], k: Int): (Set[Long], Long) = {
    var covered = Set.empty[String]
    var picks = Set.empty[Long]
    for (_ <- 1 to k) {
      val (id, gain) = docs.filterNot(d => picks(d._1))
        .map { case (id, bg) => id -> (bg -- covered).size }
        .minBy { case (id, g) => (-g, id) }
      if (gain > 0) {
        picks += id
        covered ++= docs.find(_._1 == id).get._2
      }
    }
    (picks, covered.size.toLong)
  }

  private def stream(docs: Seq[Doc], batches: Int): Seq[Best] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Doc]
    val name = s"sieve_${docs.size}_${batches}_${docs.head.shard}"
    val q = SieveStream.run(input.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      docs.grouped(math.max(1, docs.size / batches)).foreach { b =>
        input.addData(b: _*); q.processAllAvailable()
      }
      spark.table(name).as[Best].collect().toSeq
    } finally q.stop()
  }

  test("single shard clears the 0.3*greedy guarantee; versions monotone") {
    val (_, gVal) = greedy(corpus, SieveStream.K)
    val docs = corpus.map { case (id, bg) => Doc(0, id, bg.toSeq.sorted) }
    val out = stream(docs, batches = 4)
    val versions = out.map(_.version)
    versions shouldBe versions.sorted
    val fin = out.maxBy(_.version)
    fin.version shouldBe docs.size.toLong
    fin.value should be >= math.ceil(0.3 * gVal).toLong
    fin.docIds.split(",").length should be <= SieveStream.K
  }

  test("shard-then-combine stays constant-factor") {
    val (_, gVal) = greedy(corpus, SieveStream.K)
    val docs = corpus.map { case (id, bg) =>
      Doc((id % 4).toInt, id, bg.toSeq.sorted)
    }
    val out = stream(docs, batches = 3)
    val finals = out.groupBy(_.shard).map { case (_, bs) =>
      bs.maxBy(_.version)
    }
    val candidates = finals.flatMap(_.docIds.split(",").filter(_.nonEmpty)
      .map(_.toLong)).toSet
    val candDocs = corpus.filter(d => candidates(d._1))
    val (_, cVal) = greedy(candDocs, SieveStream.K)
    cVal should be >= math.ceil(0.3 * gVal).toLong
  }

  test("fold fails loudly past the threshold-table ceiling") {
    // A doc with more distinct bigrams than the precomputed table covers
    // must throw, not silently delete every sieve and report value 0.
    val huge = (0 until 60000).map(i => s"bg_$i bg_${i + 1}")
    val ex = intercept[IllegalArgumentException] {
      SieveStream.fold(
        SieveStream.SieveSt(0L, 0L, Nil), Doc(0, 1L, huge))
    }
    ex.getMessage should include("threshold ceiling")
  }
}
