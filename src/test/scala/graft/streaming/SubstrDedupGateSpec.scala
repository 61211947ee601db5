package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.DocStream.DocEvent

/** Streaming substring-dedup gate: verdicts must agree doc-for-doc with
  * the batch q_substr_gate operator on the same incoming/corpus split,
  * regardless of arrival batching; a verbatim-copied document is
  * flagged with full coverage; a fresh document is not; re-delivery is
  * stateless (same verdict again).
  */
class SubstrDedupGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(m: Int) = Timestamp.valueOf(f"2024-03-01 10:$m%02d:00")

  private def verdictTuple(r: org.apache.spark.sql.Row) = (
    r.getAs[Long]("doc_id"), r.getAs[Long]("n_chunks"),
    r.getAs[Long]("n_dup_chunks"), r.getAs[Long]("dup_chars"),
    r.getAs[Long]("n_chars_chunked"), r.getAs[Long]("dup_frac_fp"),
    Option(r.getAs[Any]("matched_corpus_id")).map(_.asInstanceOf[Long]),
    r.getAs[Boolean]("is_dup"))

  test("gate verdicts == batch q_substr_gate on the sf0.001 split") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val docs = graft.model.Tables.documents(spark, sfDir)
    val index = SubstrDedupGate.corpusIndex(
      docs.filter(pmod(col("doc_id"), lit(10)) =!= 0))

    val incoming = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .zipWithIndex
      .map { case (r, i) =>
        DocEvent(r.getLong(0), ts(i % 60), r.getString(1), r.getString(2)) }

    val input = MemoryStream[DocEvent]
    val query = SubstrDedupGate.gate(input.toDS(), index)
      .writeStream.outputMode("append").format("memory")
      .queryName("substr_gate").start()
    try {
      // arrival batching must not matter: deliver in 3 uneven chunks
      incoming.grouped(math.max(1, incoming.length / 3)).foreach { chunk =>
        input.addData(chunk.toIndexedSeq)
        query.processAllAvailable()
      }
      val got = spark.table("substr_gate").collect()
        .map(verdictTuple).toSet
      val batch = graft.SparkEntry.queries("q_substr_gate")(spark, sfDir)
        .collect().map(verdictTuple).toSet
      assert(got == batch)
      assert(got.nonEmpty)
      // the split must exercise both branches for the parity to mean much
      assert(got.exists(_._3 > 0), "no incoming chunk matched the corpus")
      assert(got.exists(_._3 == 0), "every incoming chunk matched")
    } finally {
      query.stop()
      spark.catalog.dropTempView("substr_gate")
    }
  }

  test("verbatim copy flags with full coverage; fresh text does not; re-delivery stateless") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def text(seed: Int, n: Int): String = {
      val rnd = new scala.util.Random(seed)
      (0 until n).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
    }
    val corpusText = text(41, 1500)
    val index = SubstrDedupGate.corpusIndex(
      Seq((100L, corpusText), (101L, text(42, 1500)))
        .toDF("doc_id", "text"))

    val input = MemoryStream[DocEvent]
    val query = SubstrDedupGate.gate(input.toDS(), index)
      .writeStream.outputMode("append").format("memory")
      .queryName("substr_small").start()
    try {
      val copy = DocEvent(1, ts(0), "en", corpusText)
      val fresh = DocEvent(2, ts(1), "en", text(43, 1500))
      input.addData(copy, fresh)
      query.processAllAvailable()
      val rows = spark.table("substr_small").collect()
        .map(verdictTuple).sortBy(_._1)
      assert(rows.length == 2)
      val Array(c, f) = rows
      assert(c._8 && c._6 == 1000000L && c._7 == Some(100L),
        s"verbatim copy must flag at full coverage: $c")
      assert(!f._8 && f._4 == 0L, s"fresh text must not flag: $f")

      // re-delivery: the gate holds no state, same verdict again
      input.addData(copy)
      query.processAllAvailable()
      val again = spark.table("substr_small").collect()
        .map(verdictTuple).filter(_._1 == 1L)
      assert(again.length == 2 && again.toSet.size == 1)
    } finally {
      query.stop()
      spark.catalog.dropTempView("substr_small")
    }
  }
}
