package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.SkylineStream.{Change, FState, Pt}

/** Streaming Pareto frontier vs batch q_skyline on the driver's real part
  * table: applying the net changelog must reproduce the batch skyline's
  * distinct (brand, price, size) cells, regardless of how arrivals are
  * split across micro-batches or ordered.
  */
class SkylineStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("net changelog equals the batch skyline cells on real data, " +
    "shuffled across micro-batch boundaries") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val batchCells = graft.SparkEntry.queries("q_skyline")(spark, sfDir)
      .select("p_brand", "p_retailprice", "p_size").distinct()
      .as[(String, Double, Int)].collect().toSet

    val pts = graft.model.Tables.part(spark, sfDir)
      .select(col("p_brand").as("brand"),
        col("p_retailprice").as("price"), col("p_size").cast("int").as("size"))
      .as[Pt].collect()
    // adversarial order: deterministic shuffle by hash, nothing sorted
    val shuffled = pts.sortBy(p => (p.brand.hashCode * 31 + p.size) ^
      java.lang.Double.hashCode(p.price))

    val input = MemoryStream[Pt]
    val query = SkylineStream.changelog(input.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("skyline_stream").start()
    try {
      shuffled.grouped(math.max(1, shuffled.length / 4 + 1)).foreach { c =>
        input.addData(c.toSeq)
        query.processAllAvailable()
      }
      val net = spark.table("skyline_stream")
        .groupBy("brand", "price", "size")
        .agg(sum(col("op")).as("net"))
        .as[(String, Double, Int, Long)].collect()
      // every cell nets to +1 (on frontier) or 0 (entered then evicted)
      assert(net.forall(c => c._4 == 0L || c._4 == 1L),
        "changelog must never double-enter or double-evict a cell")
      val streamedCells = net.filter(_._4 == 1L)
        .map(c => (c._1, c._2, c._3)).toSet
      assert(streamedCells == batchCells)
    } finally query.stop()
  }

  test("fold: dominance, eviction, ties, and monotone frontier invariant") {
    val b = "B#1"
    var st = FState(Nil, Nil)
    def step(p: Pt): Seq[Change] = { val (n, ch) = SkylineStream.fold(st, p); st = n; ch }

    assert(step(Pt(b, 100.0, 10)) == Seq(Change(b, 100.0, 10, +1)))
    // dominated on arrival (worse in both): no event, no state change
    assert(step(Pt(b, 120.0, 12)).isEmpty)
    // same cell again: no event (batch keeps all members of the cell;
    // membership is a storage join, not stream state)
    assert(step(Pt(b, 100.0, 10)).isEmpty)
    // incomparable: enters
    assert(step(Pt(b, 80.0, 15)) == Seq(Change(b, 80.0, 15, +1)))
    // dominates both existing cells: evicts them, enters
    val ch = step(Pt(b, 80.0, 9))
    assert(ch.count(_.op == -1) == 2 && ch.count(_.op == +1) == 1)
    assert(ch.map(c => (c.price, c.size, c.op)).toSet ==
      Set((100.0, 10, -1), (80.0, 15, -1), (80.0, 9, +1)))
    // equal price, larger size: dominated
    assert(step(Pt(b, 80.0, 11)).isEmpty)
    // frontier invariant: prices strictly increasing, sizes strictly decreasing
    assert(st.prices == List(80.0) && st.sizes == List(9))
    assert(step(Pt(b, 70.0, 20)) == Seq(Change(b, 70.0, 20, +1)))
    assert(st.prices.zip(st.prices.tail).forall(t => t._1 < t._2))
    assert(st.sizes.zip(st.sizes.tail).forall(t => t._1 > t._2))
  }
}
