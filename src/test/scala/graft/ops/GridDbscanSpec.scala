package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Grid DBSCAN on hand-placed geometry: two dense blobs separated by
  * empty space become two clusters, stragglers next to a blob become
  * border points, far-away singletons are noise, and the whole
  * clustering is deterministic under repartitioning.
  */
class GridDbscanSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // eps = 1.0, minPts = 4. Blob A fills cells (0,0)/(1,0) (core,
  // adjacent -> one cluster); blob B fills cell (10,10); one point at
  // (2.5, 0.5) sits in non-core cell (2,0) adjacent to core (1,0)
  // -> border; one point at (-20,-20) -> noise.
  private val pts = {
    val blobA = (0 until 5).map(i => (100L + i, 0.1 + i * 0.15, 0.5)) ++
      (0 until 5).map(i => (200L + i, 1.1 + i * 0.15, 0.5))
    val blobB = (0 until 6).map(i => (300L + i, 10.1 + i * 0.1, 10.5))
    val border = Seq((400L, 2.5, 0.5))
    val noise = Seq((500L, -20.0, -20.0))
    (blobA ++ blobB ++ border ++ noise).toDF("id", "px", "py")
  }

  test("two blobs, a border point, and a noise point") {
    val out = GridDbscan.cluster(pts, eps = 1.0, minPts = 4L)
      .as[(Long, String, String)].collect().toSeq
    val byId = out.map(r => r._1 -> (r._2, r._3)).toMap
    byId.size shouldBe 18
    // blob A: both cells merge into one cluster, rep = min key "0:0"
    (100L until 105L) ++ (200L until 205L) foreach { id =>
      byId(id) shouldBe ("0:0", "core")
    }
    // blob B: isolated core cell is its own cluster
    (300L until 306L).foreach(id => byId(id) shouldBe ("10:10", "core"))
    byId(400L) shouldBe ("0:0", "border")
    byId(500L) shouldBe ("-1", "noise")
  }

  test("deterministic under repartitioning") {
    val a = GridDbscan.cluster(pts, 1.0, 4L).orderBy("id").collect()
    val b = GridDbscan.cluster(pts.repartition(7), 1.0, 4L)
      .orderBy("id").collect()
    a should contain theSameElementsInOrderAs b
  }
}
