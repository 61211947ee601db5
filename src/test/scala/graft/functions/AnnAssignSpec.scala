package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark
import graft.ops.{IvfIndex, IvfPq, Pq}

/** The r10 row-local ANN assignment (AnnAssign expressions over the
  * collected codebooks) must be INVISIBLE next to the r9 broadcast-join
  * + min(struct) shape: identical cells, codes and end-to-end search
  * results on random fixtures — including tie-heavy ones (duplicated
  * vectors force exact (dist2, cent_id) / (-cs, cent_id) tie-breaks).
  */
class AnnAssignSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Random float corpus with duplicates (ties) and a fixed seed. */
  private def corpus(n: Int, d: Int, seed: Int): DataFrame = {
    val r = new scala.util.Random(seed)
    val base = (0 until n / 2).map(_ => Array.fill(d)(r.nextFloat()))
    (0 until n).map { i =>
      (i.toLong, base(i % base.length).toSeq) // every vector appears twice
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>")
        .as("embedding"))
  }

  /** The r9 distributed assignment, inlined (broadcast join + map-side
    * min(struct)) — the reference the fused path must match.
    */
  private def assignJoin(emb: DataFrame, cb: DataFrame): DataFrame = {
    def withNorm(df: DataFrame, vec: String, as: String) =
      df.withColumn(as, sqrt(VecOps.vecDot(col(vec), col(vec))))
    withNorm(emb, "embedding", "e_nrm")
      .crossJoin(broadcast(withNorm(cb, "cent_emb", "c_nrm")))
      .withColumn("cs",
        VecOps.vecDot(col("embedding"), col("cent_emb"))
          / (col("e_nrm") * col("c_nrm")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("cs") * lit(-1.0), col("cent_id"))).as("m"))
      .select(col("vec_id"), col("m.cent_id").as("cent_id"))
  }

  private def assignSubJoin(sub: DataFrame, cb: DataFrame): DataFrame =
    sub
      .withColumn("sub_c2", VecOps.vecDot(col("sub_emb"), col("sub_emb")))
      .join(broadcast(cb.withColumn("cent_c2",
        VecOps.vecDot(col("cent_emb"), col("cent_emb")))), "sub_id")
      .withColumn("dist2",
        col("sub_c2") - lit(2.0) * VecOps.vecDot(col("sub_emb"), col("cent_emb"))
          + col("cent_c2"))
      .groupBy(col("vec_id"), col("sub_id"))
      .agg(min(struct(col("dist2"), col("cent_id"))).as("m"))
      .select(col("vec_id"), col("sub_id"), col("m.cent_id").as("cent_id"))

  test("fused coarse assignment == broadcast-join argmax (with ties)") {
    val emb = corpus(120, 16, seed = 3)
    val cb = IvfIndex.materialize(IvfIndex.codebook(emb, k = 7))
    val fused = IvfIndex.assign(emb, cb)
      .select("vec_id", "cent_id").as[(Long, Long)].collect().toMap
    val joined = assignJoin(emb, cb)
      .as[(Long, Long)].collect().toMap
    fused shouldBe joined
  }

  test("fused PQ sub-assignment == broadcast-join argmin (with ties)") {
    val m = 4
    val emb = corpus(100, 16, seed = 5)
      .select(col("vec_id"), Pq.normalized(col("embedding")).as("embedding"))
    val cb = Pq.codebooks(emb, m, k = 6)
    val sub = Pq.subVectors(emb, "vec_id", "embedding", m)
    val fused = Pq.assignSub(sub, cb)
      .select("vec_id", "sub_id", "cent_id")
      .as[(Long, Int, Long)].collect().toSet
    val joined = assignSubJoin(sub, cb)
      .as[(Long, Int, Long)].collect().toSet
    fused shouldBe joined
  }

  test("fused IvfPq.build cellCodes == join-shaped cells x codes") {
    val raw = corpus(90, 16, seed = 8)
    val norm = raw.select(col("vec_id"),
      Pq.normalized(col("embedding")).as("embedding"))
    val idx = IvfPq.build(raw, norm, m = 4)
    val fused = idx.cellCodes
      .select(col("vec_id"), col("cent_id"), col("sub_id").cast("int"),
        col("code"))
      .as[(Long, Long, Int, Long)].collect().toSet
    val joined = idx.cells.join(idx.codes, "vec_id")
      .select(col("vec_id"), col("cent_id"), col("sub_id").cast("int"),
        col("code"))
      .as[(Long, Long, Int, Long)].collect().toSet
    fused shouldBe joined
  }

  test("fused residual build == r9 join-shaped residual chain") {
    val raw = corpus(80, 16, seed = 13)
    val norm = raw.select(col("vec_id"),
      Pq.normalized(col("embedding")).as("embedding"))
    val idx = IvfPq.buildResidual(raw, norm, m = 4)
    // the r9 shape derived residuals via norm >< cells on vec_id; the
    // fused path re-derives the cell row-locally off the raw scan —
    // codes must agree end to end
    val viaJoin = norm.join(idx.cells, "vec_id")
      .join(broadcast(idx.cmeans), "cent_id")
      .select(col("vec_id"),
        expr("zip_with(embedding, cent_mean, (a, b) -> a - b)")
          .as("embedding"))
    val codesJoin = Pq.encode(viaJoin, idx.pqCb, m = 4)
      .join(idx.cells, "vec_id")
      .select(col("vec_id"), col("cent_id"), col("sub_id").cast("int"),
        col("code"))
      .as[(Long, Long, Int, Long)].collect().toSet
    val fused = idx.cellCodes
      .select(col("vec_id"), col("cent_id"), col("sub_id").cast("int"),
        col("code"))
      .as[(Long, Long, Int, Long)].collect().toSet
    fused shouldBe codesJoin
  }
}
