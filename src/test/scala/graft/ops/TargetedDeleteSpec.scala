package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** File-pruned delete contract: result equals the plain anti-join, only
  * the files containing doomed keys are rewritten, and a key-clustered
  * layout keeps that set small.
  */
class TargetedDeleteSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshStore(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_del").toString
    // range layout on user_id: each of the 10 files holds a contiguous
    // key range, so a narrow delete set touches few files
    graft.model.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "event_type", "value")
      .repartitionByRange(10, col("user_id"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("delete equals the anti-join and rewrites only affected files") {
    val dir = freshStore()
    val before = spark.read.parquet(dir)
    // materialize the doomed keys: the frame's lineage must not re-read
    // the store after files are deleted
    val doomedKeys = before.select("user_id").distinct()
      .orderBy("user_id").limit(5).as[Long].collect()
    val doomed = doomedKeys.toSeq.toDF("user_id")
    val expected = before.join(doomed, Seq("user_id"), "left_anti")
      .select("event_id").as[Long].collect().sorted

    val (affected, total) = TargetedDelete.deleteRows(spark, dir, "user_id", doomed)
    affected should be > 0L
    // clustered keys -> the rewrite touches a strict subset of the store
    affected should be < total

    val after = spark.read.parquet(dir)
    after.select("event_id").as[Long].collect().sorted shouldBe expected
    after.join(doomed, Seq("user_id"), "left_semi").count() shouldBe 0L
  }

  test("empty delete set is a no-op: zero files touched") {
    val dir = freshStore()
    val none = Seq.empty[Long].toDF("user_id")
    val rows = spark.read.parquet(dir).count()
    val (affected, _) = TargetedDelete.deleteRows(spark, dir, "user_id", none)
    affected shouldBe 0L
    spark.read.parquet(dir).count() shouldBe rows
  }

  test("keys absent from the store touch nothing") {
    val dir = freshStore()
    val ghost = Seq(-1L, -2L).toDF("user_id")
    val rows = spark.read.parquet(dir).count()
    val (affected, _) = TargetedDelete.deleteRows(spark, dir, "user_id", ghost)
    affected shouldBe 0L
    spark.read.parquet(dir).count() shouldBe rows
  }
}
