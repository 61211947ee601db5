package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Team-draft interleaving: draft semantics (no duplicate placements,
  * each team drafts in its own rank order, coin decides round order),
  * click credit goes to the drafting team, exhaustion is safe.
  */
class InterleaveSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mk(
      rows: Seq[(Long, Seq[Interleave.Cand], Seq[Interleave.Cand], Seq[Boolean])]) =
    rows.toDF("q_id", "la", "lb", "coins")

  private def cands(ids: Seq[Long], clicked: Set[Long]) =
    ids.map(i => Interleave.Cand(i, clicked(i)))

  test("the team whose ranking surfaces the clicked items wins") {
    val clicked = Set(1L, 2L, 3L)
    // A ranks clicked items on top; B buries them
    val la = cands(Seq(1, 2, 3, 10, 11, 12, 13, 14, 15, 16), clicked)
    val lb = cands(Seq(10, 11, 12, 13, 14, 15, 16, 1, 2, 3), clicked)
    val out = Interleave.run(
      mk(Seq((7L, la, lb, Seq(true, false, true, false, true)))), 5)
      .as[(Long, Long, Long, Int)].collect().head
    out._2 should be > out._3 // clicks_a > clicks_b
    out._4 shouldBe 1
  }

  test("identical rankers split drafts deterministically by the coin") {
    val clicked = (1L to 10L).toSet // every item clicked
    val l = cands(1L to 10L, clicked)
    // A first every round: A drafts 1,3,5,7,9; B drafts 2,4,6,8,10
    val out = Interleave.run(
      mk(Seq((1L, l, l, Seq.fill(5)(true)))), 5)
      .as[(Long, Long, Long, Int)].collect().head
    out shouldBe ((1L, 5L, 5L, 0))
    // B first every round: same split mirrored -> still 5/5
    val out2 = Interleave.run(
      mk(Seq((1L, l, l, Seq.fill(5)(false)))), 5)
      .as[(Long, Long, Long, Int)].collect().head
    out2 shouldBe ((1L, 5L, 5L, 0))
  }

  test("clicks credit the drafting team even when the other ranker " +
    "also lists the item") {
    val clicked = Set(5L)
    // both rank item 5 first; coin gives A the first draft in round 0
    val la = cands(Seq(5, 1, 2), clicked)
    val lb = cands(Seq(5, 3, 4), clicked)
    val a = Interleave.run(mk(Seq((1L, la, lb, Seq(true, true, true)))), 3)
      .as[(Long, Long, Long, Int)].collect().head
    a._2 shouldBe 1L // A drafted 5
    a._3 shouldBe 0L
    val b = Interleave.run(mk(Seq((1L, la, lb, Seq(false, true, true)))), 3)
      .as[(Long, Long, Long, Int)].collect().head
    b._2 shouldBe 0L
    b._3 shouldBe 1L // B drafted 5 when it went first
  }

  test("list exhaustion is safe: rounds beyond the pool credit nothing") {
    val la = cands(Seq(1L), Set(1L))
    val lb = cands(Seq(1L), Set(1L))
    val out = Interleave.run(
      mk(Seq((1L, la, lb, Seq.fill(6)(true)))), 6)
      .as[(Long, Long, Long, Int)].collect().head
    // A drafts item 1 in round 0; B's pool is then empty; later rounds
    // have nothing to draft
    out shouldBe ((1L, 1L, 0L, 1))
  }

  test("bit-identical under repartitioning") {
    val rnd = new scala.util.Random(3)
    val rows = (0L until 50L).map { q =>
      val pool = rnd.shuffle((1L to 40L).toList)
      val clicked = pool.filter(_ => rnd.nextBoolean()).toSet
      (q, cands(pool.take(20), clicked),
        cands(rnd.shuffle(pool).take(20), clicked),
        Seq.fill(5)(rnd.nextBoolean()))
    }
    val df = mk(rows)
    val a = Interleave.run(df, 5).orderBy("q_id").collect()
    val b = Interleave.run(df.repartition(7), 5).orderBy("q_id").collect()
    a should contain theSameElementsInOrderAs b
  }
}
