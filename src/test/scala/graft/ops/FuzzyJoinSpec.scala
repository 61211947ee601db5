package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.TestSpark

/** Deletion-neighborhood blocking vs a naive all-pairs reference: the
  * blocking must lose NO pair with lev <= 2 (completeness is the whole
  * point of the SymSpell construction) and the verify step must kill
  * every candidate beyond 2.
  */
class FuzzyJoinSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("equals the naive all-pairs answer on random typo-ridden strings") {
    val rnd = new scala.util.Random(11)
    val bases = Seq("widget", "gadget", "anvil", "plate", "spring", "bolt")
    // originals + mutations at distance 1-3 (substitute/insert/delete)
    val strings = (bases ++ bases.flatMap { s =>
      (0 until 4).map { _ =>
        val ops = 1 + rnd.nextInt(3)
        (0 until ops).foldLeft(s) { (cur, _) =>
          if (cur.isEmpty) cur + ('a' + rnd.nextInt(26)).toChar
          else rnd.nextInt(3) match {
            case 0 => val i = rnd.nextInt(cur.length) // substitute
              cur.updated(i, ('a' + rnd.nextInt(26)).toChar)
            case 1 => val i = rnd.nextInt(cur.length + 1) // insert
              cur.substring(0, i) + ('a' + rnd.nextInt(26)).toChar + cur.substring(i)
            case _ => val i = rnd.nextInt(cur.length) // delete
              cur.substring(0, i) + cur.substring(i + 1)
          }
        }
      }
    }).distinct

    val expected = (for {
      a <- strings; b <- strings if a < b
      d = lev(a, b) if d <= 2
    } yield (a, b, d)).toSet

    val got = FuzzyJoin
      .selfJoin(strings.toDF("name"), "name")
      .as[(String, String, Int)].collect().toSet

    got shouldBe expected
    // sanity: the corpus actually produced matching pairs
    expected should not be empty
  }

  test("single-character and empty-adjacent strings don't break variant gen") {
    val got = FuzzyJoin
      .selfJoin(Seq("a", "b", "ab", "abc").toDF("name"), "name")
      .as[(String, String, Int)].collect().toSet
    got shouldBe Set(
      ("a", "b", 1), ("a", "ab", 1), ("a", "abc", 2),
      ("ab", "b", 1), ("abc", "b", 2), ("ab", "abc", 1))
  }
}
