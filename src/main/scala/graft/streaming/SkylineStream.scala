package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `q_skyline` (queries.TpchQueries): a live Pareto
  * frontier per group, maintained incrementally and emitted as a
  * CHANGELOG of frontier cells.
  *
  * Semantics (matches the batch 2-D minimization skyline at
  * (price, size) cell granularity): a cell is on the frontier iff no
  * other observed cell has `price <= p && size <= s` with at least one
  * strict inequality. Arrivals emit `op = +1` when a new cell enters the
  * frontier and `op = -1` for each cell it evicts; applying the net
  * changelog reproduces the batch skyline's distinct
  * (brand, price, size) set on the same data — the frontier lattice is
  * monotone (an evicted or dominated-on-arrival cell can never re-enter,
  * because its dominator only ever gets replaced by a still-stronger
  * dominator), so the changelog never needs retractions of retractions.
  * `SkylineStreamSpec` pins batch ≡ stream across shuffled micro-batch
  * boundaries.
  *
  * Scale shape: state per key is the frontier itself — one (price, size)
  * pair per frontier step, strictly increasing price / strictly
  * decreasing size. That is O(frontier), bounded by the number of
  * distinct price levels that are ever simultaneously non-dominated
  * (tiny for real distributions; never the row count — dominated rows
  * leave no trace). One shuffle on the group key, same as the batch
  * query's groupBy. Row identities (partkeys) are deliberately NOT
  * buffered: members of a surviving cell are a storage-side equi-join on
  * (brand, price, size) at read time, exactly how the batch query joins
  * `part` back to its `pm` frame.
  */
object SkylineStream {

  /** One observed point (the batch query's (p_brand, p_retailprice,
    * p_size) projection).
    */
  final case class Pt(brand: String, price: Double, size: Int)

  /** Frontier changelog entry: `op = +1` cell entered, `-1` evicted. */
  final case class Change(brand: String, price: Double, size: Int, op: Int)

  /** Frontier as parallel sorted lists (price strictly increasing, size
    * strictly decreasing). Parallel primitives keep the state encoder
    * flat.
    */
  final case class FState(prices: List[Double], sizes: List[Int])

  /** Fold one point into a frontier; returns the new frontier and the
    * changelog (empty iff the point was dominated or already present).
    */
  def fold(st: FState, p: Pt): (FState, Seq[Change]) = {
    val cells = st.prices.zip(st.sizes)
    val dominated = cells.exists { case (cp, cs) =>
      (cp <= p.price && cs <= p.size) && (cp < p.price || cs < p.size)
    }
    if (dominated || cells.contains((p.price, p.size))) (st, Nil)
    else {
      val (evicted, kept) = cells.partition { case (cp, cs) =>
        cp >= p.price && cs >= p.size // strict somewhere, else `dominated`
      }
      val merged = ((p.price, p.size) :: kept).sortBy(_._1)
      val next = FState(merged.map(_._1), merged.map(_._2))
      val out = evicted.map { case (cp, cs) => Change(p.brand, cp, cs, -1) } :+
        Change(p.brand, p.price, p.size, +1)
      (next, out)
    }
  }

  private def advanceGroup(
      brand: String,
      rows: Iterator[Pt],
      state: GroupState[FState]): Iterator[Change] = {
    // deterministic within-batch fold order; the changelog's NET result
    // is order-independent (set semantics), so cross-batch order is free
    val sorted = rows.toSeq.sortBy(p => (p.price, p.size))
    var st = state.getOption.getOrElse(FState(Nil, Nil))
    val out = Seq.newBuilder[Change]
    sorted.foreach { p =>
      val (next, ch) = fold(st, p)
      st = next
      out ++= ch
    }
    state.update(st)
    out.result().iterator
  }

  /** Frontier changelog stream over `points`, keyed by brand. */
  def changelog(points: Dataset[Pt]): Dataset[Change] = {
    val spark = points.sparkSession
    import spark.implicits._
    points
      .groupByKey(_.brand)
      .flatMapGroupsWithState[FState, Change](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(advanceGroup)
  }
}
