package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `q_max_coverage`: one-pass submodular maximization
  * by SieveStreaming (Badanidiyuru et al. 2014) — the batch operator
  * re-scans the corpus once per pick (k passes); the sieve sees every
  * document exactly ONCE and still guarantees (1/2 − ε)·OPT, which is
  * the only shape that works when the corpus is a stream.
  *
  * Algorithm: maintain m = the largest singleton coverage seen; for
  * every threshold τ = (1+ε)^j inside [m, 2km] keep an independent
  * sieve S_τ (≤ k picks + its covered-bigram set); an arriving doc
  * joins S_τ iff its marginal gain clears (τ/2 − f(S_τ))/(k − |S_τ|).
  * The report is the best sieve. Thresholds are PRE-COMPUTED 1e6-fixed
  * -point integer literals (the shared-table convention), so the
  * admission test 2·gain·(k−|S|)·1e6 ≥ τ_fp − 2·f·1e6 is exact int64
  * and the fold is bit-deterministic for a given arrival order (the
  * within-batch order is pinned by doc_id sort; SieveStreaming's
  * output is order-DEPENDENT across batches by nature — the guarantee,
  * not the pick set, is the invariant, and [[SieveStreamSpec]] pins
  * the guarantee against the batch greedy value).
  *
  * Scale shape: state per shard = O(sieves · k · |doc bigrams|) — the
  * active-threshold window holds ~log_{1+ε}(2k) sieves regardless of
  * stream length, and sieves whose τ falls below m are DELETED as m
  * grows, so state never accumulates. Sharding (key = doc_id % P) runs
  * P independent sieves in parallel; the standard combine is a batch
  * greedy over the ≤ P·k surviving candidates (constant-factor
  * composable), which the spec exercises.
  */
object SieveStream {

  val K = 6
  private val Scale = 1000000L

  /** floor(1e6·1.2^j), j = 0..60 — covers singleton values to ~5.6e4
    * with ε = 0.2 (bound: (1/2 − ε) = 0.3·OPT).
    */
  private val Thresholds: IndexedSeq[Long] =
    (0 to 60).map(j => math.floor(1e6 * math.pow(1.2, j)).toLong)

  final case class Doc(shard: Int, docId: Long, bigrams: Seq[String])

  /** One sieve: threshold index, picked docs, covered set (as a list —
    * flat product encoding for the state store).
    */
  final case class Sieve(j: Int, docs: List[Long], covered: List[String])

  final case class SieveSt(m: Long, nSeen: Long, sieves: List[Sieve])

  /** Best-so-far report after a micro-batch: `version` = docs processed
    * (monotone — readers keep the max per shard).
    */
  final case class Best(
      shard: Int, version: Long, value: Long, docIds: String)

  /** Fold one doc into the state (the single-pass sieve update). */
  def fold(st: SieveSt, d: Doc): SieveSt = {
    val bg = d.bigrams.distinct
    val singleton = bg.size.toLong
    val m2 = math.max(st.m, singleton)
    // Loud, not wrong: past the table ceiling the alive-window filter
    // would return NO thresholds and silently wipe every sieve (picks
    // included), leaving Best stuck at 0. j<=60 covers singletons to
    // ~5.6e4 distinct bigrams — beyond that, extend Thresholds.
    require(m2 * Scale <= Thresholds.last,
      s"singleton coverage $m2 exceeds the precomputed threshold ceiling " +
        s"(${Thresholds.last / Scale}); extend SieveStream.Thresholds")
    val lo = m2 * Scale
    val hi = 2L * K * m2 * Scale
    // instantiate newly-active thresholds empty; drop dead ones
    val alive = Thresholds.zipWithIndex
      .filter { case (t, _) => t >= lo && t <= hi }
    val byJ = st.sieves.map(s => s.j -> s).toMap
    val sieves = alive.map { case (_, j) =>
      byJ.getOrElse(j, Sieve(j, Nil, Nil))
    }.toList
    val updated = sieves.map { s =>
      if (s.docs.size >= K) s
      else {
        val cov = s.covered.toSet
        val gain = bg.count(!cov(_)).toLong
        val f = s.covered.size.toLong
        val tFp = Thresholds(s.j)
        if (gain > 0 &&
            2L * gain * (K - s.docs.size) * Scale >= tFp - 2L * f * Scale) {
          Sieve(s.j, s.docs :+ d.docId, s.covered ++ bg.filter(!cov(_)))
        } else s
      }
    }
    SieveSt(m2, st.nSeen + 1, updated)
  }

  /** Best sieve of a state (max covered, ties to the lowest j). */
  def best(shard: Int, st: SieveSt): Best = {
    val top = st.sieves.sortBy(s => (-s.covered.size, s.j)).headOption
    Best(shard, st.nSeen,
      top.map(_.covered.size.toLong).getOrElse(0L),
      top.map(_.docs.mkString(",")).getOrElse(""))
  }

  private def advanceShard(
      shard: Int, rows: Iterator[Doc],
      state: GroupState[SieveSt]): Iterator[Best] = {
    val sorted = rows.toSeq.sortBy(_.docId)
    var st = state.getOption.getOrElse(SieveSt(0L, 0L, Nil))
    sorted.foreach(d => st = fold(st, d))
    state.update(st)
    Iterator.single(best(shard, st))
  }

  /** Per-shard best-sieve report stream (one `Best` per shard per
    * micro-batch with data).
    */
  def run(docs: Dataset[Doc]): Dataset[Best] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_.shard)
      .flatMapGroupsWithState[SieveSt, Best](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(advanceShard)
  }
}
