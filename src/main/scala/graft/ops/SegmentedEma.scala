package graft.ops

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.broadcast

/** Segmented (intra-key parallel) recursive EMA — the batch scale path for
  * the one inherently sequential indicator (VERDICT.md round-1 design
  * note 4): `Window.partitionBy(symbol)` gives ONE reducer per symbol, so
  * a 100 TB single-symbol history serializes. This operator splits each
  * symbol's ordered series into segments (caller-chosen, e.g. by day) and
  * runs three passes, each parallel across segments:
  *
  *   A. per segment, one streaming fold -> the segment's affine summary:
  *      the EMA recursion y <- (1-a)y + a*x over a segment is the affine
  *      map y_out = w*y_in + b with w = (1-a)^n (n = non-null count),
  *      b the fold from 0, plus b0 = the fold with the first non-null
  *      starting the recursion (the "no prior state" case) — O(rows/seg);
  *   B. per symbol, a scan over the S segment summaries composing the
  *      affines in order -> each segment's incoming state — O(S), and S
  *      is tiny (days/files), so the sequential part is negligible;
  *   C. per segment, replay the EXACT per-row recursion from the incoming
  *      state (same operation order as [[graft.functions.EwmAvg]]:
  *      (1-a)*y + a*x), emitting per-row EMA + min-periods masking.
  *
  * FLOATING-POINT CONTRACT (why "bit-for-bit vs EwmAvg" holds only
  * conditionally): pass B commits rounding to w and b separately, while
  * the sequential recursion rounds the combined value row by row, so a
  * boundary state can differ from the sequential value by ~1 ulp. Two
  * things bound this honestly:
  *
  *   - the recursion is a CONTRACTION: a boundary error e decays as
  *     (1-a)^k * e after k further rows, so divergence never accumulates
  *     (property-tested at <= 1e-12 relative);
  *   - when the arithmetic is exact — dyadic alpha (e.g. span=3 ->
  *     a=1/2) with modest-magnitude inputs, or a single segment, or
  *     replay from CHECKPOINTED boundary states (the incremental-batch
  *     use case, which is exactly pass C) — the result is bit-identical
  *     to [[graft.functions.EwmAvg]] (spec-pinned).
  */
object SegmentedEma {

  /** One input observation. `ord`/`tie` order rows within (sym, seg);
    * segment ids must be ordered consistently with `ord` (all rows of
    * segment s precede segment s+1 in time).
    */
  final case class In(sym: String, seg: Long, ord: Long, tie: Long, v: Option[Double])

  /** Pass-A segment summary: y_out = w*y_in + b given prior state; b0 =
    * value when the recursion STARTS inside this segment; n = non-null obs.
    */
  final case class SegAff(
      sym: String, seg: Long, w: Double, b: Double, b0: Double,
      any: Boolean, n: Long)

  /** Pass-B incoming state of a segment: EMA value and non-null count
    * accumulated over all earlier segments of the symbol.
    */
  final case class SegState(sym: String, seg: Long, yIn: Option[Double], cntIn: Long)

  final case class Out(sym: String, seg: Long, ord: Long, tie: Long, ema: Option[Double])

  def ema(rows: Dataset[In], span: Int): Dataset[Out] =
    ema(rows, alpha = 2.0 / (span + 1.0), minPeriods = span)

  def ema(rows: Dataset[In], alpha: Double, minPeriods: Int): Dataset[Out] = {
    val spark = rows.sparkSession
    import spark.implicits._
    val om = 1.0 - alpha

    // pass A — parallel across (sym, seg), streaming fold per group
    val affs = rows
      .groupByKey(r => (r.sym, r.seg))
      .flatMapSortedGroups($"ord", $"tie") { case ((sym, seg), it) =>
        var w = 1.0; var b = 0.0; var b0 = 0.0; var any = false; var n = 0L
        it.foreach { r =>
          r.v.foreach { x =>
            b0 = if (!any) x else om * b0 + alpha * x
            any = true
            w *= om
            b = om * b + alpha * x
            n += 1
          }
        }
        Iterator.single(SegAff(sym, seg, w, b, b0, any, n))
      }

    // pass B — per symbol, S-row scan over segment summaries
    val states = affs
      .groupByKey(_.sym)
      .flatMapSortedGroups($"seg") { (sym, it) =>
        var y: Option[Double] = None
        var cnt = 0L
        it.map { s =>
          val incoming = SegState(sym, s.seg, y, cnt)
          y = y match {
            case Some(v)       => Some(s.w * v + s.b)
            case None if s.any => Some(s.b0)
            case None          => None
          }
          cnt += s.n
          incoming
        }
      }

    // pass C — parallel replay of the exact recursion from incoming state;
    // the states frame is S-per-symbol tiny, so it broadcasts
    rows
      .joinWith(
        broadcast(states),
        rows("sym") === states("sym") && rows("seg") === states("seg"))
      .groupByKey(p => (p._1.sym, p._1.seg))
      .flatMapSortedGroups($"_1.ord", $"_1.tie") { case ((sym, seg), it) =>
        var y: Option[Double] = None
        var c = 0L
        var first = true
        it.map { case (r, st) =>
          if (first) { y = st.yIn; c = st.cntIn; first = false }
          r.v.foreach { x =>
            // identical operation order to EwmAvg.updateExpressions
            y = y match {
              case Some(v) => Some(om * v + alpha * x)
              case None    => Some(x)
            }
            c += 1
          }
          Out(sym, seg, r.ord, r.tie, if (c >= minPeriods) y else None)
        }
      }
  }
}
