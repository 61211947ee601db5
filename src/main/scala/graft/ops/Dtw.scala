package graft.ops

/** Banded (Sakoe-Chiba) dynamic-time-warping distance between two
  * fixed-length numeric array columns, unrolled into a dependency-ordered
  * list of lateral-alias SQL expressions shared verbatim by the Spark
  * query and its DuckDB oracle.
  *
  * DTW's recurrence dp(i,j) = cost(i,j) + min(dp(i-1,j-1), dp(i-1,j),
  * dp(i,j-1)) has a within-row sequential dependence: dp(i,j) needs
  * dp(i,j-1). Spark's `aggregate` higher-order function could carry the
  * DP row as an array accumulator, but DuckDB's `list_reduce` accumulator
  * must have the list's element type, so no cross-engine oracle exists for
  * the folded form. For a pattern-matching window the length is a small
  * compile-time constant, so the band cells are instead emitted as
  * individual SELECT-list expressions referencing earlier aliases
  * (lateral column aliases — supported by both Spark (3.4+) and DuckDB).
  * All arithmetic is `+`, `*`, `least` evaluated in a fixed order —
  * bit-identical IEEE semantics on both engines, like the vec_dot fold.
  *
  * Out-of-band / out-of-grid predecessors are omitted from the `least`
  * (they are +inf in the textbook formulation); cell (1,1)'s predecessor
  * is the dp(0,0)=0 boundary. With r >= 1 every band cell has at least
  * one predecessor, and the final cell is d_m_m.
  */
object Dtw {

  /** (alias, expression) pairs in dependency order for DTW between two
    * length-`m` sequences with band radius `r`; `aAt(i)` / `bAt(j)` are
    * engine-specific 1-based element accessors (Spark
    * `element_at(win, i)`, DuckDB `win[i]`).
    */
  def cellExprs(aAt: Int => String, bAt: Int => String, m: Int, r: Int)
      : Seq[(String, String)] =
    for {
      i <- 1 to m
      j <- 1 to m
      if (i - j).abs <= r
    } yield {
      val cost = s"((${aAt(i)} - ${bAt(j)}) * (${aAt(i)} - ${bAt(j)}))"
      val preds = Seq((i - 1, j - 1), (i - 1, j), (i, j - 1)).flatMap {
        case (0, 0) => Some("0e0")
        case (pi, pj) if pi >= 1 && pj >= 1 && (pi - pj).abs <= r =>
          Some(s"d_${pi}_$pj")
        case _ => None
      }
      val best =
        if (preds.size == 1) preds.head else s"least(${preds.mkString(", ")})"
      (s"d_${i}_$j", s"($cost + $best)")
    }

  /** [[cellExprs]] grouped by DP row `i`, for engines whose optimizer
    * textually expands lateral column aliases (DuckDB): one flat SELECT
    * of all 38 band cells re-expands each alias into its full
    * predecessor tree — ~3^depth expression blowup (measured ~85 s at
    * sf0.01). Emitting one MATERIALIZED CTE level per DP row caps the
    * expansion depth at the within-row band width (<= 2r+1). Arithmetic
    * and evaluation order of every cell are unchanged, so results stay
    * bit-identical to the flat form.
    */
  def cellLevels(aAt: Int => String, bAt: Int => String, m: Int, r: Int)
      : Seq[Seq[(String, String)]] =
    cellExprs(aAt, bAt, m, r)
      .groupBy { case (a, _) => a.split("_")(1).toInt }
      .toSeq.sortBy(_._1).map(_._2)

  /** Reference implementation (plain Scala DP) for specs: banded DTW with
    * squared point cost, same semantics as [[cellExprs]].
    */
  def reference(a: Array[Double], b: Array[Double], r: Int): Double = {
    val m = a.length
    require(b.length == m)
    val inf = Double.PositiveInfinity
    val dp = Array.fill(m + 1, m + 1)(inf)
    dp(0)(0) = 0.0
    for (i <- 1 to m; j <- 1 to m if (i - j).abs <= r) {
      val c = (a(i - 1) - b(j - 1)) * (a(i - 1) - b(j - 1))
      dp(i)(j) = c + math.min(dp(i - 1)(j - 1), math.min(dp(i - 1)(j), dp(i)(j - 1)))
    }
    dp(m)(m)
  }
}
