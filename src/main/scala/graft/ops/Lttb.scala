package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013) — the
  * standard dashboard decimation: reduce each symbol's series to
  * `buckets`+2 visually-representative points (first, one per bucket,
  * last), where each bucket keeps the point forming the largest triangle
  * with the PREVIOUSLY kept point and the next bucket's centroid.
  *
  * This is the Grafana-tier counterpart of the reference's chart
  * endpoints (SURVEY §2.11 serves raw candle arrays to the UI): at
  * 100 TB you cannot ship the raw series to a browser; you ship the
  * LTTB sketch.
  *
  * Exactness: the argmax runs in pure int64 arithmetic so the pick is
  * bit-identical cross-engine and at any parallelism —
  *   - x = whole seconds since the symbol's first sample (epoch-second
  *     truncation agrees across engines for the post-1970 domain);
  *   - y = floor(value * yScale) fixed-point;
  *   - the next-bucket centroid (sx/cnt, sy/cnt) is never divided out:
  *     the triangle area comparison is scaled by cnt (constant within a
  *     bucket, so the argmax is unchanged):
  *       A = |(px*cnt - sx)*(y - py) - (px - x)*(sy - py*cnt)|
  *   - ties break on (x, id) ascending.
  * Int64 headroom: |A| <= 2 * bucket_rows * x_range_seconds *
  * y_range_fp. A month of seconds (2.6e6) with 1e5-scale y and 1e6-row
  * buckets stays near 2^58; for wider domains rebase x (it already is
  * per-symbol) or lower yScale.
  *
  * Scale shape: ONE shuffle on the symbol key builds positions, bucket
  * ids and per-bucket aggregates (all hash aggs with map-side combine);
  * the candidate frame is checkpointed once and each of the `buckets`
  * rounds scans only it, joining two broadcast-size frames (the one-row-
  * per-symbol previous pick and next-bucket aggregate). The loop is
  * inherent to LTTB (each pick conditions the next); rounds = `buckets`,
  * a constant chosen by the chart width, not the data size. Series
  * shorter than `buckets`+2 points pass through unreduced (same branch
  * in the oracle).
  */
object Lttb {

  /** Downsample every `symbol` series to `buckets`+2 points.
    * Output: (symbol, sel_idx, time, value) with sel_idx 0 = first
    * point, 1..buckets = bucket picks, buckets+1 = last point;
    * pass-through series keep their original order as 0..n-1.
    */
  def downsample(
      df: DataFrame,
      symbol: String, time: String, id: String, value: String,
      buckets: Int = 12, yScale: Long = 100L): DataFrame = {
    require(buckets >= 1, s"need at least one bucket, got $buckets")
    val B = buckets

    val w = Window.partitionBy(col("sym")).orderBy(col("t"), col("pid"))
    val named = df.select(
      col(symbol).as("sym"), col(time).as("t"),
      col(id).as("pid"), col(value).as("v"))
    // per-symbol count / x-base as a broadcast agg, NOT whole-partition
    // window frames (those buffer the symbol's partition; the agg is a
    // map-side-combined hash agg + a symbol-count-sized broadcast)
    val meta = named.groupBy(col("sym")).agg(
      count(lit(1)).as("n"), min(unix_seconds(col("t"))).as("minx"))
    val pts = named
      .withColumn("rn", row_number().over(w).cast("long"))
      .join(broadcast(meta), "sym")
      .withColumn("x", unix_seconds(col("t")) - col("minx"))
      .withColumn("yfp", floor(col("v") * yScale).cast("long"))

    // short series (< B+2 points) pass through untouched
    val small = pts.filter(col("n") < B + 2)
      .select(col("sym"), (col("rn") - 1).as("sel_idx"), col("t"), col("v"))
    val big = pts.filter(col("n") >= B + 2)

    val first = Iterate.materialize(big.filter(col("rn") === 1)
      .select(col("sym"), col("x"), col("yfp"), col("t"), col("v")))
    val last = Iterate.materialize(big.filter(col("rn") === col("n"))
      .select(col("sym"), col("x"), col("yfp"), col("t"), col("v")))
    // interior points -> B equal buckets; checkpointed ONCE, scanned per
    // round (cached columnar scans; the loop never reshuffles it)
    val cands = Iterate.materialize(
      big.filter(col("rn") >= 2 && col("rn") <= col("n") - 1)
        .withColumn("k", expr(s"((rn - 2) * $B) div (n - 2)"))
        .select(col("sym"), col("k"), col("x"), col("yfp"),
          col("pid"), col("t"), col("v")))
    // "next bucket" aggregate for round k: bucket k+1's (sum x, sum y,
    // count); the final round looks at the last point instead
    val aggs = cands.groupBy(col("sym"), col("k"))
      .agg(sum(col("x")).as("sx"), sum(col("yfp")).as("sy"),
        count(lit(1)).as("cnt"))
    val nexts = Iterate.materialize(
      aggs.filter(col("k") >= 1)
        .select(col("sym"), (col("k") - 1).as("k"),
          col("sx"), col("sy"), col("cnt"))
        .unionByName(last.select(
          col("sym"), lit(B - 1).cast("long").as("k"),
          col("x").as("sx"), col("yfp").as("sy"), lit(1L).as("cnt"))))

    var prev = first.select(col("sym"), col("x"), col("yfp"))
    val sels = Array.newBuilder[DataFrame]
    for (k <- 0 until B) {
      val p = prev.select(
        col("sym").as("psym"), col("x").as("px"), col("yfp").as("py"))
      val nx = nexts.filter(col("k") === k).select(
        col("sym").as("nsym"), col("sx"), col("sy"), col("cnt"))
      val area =
        abs((col("px") * col("cnt") - col("sx")) * (col("yfp") - col("py")) -
          (col("px") - col("x")) * (col("sy") - col("py") * col("cnt")))
      // argmax as a partial-aggregable min(struct): area desc, ties on
      // (x, pid) asc; t/v/yfp ride along as payload (pid is unique, so
      // they never influence the comparison)
      val sel = Iterate.materialize(
        cands.filter(col("k") === k)
          .join(broadcast(p), col("sym") === col("psym"))
          .join(broadcast(nx), col("sym") === col("nsym"))
          .withColumn("area", area)
          .groupBy(col("sym"))
          .agg(min(struct((-col("area")).as("na"), col("x"), col("pid"),
            col("t"), col("v"), col("yfp"))).as("m"))
          .select(col("sym"), col("m.x").as("x"), col("m.yfp").as("yfp"),
            col("m.t").as("t"), col("m.v").as("v")))
      sels += sel.select(col("sym"),
        lit(k + 1).cast("long").as("sel_idx"), col("t"), col("v"))
      prev = sel
    }

    val picked = Seq(
      first.select(col("sym"), lit(0L).as("sel_idx"), col("t"), col("v")),
      last.select(col("sym"), lit(B + 1).cast("long").as("sel_idx"),
        col("t"), col("v"))) ++ sels.result()
    (picked :+ small).reduce(_ unionByName _)
      .select(col("sym").as(symbol), col("sel_idx"),
        col("t").as(time), col("v").as(value))
  }

  /** DuckDB twin: the same recurrence unrolled to `buckets` CTE steps
    * (the PcaPower chain pattern). `table`/column args name the source;
    * emits a complete SELECT.
    */
  def oracleSql(
      table: String,
      symbol: String, time: String, id: String, value: String,
      buckets: Int = 12, yScale: Long = 100L): String = {
    val B = buckets
    val head =
      s"""WITH lttb_pts AS (
         |  SELECT $symbol AS sym, $time AS t, $id AS pid, $value AS v,
         |    row_number() OVER wo AS rn,
         |    count(*) OVER (PARTITION BY $symbol) AS n,
         |    epoch_us($time) // 1000000
         |      - min(epoch_us($time) // 1000000)
         |          OVER (PARTITION BY $symbol) AS x,
         |    CAST(floor($value * $yScale) AS BIGINT) AS yfp
         |  FROM $table
         |  WINDOW wo AS (PARTITION BY $symbol ORDER BY $time, $id)
         |), lttb_cands AS (
         |  SELECT sym, t, pid, v, x, yfp,
         |    ((rn - 2) * $B) // (n - 2) AS k
         |  FROM lttb_pts WHERE n >= ${B + 2} AND rn >= 2 AND rn <= n - 1
         |), lttb_aggs AS (
         |  SELECT sym, k, sum(x) AS sx, sum(yfp) AS sy, count(*) AS cnt
         |  FROM lttb_cands GROUP BY sym, k
         |), lttb_nexts AS (
         |  SELECT sym, k - 1 AS k, sx, sy, cnt FROM lttb_aggs WHERE k >= 1
         |  UNION ALL
         |  SELECT sym, CAST(${B - 1} AS BIGINT) AS k,
         |    x AS sx, yfp AS sy, CAST(1 AS BIGINT) AS cnt
         |  FROM lttb_pts WHERE n >= ${B + 2} AND rn = n
         |), lttb_sel_first AS (
         |  SELECT sym, x, yfp FROM lttb_pts WHERE n >= ${B + 2} AND rn = 1
         |)""".stripMargin
    val steps = (0 until B).map { k =>
      val prev = if (k == 0) "lttb_sel_first" else s"lttb_sel_${k - 1}"
      s""", lttb_sel_$k AS (
         |  SELECT sym, x, yfp, t, v FROM (
         |    SELECT c.sym, c.x, c.yfp, c.t, c.v,
         |      row_number() OVER (PARTITION BY c.sym ORDER BY
         |        abs((p.x * nx.cnt - nx.sx) * (c.yfp - p.yfp)
         |            - (p.x - c.x) * (nx.sy - p.yfp * nx.cnt)) DESC,
         |        c.x, c.pid) AS rk
         |    FROM lttb_cands c
         |    JOIN $prev p ON p.sym = c.sym
         |    JOIN lttb_nexts nx ON nx.sym = c.sym AND nx.k = $k
         |    WHERE c.k = $k)
         |  WHERE rk = 1
         |)""".stripMargin
    }.mkString
    val selUnions = (0 until B).map { k =>
      s"UNION ALL SELECT sym AS $symbol, CAST(${k + 1} AS BIGINT) AS sel_idx, t AS $time, v AS $value FROM lttb_sel_$k"
    }.mkString("\n")
    s"""$head$steps
       |SELECT sym AS $symbol, CAST(0 AS BIGINT) AS sel_idx,
       |  t AS $time, v AS $value
       |FROM lttb_pts WHERE n >= ${B + 2} AND rn = 1
       |$selUnions
       |UNION ALL SELECT sym AS $symbol, CAST(${B + 1} AS BIGINT) AS sel_idx,
       |  t AS $time, v AS $value
       |FROM lttb_pts WHERE n >= ${B + 2} AND rn = n
       |UNION ALL SELECT sym AS $symbol, rn - 1 AS sel_idx,
       |  t AS $time, v AS $value
       |FROM lttb_pts WHERE n < ${B + 2}""".stripMargin
  }
}
