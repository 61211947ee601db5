package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.Indicators

/** The reference's financial-analytics capability surface (SURVEY.md §2.3-2.7,
  * §2.11) instantiated over the driver's `events` table: `event_type` plays
  * the role of `stock_symbol`, `ts` of `local_time`, `value` of `close`.
  *
  * Numeric-determinism conventions shared with the DuckDB oracles:
  *   - whole-table sums/averages go through the exact fixed-point sums of
  *     [[graft.queries.Num]] so the result is independent of
  *     partition/summation order — the same trick a production engine uses
  *     to make revenue aggregates reproducible at any parallelism;
  *   - all floating literals in oracle SQL are written in E-notation so DuckDB
  *     parses them as DOUBLE (plain `2.0` parses as DECIMAL there);
  *   - window orderings always carry `event_id` as a tie-break.
  */
object FinanceQueries {

  /** events projected to the candle-like core + full indicator pipeline. */
  def enrichedEvents(s: SparkSession, d: String): DataFrame = {
    Indicators.enrich(
      Tables.events(s, d).select("event_id", "event_type", "ts", "value"),
      symbol = col("event_type"),
      time = col("ts"),
      close = col("value"),
      tieBreak = Seq(col("event_id")))
  }

  /** DuckDB CTE computing the identical enriched table. The EMA is the exact
    * recursion y_t=(1-a)y_{t-1}+a*x_t expressed as a left fold
    * (`list_reduce`) over the running window — bit-identical to the O(1)
    * recursive update in [[graft.functions.EwmAvg]].
    */
  val enrichedSql: String =
    """WITH base AS (
      |  SELECT event_id, event_type, ts, value FROM events
      |), s1 AS (
      |  SELECT *,
      |    CASE WHEN count(value) OVER w5 = 5 THEN avg(value) OVER w5 END AS sma_5,
      |    CASE WHEN row_number() OVER wo >= 10 THEN
      |      list_reduce(list(value) OVER wu,
      |                  (acc, x) -> (1e0 - 2e0/11e0)*acc + (2e0/11e0)*x)
      |    END AS ema_10,
      |    value - lag(value, 1) OVER wo AS delta
      |  FROM base
      |  WINDOW
      |    wo AS (PARTITION BY event_type ORDER BY ts, event_id),
      |    w5 AS (PARTITION BY event_type ORDER BY ts, event_id
      |           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
      |    wu AS (PARTITION BY event_type ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |), s2 AS (
      |  SELECT *,
      |    CASE WHEN delta IS NOT NULL THEN greatest(delta, 0e0) END AS gain,
      |    CASE WHEN delta IS NOT NULL THEN greatest(-delta, 0e0) END AS loss
      |  FROM s1
      |), s3 AS (
      |  SELECT *,
      |    CASE WHEN count(gain) OVER w10 = 10 THEN avg(gain) OVER w10 END AS avg_gain_10,
      |    CASE WHEN count(loss) OVER w10 = 10 THEN avg(loss) OVER w10 END AS avg_loss_10
      |  FROM s2
      |  WINDOW w10 AS (PARTITION BY event_type ORDER BY ts, event_id
      |                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
      |), s4 AS (
      |  SELECT *, avg_gain_10 / (CASE WHEN avg_loss_10 <> 0e0 THEN avg_loss_10 END) AS rs
      |  FROM s3
      |), s5 AS (
      |  SELECT *, 100e0 - 100e0/(1e0 + rs) AS rsi_10 FROM s4
      |), enriched AS (
      |  SELECT *,
      |    CASE WHEN rsi_10 IS NULL OR sma_5 IS NULL OR ema_10 IS NULL THEN 'HOLD'
      |         WHEN sma_5 > ema_10 AND rsi_10 < 70e0 THEN 'BUY'
      |         WHEN sma_5 < ema_10 AND rsi_10 > 30e0 THEN 'SELL'
      |         ELSE 'HOLD' END AS signal
      |  FROM s5
      |)""".stripMargin

  import Num.{davg, davgSql}

  private val rangeLo = "2024-01-05 00:00:00"
  private val rangeHi = "2024-01-20 00:00:00"
  private def tsBetween(c: Column) =
    c.between(lit(rangeLo).cast("timestamp"), lit(rangeHi).cast("timestamp"))
  private def tsBetweenSql(c: String) =
    s"$c BETWEEN TIMESTAMP '$rangeLo' AND TIMESTAMP '$rangeHi'"

  val all: Seq[QueryDef] = Seq(
    // ---- T1-T9 + C1: the full per-symbol indicator/signal pipeline ----
    QueryDef.sql(
      "q_indicators",
      s"""$enrichedSql
         |SELECT event_id, event_type, ts, value, sma_5, ema_10, delta, gain,
         |       loss, avg_gain_10, avg_loss_10, rs, rsi_10, signal
         |FROM enriched""".stripMargin
    )(enrichedEvents),

    // ---- O1: latest signal per symbol (ORDER BY t DESC LIMIT 1, per key) ----
    QueryDef.sql(
      "q_signal_latest",
      s"""$enrichedSql
         |SELECT event_type, ts, value, signal FROM (
         |  SELECT *, row_number() OVER (PARTITION BY event_type
         |            ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM enriched) WHERE rn = 1""".stripMargin
    ) { (s, d) =>
      val w = Window
        .partitionBy(col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      enrichedEvents(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("event_type", "ts", "value", "signal")
    },

    // ---- A4/A5: 14-aggregate per-symbol summary, one groupBy pass ----
    QueryDef.sql(
      "q_summary",
      s"""$enrichedSql
         |SELECT event_type,
         |  ${davgSql("value")} AS avg_close, max(value) AS max_close, min(value) AS min_close,
         |  ${davgSql("sma_5")} AS avg_sma_5, max(sma_5) AS max_sma_5, min(sma_5) AS min_sma_5,
         |  ${davgSql("ema_10")} AS avg_ema_10, max(ema_10) AS max_ema_10, min(ema_10) AS min_ema_10,
         |  ${davgSql("rsi_10")} AS avg_rsi_10, max(rsi_10) AS max_rsi_10, min(rsi_10) AS min_rsi_10,
         |  max(gain) AS max_gain, max(loss) AS max_loss
         |FROM enriched GROUP BY event_type""".stripMargin
    ) { (s, d) =>
      val aggs = SummaryAggs.cols(
        col("value"), col("sma_5"), col("ema_10"), col("rsi_10"),
        col("gain"), col("loss"))
      enrichedEvents(s, d)
        .groupBy(col("event_type"))
        .agg(aggs.head, aggs.tail: _*)
    },

    // ---- A1: filtered scalar AVG over (symbol, closed time range) ----
    QueryDef.sql(
      "q_agg_avg",
      s"""SELECT ${davgSql("value")} AS avg_value FROM events
         |WHERE event_type = 'click' AND ${tsBetweenSql("ts")}""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_type") === "click" && tsBetween(col("ts")))
        .agg(davg(col("value")).as("avg_value"))
    },

    // ---- A2: filtered MAX ----
    QueryDef.sql(
      "q_agg_highest",
      s"""SELECT max(value) AS max_value FROM events
         |WHERE event_type = 'purchase' AND ${tsBetweenSql("ts")}""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_type") === "purchase" && tsBetween(col("ts")))
        .agg(max(col("value")).as("max_value"))
    },

    // ---- A3: filtered MIN ----
    QueryDef.sql(
      "q_agg_lowest",
      s"""SELECT min(value) AS min_value FROM events
         |WHERE event_type = 'error' AND ${tsBetweenSql("ts")}""".stripMargin
    ) { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_type") === "error" && tsBetween(col("ts")))
        .agg(min(col("value")).as("min_value"))
    },

    // ---- C2/A7: conditional-aggregation pivot (avg gain per symbol) ----
    QueryDef.sql(
      "q_pivot_gains", {
        val types = Seq("click", "view", "purchase", "signup", "error")
        val cols = types
          .map(t =>
            s"${davgSql(s"CASE WHEN event_type = '$t' THEN gain END")} AS avg_gain_$t")
          .mkString(",\n  ")
        s"$enrichedSql\nSELECT\n  $cols\nFROM enriched"
      }
    ) { (s, d) =>
      val types = Seq("click", "view", "purchase", "signup", "error")
      enrichedEvents(s, d).agg(
        davg(when(col("event_type") === types.head, col("gain")))
          .as(s"avg_gain_${types.head}"),
        types.tail.map(t =>
          davg(when(col("event_type") === t, col("gain"))).as(s"avg_gain_$t")): _*
      )
    },

    // ---- P6 + O2: warm-up-excluded ordered series (candlestick panel) ----
    QueryDef.sql(
      "q_candlestick",
      s"""$enrichedSql
         |SELECT event_id, ts, value, sma_5, ema_10 FROM enriched
         |WHERE event_type = 'view' AND sma_5 > 0e0 AND ema_10 > 0e0
         |ORDER BY ts, event_id""".stripMargin
    ) { (s, d) =>
      enrichedEvents(s, d)
        .filter(col("event_type") === "view" && col("sma_5") > 0.0 && col("ema_10") > 0.0)
        .orderBy(col("ts"), col("event_id"))
        .select("event_id", "ts", "value", "sma_5", "ema_10")
    },

    // ---- K6: dedup gate, batch form — earliest row per (user, type) ----
    QueryDef.sql(
      "q_dedup_events",
      """SELECT event_id, user_id, event_type, ts, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |            ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin
    ) { (s, d) =>
      val w = Window
        .partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("event_id", "user_id", "event_type", "ts", "value")
    }
  )
}
