package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's Grafana dashboard workload — 9 raw SQL statements over
  * `stock_data` (/root/reference/grafana/dashboards/dashboard.json:132,264,
  * 396,522,604,689,806,891,976) — run through the ACTUAL SQL surface:
  * `spark.sql` over a registered view of the enriched table. Panels whose
  * shapes are already covered verbatim elsewhere (candlestick ->
  * q_candlestick, gains pivot -> q_pivot_gains, summary -> q_summary) are
  * not duplicated; the four remaining distinct shapes are here, adapted to
  * the driver's events naming (event_type=symbol, ts=time, value=close).
  */
object GrafanaQueries {

  /** Register the enriched table as the `stock_data` view (idempotent). */
  private def view(s: SparkSession, d: String): Unit =
    FinanceQueries.enrichedEvents(s, d).createOrReplaceTempView("stock_data")

  private def sqlQuery(q: String)(s: SparkSession, d: String): DataFrame = {
    view(s, d)
    s.sql(q)
  }

  import Num.davgSql

  val all: Seq[QueryDef] = Seq(
    // ---- indicator time-series panels (RSI/SMA/EMA/gain-loss,
    //      dashboard.json:132,264,396,522): P3 equality filter + projection ----
    QueryDef.sql(
      "q_grafana_timeseries",
      s"""${FinanceQueries.enrichedSql}
         |SELECT rsi_10, sma_5, ema_10, gain, loss, ts AS time, event_id
         |FROM enriched WHERE event_type = 'view'""".stripMargin
    )(sqlQuery(
      """SELECT rsi_10, sma_5, ema_10, gain, loss, ts AS time, event_id
        |FROM stock_data WHERE event_type = 'view'""".stripMargin) _),

    // ---- latest signal panel (dashboard.json:604): global top-1 ----
    QueryDef.sql(
      "q_grafana_latest_signal",
      s"""${FinanceQueries.enrichedSql}
         |SELECT signal, ts FROM enriched
         |ORDER BY ts DESC, event_id DESC LIMIT 1""".stripMargin
    )(sqlQuery(
      "SELECT signal, ts FROM stock_data ORDER BY ts DESC, event_id DESC LIMIT 1") _),

    // ---- close-price stat panel (dashboard.json:689): A6 global stats ----
    QueryDef.sql(
      "q_grafana_close_stats",
      s"""${FinanceQueries.enrichedSql}
         |SELECT max(value) AS max_close, ${davgSql("value")} AS avg_close,
         |       min(value) AS min_close
         |FROM enriched WHERE event_type = 'click'""".stripMargin
    )(sqlQuery(
      s"""SELECT max(value) AS max_close, ${davgSql("value")} AS avg_close,
         |       min(value) AS min_close
         |FROM stock_data WHERE event_type = 'click'""".stripMargin) _),

    // ---- average-losses pivot panel (dashboard.json:976): C2 with the
    //      P5 IN-list predicate ----
    QueryDef.sql(
      "q_grafana_losses_pivot", {
        val types = Seq("click", "view", "purchase", "signup")
        val cols = types
          .map(t =>
            s"${davgSql(s"CASE WHEN event_type = '$t' THEN loss END")} AS avg_loss_$t")
          .mkString(",\n  ")
        s"""${FinanceQueries.enrichedSql}
           |SELECT
           |  $cols
           |FROM enriched
           |WHERE event_type IN ('click', 'view', 'purchase', 'signup')""".stripMargin
      }
    ) { (s, d) =>
      val types = Seq("click", "view", "purchase", "signup")
      val cols = types
        .map(t =>
          s"${davgSql(s"CASE WHEN event_type = '$t' THEN loss END")} AS avg_loss_$t")
        .mkString(",\n  ")
      sqlQuery(
        s"""SELECT
           |  $cols
           |FROM stock_data
           |WHERE event_type IN ('click', 'view', 'purchase', 'signup')""".stripMargin)(
        s, d)
    }
  )
}
