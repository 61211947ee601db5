package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Product/behavioral analytics over the events stream — the ordered-
  * sequence aggregations (funnel, cohort retention) that sit beside the
  * financial indicators in any events-warehouse workload (ClickHouse's
  * `windowFunnel`, Flink's MATCH_RECOGNIZE territory), expressed as plain
  * joins + hash aggregations.
  *
  * Scale shape: every stage keys by `user_id` — one shuffle partitioning
  * reused across the step aggregations (Catalyst reuses the exchange for
  * the self-joins), then small grouped outputs. All arithmetic is
  * timestamps and integer counts — exact cross-engine.
  */
object AnalyticsQueries {

  /** Exact factorial as a CASE chain (0..12 — 12! is the last value a
    * q_shapley term can carry without int64 overflow; beyond returns
    * NULL, loudly failing the gate rather than wrapping). ONE template
    * shared by the Spark expression and the DuckDB oracle so the two
    * cannot drift.
    */
  private def factCase(x: String): String =
    "CASE " + x + (0 to 12).map(k =>
      s" WHEN $k THEN CAST(${(1 to k).map(_.toLong).product} AS BIGINT)")
      .mkString + " END"

  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select("event_id", "event_type", "ts", "user_id")

  /** Shared survival-analysis subject derivation (q_kaplan_meier /
    * q_nelson_aalen): one subject per user, dur = days from first to
    * last activity, right-censored (churn = 0) when the last activity
    * falls in the final 3 observed days, cohort = first event type.
    */
  private val survivalSubjectsDuck: String =
    """fe AS (
      |  SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS rn
      |  FROM events
      |), base AS (
      |  SELECT user_id, date_trunc('day', min(ts)) AS first_day,
      |         date_trunc('day', max(ts)) AS last_day
      |  FROM events GROUP BY user_id
      |), cut AS (
      |  SELECT max(date_trunc('day', ts)) - INTERVAL 2 DAY AS cutoff
      |  FROM events
      |), graft_subjects AS (
      |  SELECT fe.event_type AS cohort,
      |    CAST(date_diff('day', first_day, last_day) AS BIGINT) AS dur,
      |    CASE WHEN last_day < cutoff THEN 1 ELSE 0 END AS churn
      |  FROM base JOIN fe ON fe.user_id = base.user_id AND fe.rn = 1
      |  CROSS JOIN cut
      |)""".stripMargin

  private def survivalSubjects(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val fe = e.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("cohort"))
    val base = e.groupBy(col("user_id"))
      .agg(date_trunc("day", min(col("ts"))).as("first_day"),
        date_trunc("day", max(col("ts"))).as("last_day"))
    val cut = e.agg(
      expr("date_trunc('day', max(ts)) - INTERVAL 2 DAY").as("cutoff"))
    base.join(fe, "user_id")
      .crossJoin(broadcast(cut))
      .select(col("cohort"),
        datediff(col("last_day"), col("first_day")).cast("long").as("dur"),
        when(col("last_day") < col("cutoff"), 1).otherwise(0).as("churn"))
  }

  val all: Seq[QueryDef] = Seq(

    // ---- Incremental rollup maintenance ([[graft.ops.Rollup]]): the
    //      events history arrives as three delta batches, each summarized
    //      ALONE and folded into the running per-(type, day) rollup —
    //      history is never rescanned. The oracle states the full
    //      recompute (one GROUP BY over everything); the mergeable-state
    //      design (count / exact fixed-point sum / min / max) makes the
    //      incremental path reproduce it bit-for-bit ----
    QueryDef.sql(
      "q_rollup_incremental",
      s"""SELECT event_type, CAST(ts AS DATE) AS day, count(value) AS n,
         |  ${Num.dsumSql("value")} AS sum_value,
         |  ${Num.davgSql("value")} AS avg_value,
         |  min(value) AS min_value, max(value) AS max_value
         |FROM events GROUP BY 1, 2""".stripMargin
    ) { (s, d) =>
      import graft.ops.Rollup
      val evd = Tables.events(s, d).select(
        col("event_id"), col("event_type"), to_date(col("ts")).as("day"),
        col("value"))
      val batches = (0 to 2).map(i =>
        Rollup.summarize(evd.filter(pmod(col("event_id"), lit(3)) === i),
          Seq("event_type", "day"), "value"))
      Rollup.finish(Rollup.merge(batches.head, batches.tail: _*))
    },

    // ---- Data-quality expectations gate ([[graft.ops.Expectations]]):
    //      row-level checks + uniqueness in ONE aggregate over ONE scan
    //      of events; referential integrity as a broadcast anti join on
    //      orders -> customer. Output is the tiny (check, violations,
    //      passed) table a pipeline gates on ----
    QueryDef.sql(
      "q_expectations",
      """WITH ag AS (
        |  SELECT
        |    CAST(sum(CASE WHEN value IS NULL OR isnan(value) THEN 1 ELSE 0 END) AS BIGINT) AS value_finite,
        |    CAST(sum(CASE WHEN abs(value) > 1e6 THEN 1 ELSE 0 END) AS BIGINT) AS value_in_range,
        |    CAST(sum(CASE WHEN ts IS NULL OR year(ts) NOT BETWEEN 2020 AND 2030 THEN 1 ELSE 0 END) AS BIGINT) AS ts_bounds,
        |    CAST(sum(CASE WHEN user_id IS NULL OR user_id < 0 THEN 1 ELSE 0 END) AS BIGINT) AS user_id_valid,
        |    CAST(count(event_id) - count(DISTINCT event_id) AS BIGINT) AS event_id_unique
        |  FROM events
        |), ri AS (
        |  SELECT CAST(count(*) AS BIGINT) AS v FROM orders o
        |  WHERE o.o_custkey IS NOT NULL
        |    AND o.o_custkey NOT IN (SELECT c_custkey FROM customer)
        |)
        |SELECT "check", violations, violations = 0 AS passed FROM (
        |  SELECT 'value_finite' AS "check", value_finite AS violations FROM ag
        |  UNION ALL SELECT 'value_in_range', value_in_range FROM ag
        |  UNION ALL SELECT 'ts_bounds', ts_bounds FROM ag
        |  UNION ALL SELECT 'user_id_valid', user_id_valid FROM ag
        |  UNION ALL SELECT 'event_id_unique', event_id_unique FROM ag
        |  UNION ALL SELECT 'orders_customer_fk', v FROM ri)""".stripMargin
    ) { (s, d) =>
      import graft.ops.Expectations
      val evd = Tables.events(s, d)
      Expectations.check(
        evd,
        rowChecks = Seq(
          "value_finite" -> (col("value").isNull || isnan(col("value"))),
          "value_in_range" -> (abs(col("value")) > 1e6),
          "ts_bounds" -> (col("ts").isNull || !year(col("ts")).between(2020, 2030)),
          "user_id_valid" -> (col("user_id").isNull || col("user_id") < 0)),
        uniqueCols = Seq("event_id"))
        .unionByName(Expectations.refCheck("orders_customer_fk",
          Tables.orders(s, d), "o_custkey", Tables.customer(s, d), "c_custkey"))
    },

    // ---- Functional-dependency profiling (the schema-discovery side
    //      of data quality — q_expectations checks DECLARED rules, this
    //      MEASURES candidate X → Y dependencies): per candidate FD over
    //      the denormalized orders⋈customer frame, the violating-key
    //      count and the g3 error (min fraction of rows to delete for
    //      the FD to hold = 1 − Σ_X plurality(Y)/n — Kivinen & Mannila
    //      1995). Scale shape per FD: two cascaded hash aggs (X,Y → X),
    //      both partially aggregable; candidates share one scan ----
    QueryDef.sql(
      "q_fd_violations", {
        def fdSql(name: String, x: String, y: String) =
          s"""SELECT '$name' AS fd, CAST(count(*) AS BIGINT) AS n_keys,
             |  CAST(sum(CASE WHEN ny > 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS viol_keys,
             |  CAST(floor((sum(tot) - sum(maxc)) * 1e0 / sum(tot) * 1e6)
             |    AS BIGINT) AS g3_fp
             |FROM (
             |  SELECT $x, CAST(sum(c) AS BIGINT) AS tot,
             |    CAST(max(c) AS BIGINT) AS maxc,
             |    CAST(count(*) AS BIGINT) AS ny
             |  FROM (SELECT $x, $y, count(*) AS c FROM den GROUP BY 1, 2)
             |  GROUP BY $x)""".stripMargin
        s"""WITH den AS (
           |  SELECT o_custkey, c_nationkey, c_mktsegment, o_orderpriority
           |  FROM orders JOIN customer ON c_custkey = o_custkey
           |)
           |${fdSql("custkey->nationkey", "o_custkey", "c_nationkey")}
           |UNION ALL
           |${fdSql("nationkey->mktsegment", "c_nationkey", "c_mktsegment")}
           |UNION ALL
           |${fdSql("mktsegment->orderpriority", "c_mktsegment",
            "o_orderpriority")}""".stripMargin
      }
    ) { (s, d) =>
      val den = Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("c_custkey") === col("o_custkey"))
        .select(col("o_custkey"), col("c_nationkey"), col("c_mktsegment"),
          col("o_orderpriority"))
      def fd(name: String, x: String, y: String) =
        den.groupBy(col(x), col(y)).agg(count(lit(1)).as("c"))
          .groupBy(col(x)).agg(sum(col("c")).as("tot"),
            max(col("c")).as("maxc"), count(lit(1)).as("ny"))
          .agg(count(lit(1)).as("n_keys"),
            sum(when(col("ny") > 1, 1).otherwise(0)).cast("long")
              .as("viol_keys"),
            expr("CAST(floor((sum(tot) - sum(maxc)) * 1e0 / sum(tot) * 1e6)"
              + " AS BIGINT)").as("g3_fp"))
          .select(lit(name).as("fd"), col("n_keys"), col("viol_keys"),
            col("g3_fp"))
      fd("custkey->nationkey", "o_custkey", "c_nationkey")
        .unionByName(fd("nationkey->mktsegment", "c_nationkey",
          "c_mktsegment"))
        .unionByName(fd("mktsegment->orderpriority", "c_mktsegment",
          "o_orderpriority"))
    },

    // ---- Ordered conversion funnel view -> click -> purchase: each step
    //      is the user's earliest qualifying event STRICTLY AFTER the
    //      previous step (min-ts chaining, the windowFunnel contract) ----
    QueryDef.sql(
      "q_funnel",
      """WITH u AS (
        |  SELECT DISTINCT user_id FROM events
        |), s1 AS (
        |  SELECT user_id, min(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id
        |), s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t_click
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t_view
        |  GROUP BY e.user_id
        |), s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t_purchase
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
        |  GROUP BY e.user_id
        |)
        |SELECT u.user_id, s1.t_view, s2.t_click, s3.t_purchase,
        |  CASE WHEN s3.user_id IS NOT NULL THEN 3
        |       WHEN s2.user_id IS NOT NULL THEN 2
        |       WHEN s1.user_id IS NOT NULL THEN 1
        |       ELSE 0 END AS funnel_stage
        |FROM u LEFT JOIN s1 ON u.user_id = s1.user_id
        |       LEFT JOIN s2 ON u.user_id = s2.user_id
        |       LEFT JOIN s3 ON u.user_id = s3.user_id""".stripMargin
    ) { (s, d) =>
      val e = ev(s, d)
      val users = e.select(col("user_id")).distinct()
      val s1 = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
      val s2 = e.filter(col("event_type") === "click")
        .join(s1, "user_id")
        .filter(col("ts") > col("t_view"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
      val s3 = e.filter(col("event_type") === "purchase")
        .join(s2, "user_id")
        .filter(col("ts") > col("t_click"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
      users
        .join(s1, Seq("user_id"), "left")
        .join(s2.withColumn("r2", lit(1)), Seq("user_id"), "left")
        .join(s3.withColumn("r3", lit(1)), Seq("user_id"), "left")
        .select(col("user_id"), col("t_view"), col("t_click"),
          col("t_purchase"),
          when(col("r3").isNotNull, 3)
            .when(col("r2").isNotNull, 2)
            .when(col("t_view").isNotNull, 1)
            .otherwise(0).as("funnel_stage"))
    },

    // ---- Time-to-convert between funnel steps: per step pair, the
    //      count, exact mean and (minute-grid) median of the gap
    //      between a user's ordered view→click→purchase times — the
    //      "how long does conversion take" companion to q_funnel's
    //      "how many convert". Durations quantize to a minute grid so
    //      the median is a bounded-grid CDF pick (the q_histogram
    //      convention), never a corpus sort; all windows partition by
    //      step pair over grid rows ----
    QueryDef.sql(
      "q_funnel_time",
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id
        |), s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t_click
        |  FROM events e JOIN s1 ON s1.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t_view
        |  GROUP BY e.user_id
        |), s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t_purchase
        |  FROM events e JOIN s2 ON s2.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
        |  GROUP BY e.user_id
        |), d AS (
        |  SELECT 'view_to_click' AS step_pair,
        |    epoch_us(s2.t_click) - epoch_us(s1.t_view) AS dus
        |  FROM s2 JOIN s1 USING (user_id)
        |  UNION ALL
        |  SELECT 'click_to_purchase',
        |    epoch_us(s3.t_purchase) - epoch_us(s2.t_click)
        |  FROM s3 JOIN s2 USING (user_id)
        |), g AS (
        |  SELECT step_pair, dus // 60000000 AS dmin,
        |    CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(dus) AS BIGINT) AS sdus
        |  FROM d GROUP BY 1, 2
        |), c AS (
        |  SELECT step_pair, dmin,
        |    CAST(sum(cnt) OVER (PARTITION BY step_pair ORDER BY dmin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum,
        |    CAST(sum(cnt) OVER (PARTITION BY step_pair) AS BIGINT) AS n,
        |    CAST(sum(sdus) OVER (PARTITION BY step_pair) AS BIGINT)
        |      AS tot_us
        |  FROM g
        |), p AS (
        |  SELECT step_pair, min(dmin) AS p50_min
        |  FROM c WHERE cum >= (n + 1) // 2 GROUP BY step_pair
        |), t AS (
        |  SELECT step_pair, max(n) AS n, max(tot_us) AS tot
        |  FROM c GROUP BY step_pair
        |)
        |SELECT t.step_pair, n, tot // n AS avg_us, p50_min
        |FROM t JOIN p ON p.step_pair = t.step_pair""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val e = ev(s, d)
      val s1 = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
      val s2 = e.filter(col("event_type") === "click")
        .join(s1, "user_id").filter(col("ts") > col("t_view"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
      val s3 = e.filter(col("event_type") === "purchase")
        .join(s2, "user_id").filter(col("ts") > col("t_click"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
      val dPairs = s2.join(s1, "user_id")
        .select(lit("view_to_click").as("step_pair"),
          (expr("unix_micros(t_click)") - expr("unix_micros(t_view)"))
            .as("dus"))
        .union(s3.join(s2, "user_id")
          .select(lit("click_to_purchase").as("step_pair"),
            (expr("unix_micros(t_purchase)") - expr("unix_micros(t_click)"))
              .as("dus")))
      val g = dPairs
        .groupBy(col("step_pair"), expr("dus div 60000000").as("dmin"))
        .agg(count(lit(1)).as("cnt"), sum(col("dus")).as("sdus"))
      val wCum = Window.partitionBy(col("step_pair")).orderBy(col("dmin"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy(col("step_pair"))
      val c = g
        .withColumn("cum", sum(col("cnt")).over(wCum))
        .withColumn("n", sum(col("cnt")).over(wAll))
        .withColumn("tot_us", sum(col("sdus")).over(wAll))
      val p = c.filter(col("cum") >= expr("(n + 1) div 2"))
        .groupBy(col("step_pair")).agg(min(col("dmin")).as("p50_min"))
      val t = c.groupBy(col("step_pair"))
        .agg(max(col("n")).as("n"), max(col("tot_us")).as("tot"))
      t.join(p, "step_pair")
        .select(col("step_pair"), col("n"),
          expr("tot div n").as("avg_us"), col("p50_min"))
    },

    // ---- Cohort retention: users grouped by first-activity day, distinct
    //      actives counted at each day offset 0..7 — two hash aggs and an
    //      equi-join, integer-exact ----
    QueryDef.sql(
      "q_cohort_retention",
      """WITH firsts AS (
        |  SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
        |  FROM events GROUP BY user_id
        |), activity AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS act_day FROM events
        |)
        |SELECT f.cohort_day,
        |  date_diff('day', f.cohort_day, a.act_day) AS day_offset,
        |  count(DISTINCT a.user_id) AS n_active
        |FROM firsts f JOIN activity a ON f.user_id = a.user_id
        |WHERE date_diff('day', f.cohort_day, a.act_day) BETWEEN 0 AND 7
        |GROUP BY f.cohort_day, day_offset""".stripMargin
    ) { (s, d) =>
      val e = ev(s, d)
      val firsts = e.groupBy(col("user_id"))
        .agg(date_trunc("day", min(col("ts"))).as("cohort_day"))
      val activity = e
        .select(col("user_id"), date_trunc("day", col("ts")).as("act_day"))
        .distinct()
      firsts.join(activity, "user_id")
        .withColumn("day_offset",
          datediff(col("act_day"), col("cohort_day")))
        .filter(col("day_offset").between(0, 7))
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
    },

    // ---- First-order Markov transition matrix over per-user event
    //      sequences (the behavior model behind next-action prediction
    //      and anomaly scoring): transitions from a per-user lead
    //      window on ONE (user_id) exchange, probabilities kept exact
    //      as cnt·1e6 div row-total. At 100 TB the matrix is
    //      #event_types² rows — index metadata, never corpus-sized ----
    QueryDef.sql(
      "q_markov",
      """WITH seq AS (
        |  SELECT user_id, event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS dst
        |  FROM events
        |), tr AS (
        |  SELECT src, dst, count(*) AS cnt FROM seq
        |  WHERE dst IS NOT NULL GROUP BY src, dst
        |), tot AS (
        |  SELECT src, CAST(sum(cnt) AS BIGINT) AS t FROM tr GROUP BY src
        |)
        |SELECT tr.src, tr.dst, tr.cnt,
        |  (tr.cnt * 1000000) // tot.t AS prob_fp
        |FROM tr JOIN tot ON tot.src = tr.src""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val tr = ev(s, d)
        .select(col("user_id"), col("event_type").as("src"),
          lead(col("event_type"), 1).over(w).as("dst"), col("ts"), col("event_id"))
        .filter(col("dst").isNotNull)
        .groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("cnt"))
      val tot = tr.groupBy(col("src").as("tsrc")).agg(sum(col("cnt")).as("t"))
      tr.join(tot, col("tsrc") === col("src"))
        .select(col("src"), col("dst"), col("cnt"),
          expr("(cnt * 1000000) div t").as("prob_fp"))
    },

    // ---- k-step absorption probability over the q_markov chain: for
    //      each event type, P(reach 'purchase' within 6 transitions)
    //      with 'purchase' absorbing — the hitting-time / conversion-
    //      horizon analysis on top of the transition matrix. ONE
    //      corpus-sized window+agg builds the #types² matrix; the 6
    //      backward-iteration rounds are metadata-only broadcast joins
    //      (the matrix is index metadata at any corpus size). Exact
    //      fixed point: per-round Σ p·h then ONE div — terms ≤ S² and
    //      ≤ #types of them, headroom #types·S² < 2^63 (~9e3 types) ----
    QueryDef.sql(
      "q_hitting_time",
      {
        val S = 1000000L
        val rounds = 6
        val sb = new StringBuilder
        sb.append(
          s"""WITH seq AS (
             |  SELECT user_id, event_type AS src,
             |    lead(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS dst
             |  FROM events
             |), tr AS (
             |  SELECT src, dst, count(*) AS cnt FROM seq
             |  WHERE dst IS NOT NULL GROUP BY src, dst
             |), tot AS (
             |  SELECT src, CAST(sum(cnt) AS BIGINT) AS t FROM tr GROUP BY src
             |), pm AS (
             |  SELECT tr.src, tr.dst, (tr.cnt * $S) // tot.t AS p_fp
             |  FROM tr JOIN tot ON tot.src = tr.src
             |), st AS (
             |  SELECT DISTINCT src AS s FROM tr
             |  UNION SELECT DISTINCT dst FROM tr
             |), h0 AS (
             |  SELECT s, CASE WHEN s = 'purchase'
             |    THEN CAST($S AS BIGINT) ELSE CAST(0 AS BIGINT) END AS h
             |  FROM st
             |)""".stripMargin)
        for (i <- 1 to rounds) sb.append(
          s""",
             |h$i AS (
             |  SELECT st.s, CASE WHEN st.s = 'purchase' THEN $S
             |    ELSE COALESCE(x.v, 0) END AS h
             |  FROM st LEFT JOIN (
             |    SELECT pm.src AS s,
             |      CAST(sum(pm.p_fp * h.h) AS BIGINT) // $S AS v
             |    FROM pm JOIN h${i - 1} h ON h.s = pm.dst
             |    GROUP BY pm.src) x USING (s)
             |)""".stripMargin)
        sb.append(s"\nSELECT s AS event_type, h AS p_reach_fp FROM h$rounds")
        sb.toString
      }
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val S = 1000000L
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val tr = ev(s, d)
        .select(col("user_id"), col("event_type").as("src"),
          lead(col("event_type"), 1).over(w).as("dst"))
        .filter(col("dst").isNotNull)
        .groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("cnt"))
      val tot = tr.groupBy(col("src").as("tsrc")).agg(sum(col("cnt")).as("t"))
      val pm = tr.join(tot, col("tsrc") === col("src"))
        .select(col("src"), col("dst"), expr(s"(cnt * ${S}L) div t").as("p_fp"))
      val st = tr.select(col("src").as("s"))
        .union(tr.select(col("dst"))).distinct()
      def absorb(h: org.apache.spark.sql.Column) =
        when(col("s") === "purchase", lit(S)).otherwise(h)
      var h = st.select(col("s"), absorb(lit(0L)).as("h"))
      for (_ <- 1 to 6) {
        val step = pm.join(broadcast(h), h("s") === pm("dst"))
          .groupBy(pm("src").as("s"))
          .agg(sum(expr("p_fp * h")).as("sv"))
          .select(col("s"), expr(s"sv div ${S}L").as("v"))
        h = st.join(broadcast(step), Seq("s"), "left")
          .select(col("s"), absorb(coalesce(col("v"), lit(0L))).as("h"))
      }
      h.select(col("s").as("event_type"), col("h").as("p_reach_fp"))
    },

    // ---- One-way ANOVA F-test across event types (the PARAMETRIC
    //      sibling of q_kruskal's rank test — same question, mean-based
    //      instead of rank-based): do the five value distributions share
    //      a mean? Group moments n/Σx/Σx² are exact int64 over cents
    //      (x² ≤ 1e10·n, safe to ~9e8 rows); the per-group s²/n term is
    //      1e0-quantized BEFORE the exact cross-group sum (the klContrib
    //      convention — s² itself would overflow), SSW = Q − T stays
    //      pure integer, and the final F is ONE identical-op-order
    //      double chain over the exact sums ----
    QueryDef.sql(
      "q_anova",
      """WITH g AS (
        |  SELECT event_type,
        |    CAST(count(*) AS BIGINT) AS n_j,
        |    CAST(sum(c) AS BIGINT) AS s_j,
        |    CAST(sum(c * c) AS BIGINT) AS q_j,
        |    CAST(floor((CAST(sum(c) AS BIGINT) * 1e0
        |      * CAST(sum(c) AS BIGINT)) / count(*)) AS BIGINT) AS t_j
        |  FROM (SELECT event_type,
        |          CAST(floor(value * 1e2 + 5e-1) AS BIGINT) AS c
        |        FROM events)
        |  GROUP BY event_type
        |), tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(n_j) AS BIGINT) AS n, CAST(sum(s_j) AS BIGINT) AS s,
        |    CAST(sum(q_j) AS BIGINT) AS q, CAST(sum(t_j) AS BIGINT) AS t
        |  FROM g
        |)
        |SELECT k, n, q, t,
        |  CAST(floor(t * 1e0 - (s * 1e0 * s) / n) AS BIGINT) AS ssb_fp,
        |  q - t AS ssw_fp,
        |  CASE WHEN k >= 2 AND n > k AND q - t > 0
        |    THEN CAST(floor(((t * 1e0 - (s * 1e0 * s) / n) / (k - 1))
        |      / ((q * 1e0 - t * 1e0) / (n - k)) * 1e6) AS BIGINT)
        |    ELSE NULL END AS f_fp
        |FROM tot""".stripMargin
    ) { (s, d) =>
      val g = Tables.events(s, d)
        .select(col("event_type"),
          expr("CAST(floor(value * 1e2 + 5e-1) AS BIGINT)").as("c"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_j"), sum(col("c")).as("s_j"),
          sum(expr("c * c")).as("q_j"))
        .withColumn("t_j",
          expr("CAST(floor((s_j * 1e0 * s_j) / n_j) AS BIGINT)"))
      g.agg(count(lit(1)).as("k"), sum(col("n_j")).as("n"),
          sum(col("s_j")).as("s"), sum(col("q_j")).as("q"),
          sum(col("t_j")).as("t"))
        .select(col("k"), col("n"), col("q"), col("t"),
          expr("CAST(floor(t * 1e0 - (s * 1e0 * s) / n) AS BIGINT)")
            .as("ssb_fp"),
          (col("q") - col("t")).as("ssw_fp"),
          when(col("k") >= 2 && col("n") > col("k")
              && col("q") - col("t") > 0,
            expr("CAST(floor(((t * 1e0 - (s * 1e0 * s) / n) / (k - 1))" +
              " / ((q * 1e0 - t * 1e0) / (n - k)) * 1e6) AS BIGINT)"))
            .otherwise(lit(null)).as("f_fp"))
    },

    // ---- Levene's test for variance homogeneity (mean-centered
    //      variant) — the assumption check BEHIND q_anova: are the five
    //      value spreads equal? ANOVA's own F machinery applied to the
    //      absolute deviations z = |c − floor-mean_j| (integer floor
    //      means, documented — Brown-Forsythe's median centering would
    //      put an interpolated quantile inside every row). Two passes:
    //      one grouped agg for the means (broadcast back), then the
    //      exact q_anova moment recipe over z ----
    QueryDef.sql(
      "q_levene",
      """WITH c AS (
        |  SELECT event_type, CAST(floor(value * 1e2 + 5e-1) AS BIGINT) AS c
        |  FROM events
        |), m AS (
        |  SELECT event_type, CAST(sum(c) AS BIGINT) // count(*) AS mu
        |  FROM c GROUP BY event_type
        |), z AS (
        |  SELECT c.event_type, abs(c.c - m.mu) AS z
        |  FROM c JOIN m ON m.event_type = c.event_type
        |), g AS (
        |  SELECT event_type,
        |    CAST(count(*) AS BIGINT) AS n_j,
        |    CAST(sum(z) AS BIGINT) AS s_j,
        |    CAST(sum(z * z) AS BIGINT) AS q_j,
        |    CAST(floor((CAST(sum(z) AS BIGINT) * 1e0
        |      * CAST(sum(z) AS BIGINT)) / count(*)) AS BIGINT) AS t_j
        |  FROM z GROUP BY event_type
        |), tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(n_j) AS BIGINT) AS n, CAST(sum(s_j) AS BIGINT) AS s,
        |    CAST(sum(q_j) AS BIGINT) AS q, CAST(sum(t_j) AS BIGINT) AS t
        |  FROM g
        |)
        |SELECT k, n, q, t,
        |  CASE WHEN k >= 2 AND n > k AND q - t > 0
        |    THEN CAST(floor(((t * 1e0 - (s * 1e0 * s) / n) / (k - 1))
        |      / ((q * 1e0 - t * 1e0) / (n - k)) * 1e6) AS BIGINT)
        |    ELSE NULL END AS w_fp
        |FROM tot""".stripMargin
    ) { (s, d) =>
      val c = Tables.events(s, d)
        .select(col("event_type"),
          expr("CAST(floor(value * 1e2 + 5e-1) AS BIGINT)").as("c"))
      val m = c.groupBy(col("event_type").as("met"))
        .agg(expr("CAST(sum(c) AS BIGINT) div count(*)").as("mu"))
      val z = c.join(broadcast(m), col("met") === col("event_type"))
        .select(col("event_type"), abs(col("c") - col("mu")).as("z"))
      val g = z.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_j"), sum(col("z")).as("s_j"),
          sum(expr("z * z")).as("q_j"))
        .withColumn("t_j",
          expr("CAST(floor((s_j * 1e0 * s_j) / n_j) AS BIGINT)"))
      g.agg(count(lit(1)).as("k"), sum(col("n_j")).as("n"),
          sum(col("s_j")).as("s"), sum(col("q_j")).as("q"),
          sum(col("t_j")).as("t"))
        .select(col("k"), col("n"), col("q"), col("t"),
          when(col("k") >= 2 && col("n") > col("k")
              && col("q") - col("t") > 0,
            expr("CAST(floor(((t * 1e0 - (s * 1e0 * s) / n) / (k - 1))" +
              " / ((q * 1e0 - t * 1e0) / (n - k)) * 1e6) AS BIGINT)"))
            .otherwise(lit(null)).as("w_fp"))
    },

    // ---- Offline bandit policy evaluation by replay (see
    //      ops.BanditReplay — Li et al.'s counterfactual method): a
    //      deterministic epsilon-greedy policy walks each user's logged
    //      stream; only events whose logged arm matches the policy's
    //      pick count. Per-user (arm, pulls, rewards) scorecard;
    //      everything integer so the sequential decisions are bit-exact
    //      cross-engine ----
    QueryDef.sql(
      "q_bandit_replay",
      s"""WITH RECURSIVE graft_bandit_ev AS MATERIALIZED (
         |  SELECT user_id,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS rn,
         |    ${graft.ops.BanditReplay.Arms.zipWithIndex
               .map { case (a, i) => s"WHEN event_type = '$a' THEN $i" }
               .mkString("CASE ", " ", " ELSE -1 END")} AS arm,
         |    CASE WHEN value >= 26e1 THEN 1 ELSE 0 END AS r,
         |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)
         |      || ':' || CAST(row_number() OVER (PARTITION BY user_id
         |           ORDER BY ts, event_id) AS VARCHAR)), 1, 15))
         |      AS BIGINT) AS ex
         |  FROM events
         |),
         |${graft.ops.BanditReplay.oracleSql}""".stripMargin
    ) { (s, d) =>
      graft.ops.BanditReplay.replay(
        Tables.events(s, d).select(col("user_id"), col("ts"),
          col("event_id"), col("event_type"), col("value")))
    },

    // ---- Wald's SPRT (sequential probability ratio test) per variant:
    //      the SEQUENTIAL member of the testing tier — q_ab_test decides
    //      on a fixed sample, this walks the cumulative log-likelihood
    //      ratio in event order and reports the FIRST boundary crossing
    //      (the always-valid early-stopping workload). H0: conversion
    //      p0 = 0.19, H1: p1 = 0.21, alpha = beta = 0.05; per-event
    //      increments and both Wald boundaries are 1e6-quantized ln
    //      constants SPELLED IDENTICALLY on both engines, the walk is
    //      an exact int64 cumulative window sum, the first crossing one
    //      min(struct) agg. One shuffle on the variant key ----
    QueryDef.sql(
      "q_sprt",
      """WITH obs AS (
        |  SELECT user_id % 2 AS variant,
        |    row_number() OVER (PARTITION BY user_id % 2
        |      ORDER BY ts, event_id) AS rn,
        |    CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(ln(21e-2 / 19e-2) * 1e6) AS BIGINT)
        |      ELSE CAST(floor(ln(79e-2 / 81e-2) * 1e6) AS BIGINT)
        |    END AS inc
        |  FROM events
        |), walk AS (
        |  SELECT variant, rn,
        |    CAST(sum(inc) OVER (PARTITION BY variant ORDER BY rn
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS llr
        |  FROM obs
        |), bounds AS (
        |  SELECT CAST(floor(ln(95e-2 / 5e-2) * 1e6) AS BIGINT) AS up_fp,
        |    CAST(floor(ln(5e-2 / 95e-2) * 1e6) AS BIGINT) AS low_fp
        |), crossing AS (
        |  SELECT variant, min(rn) AS cross_rn
        |  FROM walk CROSS JOIN bounds
        |  WHERE llr >= up_fp OR llr <= low_fp
        |  GROUP BY variant
        |), tot AS (
        |  SELECT variant, CAST(count(*) AS BIGINT) AS n FROM obs GROUP BY 1
        |)
        |SELECT t.variant, t.n, b.up_fp, b.low_fp,
        |  c.cross_rn, w.llr AS cross_llr_fp,
        |  CASE WHEN c.cross_rn IS NULL THEN 'continue'
        |       WHEN w.llr >= b.up_fp THEN 'h1' ELSE 'h0' END AS decision
        |FROM tot t CROSS JOIN bounds b
        |LEFT JOIN crossing c ON c.variant = t.variant
        |LEFT JOIN walk w ON w.variant = t.variant AND w.rn = c.cross_rn""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val obs = ev(s, d)
        .select((col("user_id") % 2).as("variant"),
          col("ts"), col("event_id"),
          when(col("event_type") === "purchase",
            expr("CAST(floor(ln(21e-2 / 19e-2) * 1e6) AS BIGINT)"))
            .otherwise(expr("CAST(floor(ln(79e-2 / 81e-2) * 1e6) AS BIGINT)"))
            .as("inc"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("variant")).orderBy(col("ts"), col("event_id"))))
      val walk = obs.withColumn("llr",
        sum(col("inc")).over(Window.partitionBy(col("variant"))
          .orderBy(col("rn"))
          .rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("variant"), col("rn"), col("llr"))
      val bounds = ev(s, d).limit(1).select(
        expr("CAST(floor(ln(95e-2 / 5e-2) * 1e6) AS BIGINT)").as("up_fp"),
        expr("CAST(floor(ln(5e-2 / 95e-2) * 1e6) AS BIGINT)").as("low_fp"))
      val crossing = walk.crossJoin(broadcast(bounds))
        .filter(col("llr") >= col("up_fp") || col("llr") <= col("low_fp"))
        .groupBy(col("variant")).agg(min(col("rn")).as("cross_rn"))
      val tot = obs.groupBy(col("variant")).agg(count(lit(1)).as("n"))
      // the crossing llr comes from probing the corpus-sized walk with
      // the BROADCAST #variants-row crossing frame — never the reverse
      val crossLlr = walk
        .join(broadcast(crossing.select(col("variant").as("wv"),
          col("cross_rn"))),
          col("wv") === col("variant") && col("rn") === col("cross_rn"))
        .select(col("variant"), col("cross_rn"), col("llr"))
      tot.crossJoin(broadcast(bounds))
        .join(broadcast(crossLlr), Seq("variant"), "left")
        .select(col("variant"), col("n"), col("up_fp"), col("low_fp"),
          col("cross_rn"), col("llr").as("cross_llr_fp"),
          when(col("cross_rn").isNull, "continue")
            .when(col("llr") >= col("up_fp"), "h1")
            .otherwise("h0").as("decision"))
    }.intendsNestedLoop(
      "cross joins against the broadcast 1-row Wald-boundary frame"),

    // ---- Mutual information between event type and hour-of-day — the
    //      dependence diagnostic completing the drift/association tier
    //      (q_dist_drift measures shift BETWEEN corpora, this measures
    //      coupling WITHIN one): MI = Σ p_xy·ln(p_xy/(p_x·p_y)) over the
    //      (#types × 24)-cell contingency table, each cell's
    //      contribution 1e6-quantized BEFORE the exact integer sum (the
    //      klContrib convention), entropies alike, NMI = one final div.
    //      Headroom: nxy·n < n² ≤ 2^63 up to n ≈ 3e9 events; the cell
    //      table is metadata-sized at any corpus ----
    QueryDef.sql(
      "q_mutual_info",
      """WITH cells AS (
        |  SELECT event_type AS x, CAST(hour(ts) AS BIGINT) AS y,
        |    CAST(count(*) AS BIGINT) AS nxy
        |  FROM events GROUP BY 1, 2
        |), mx AS (
        |  SELECT x, CAST(sum(nxy) AS BIGINT) AS nx FROM cells GROUP BY x
        |), my AS (
        |  SELECT y, CAST(sum(nxy) AS BIGINT) AS ny FROM cells GROUP BY y
        |), tot AS (
        |  SELECT CAST(sum(nxy) AS BIGINT) AS n FROM cells
        |), terms AS (
        |  SELECT
        |    CAST(sum(CAST(floor(ln((nxy * n) * 1e0 / (nx * ny))
        |      * nxy * 1e6 / n) AS BIGINT)) AS BIGINT) AS mi_fp,
        |    CAST(sum(CASE WHEN rn_x = 1 THEN
        |      CAST(floor(ln(n * 1e0 / nx) * nx * 1e6 / n) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS hx_fp,
        |    CAST(sum(CASE WHEN rn_y = 1 THEN
        |      CAST(floor(ln(n * 1e0 / ny) * ny * 1e6 / n) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS hy_fp,
        |    min(n) AS n
        |  FROM (
        |    SELECT cells.*, nx, ny, n,
        |      row_number() OVER (PARTITION BY cells.x ORDER BY cells.y) AS rn_x,
        |      row_number() OVER (PARTITION BY cells.y ORDER BY cells.x) AS rn_y
        |    FROM cells JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot)
        |)
        |SELECT n, mi_fp, hx_fp, hy_fp,
        |  CASE WHEN least(hx_fp, hy_fp) > 0
        |       THEN (mi_fp * 1000000) // least(hx_fp, hy_fp)
        |       ELSE CAST(0 AS BIGINT) END AS nmi_fp
        |FROM terms""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val cells = Tables.events(s, d)
        .select(col("event_type").as("x"),
          hour(col("ts")).cast("long").as("y"))
        .groupBy(col("x"), col("y")).agg(count(lit(1)).as("nxy"))
      val mx = cells.groupBy(col("x")).agg(sum(col("nxy")).as("nx"))
      val my = cells.groupBy(col("y")).agg(sum(col("nxy")).as("ny"))
      val tot = cells.agg(sum(col("nxy")).as("n"))
      val joined = cells.join(mx, "x").join(my, "y")
        .crossJoin(broadcast(tot))
        .withColumn("rn_x",
          row_number().over(Window.partitionBy(col("x")).orderBy(col("y"))))
        .withColumn("rn_y",
          row_number().over(Window.partitionBy(col("y")).orderBy(col("x"))))
      val terms = joined.agg(
        sum(expr(
          "CAST(floor(ln((nxy * n) * 1e0 / (nx * ny)) * nxy * 1e6 / n) AS BIGINT)"))
          .cast("long").as("mi_fp"),
        sum(expr("CASE WHEN rn_x = 1 THEN " +
          "CAST(floor(ln(n * 1e0 / nx) * nx * 1e6 / n) AS BIGINT) " +
          "ELSE CAST(0 AS BIGINT) END")).cast("long").as("hx_fp"),
        sum(expr("CASE WHEN rn_y = 1 THEN " +
          "CAST(floor(ln(n * 1e0 / ny) * ny * 1e6 / n) AS BIGINT) " +
          "ELSE CAST(0 AS BIGINT) END")).cast("long").as("hy_fp"),
        min(col("n")).as("n"))
      terms.select(col("n"), col("mi_fp"), col("hx_fp"), col("hy_fp"),
        when(least(col("hx_fp"), col("hy_fp")) > 0,
          expr("(mi_fp * 1000000) div least(hx_fp, hy_fp)"))
          .otherwise(0L).as("nmi_fp"))
    }.intendsNestedLoop(
      "cross join against the broadcast 1-row total-count frame"),

    // ---- Cohen's kappa inter-rater agreement per event type — the
    //      chance-corrected agreement statistic completing the eval
    //      tier next to q_eval_confusion/q_calibration: rater A flags
    //      values above their TYPE average, rater B above the GLOBAL
    //      average (two cheap deterministic raters; the operator is the
    //      kappa algebra). Integer-exact: thresholds are `sum div n`
    //      cents, cell counts exact, po/pe on S=1e6 fp with the
    //      2·n²·S < 2^63 headroom bound (n ≤ 2e6 per type; shrink S
    //      beyond), kappa = ((po−pe)·S) div (S−pe) guarded at pe=S
    //      (negative kappa flows through — both engines' int division
    //      truncates toward zero, the verified round-4 invariant) ----
    QueryDef.sql(
      "q_kappa",
      """WITH c AS (
        |  SELECT event_type, CAST(floor(value * 1e2 + 5e-1) AS BIGINT) AS v
        |  FROM events
        |), ta AS (
        |  SELECT event_type,
        |    CAST(sum(v) AS BIGINT) // count(*) AS thr_t FROM c GROUP BY 1
        |), tg AS (
        |  SELECT CAST(sum(v) AS BIGINT) // count(*) AS thr_g FROM c
        |), cells AS (
        |  SELECT c.event_type,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN v > thr_t AND v > thr_g THEN 1 ELSE 0 END) AS BIGINT) AS n11,
        |    CAST(sum(CASE WHEN v <= thr_t AND v <= thr_g THEN 1 ELSE 0 END) AS BIGINT) AS n00,
        |    CAST(sum(CASE WHEN v > thr_t AND v <= thr_g THEN 1 ELSE 0 END) AS BIGINT) AS n10,
        |    CAST(sum(CASE WHEN v <= thr_t AND v > thr_g THEN 1 ELSE 0 END) AS BIGINT) AS n01
        |  FROM c JOIN ta ON ta.event_type = c.event_type CROSS JOIN tg
        |  GROUP BY c.event_type
        |)
        |SELECT event_type, n, n11, n00, n10, n01,
        |  ((n11 + n00) * 1000000) // n AS po_fp,
        |  (((n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10))
        |    * 1000000) // (n * n) AS pe_fp,
        |  CASE WHEN (((n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10))
        |              * 1000000) // (n * n) = 1000000
        |       THEN CAST(0 AS BIGINT)
        |       ELSE ((((n11 + n00) * 1000000) // n
        |              - (((n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10))
        |                 * 1000000) // (n * n)) * 1000000)
        |            // (1000000
        |               - (((n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10))
        |                  * 1000000) // (n * n)) END AS kappa_fp
        |FROM cells""".stripMargin
    ) { (s, d) =>
      val c = Tables.events(s, d).select(col("event_type"),
        expr("CAST(floor(value * 1e2 + 5e-1) AS BIGINT)").as("v"))
      val ta = c.groupBy(col("event_type").as("tet"))
        .agg(expr("CAST(sum(v) AS BIGINT) div count(*)").as("thr_t"))
      val tg = c.agg(
        expr("CAST(sum(v) AS BIGINT) div count(*)").as("thr_g"))
      val cells = c
        .join(ta, col("tet") === col("event_type"))
        .crossJoin(broadcast(tg))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("v") > col("thr_t") && col("v") > col("thr_g"), 1L)
            .otherwise(0L)).as("n11"),
          sum(when(col("v") <= col("thr_t") && col("v") <= col("thr_g"), 1L)
            .otherwise(0L)).as("n00"),
          sum(when(col("v") > col("thr_t") && col("v") <= col("thr_g"), 1L)
            .otherwise(0L)).as("n10"),
          sum(when(col("v") <= col("thr_t") && col("v") > col("thr_g"), 1L)
            .otherwise(0L)).as("n01"))
      val S = 1000000L
      cells
        .withColumn("po_fp", expr(s"((n11 + n00) * $S) div n"))
        .withColumn("pe_fp", expr(
          s"(((n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)) * $S)" +
            s" div (n * n)"))
        .withColumn("kappa_fp",
          when(col("pe_fp") === S, 0L)
            .otherwise(expr(s"((po_fp - pe_fp) * $S) div ($S - pe_fp)")))
        .select(col("event_type"), col("n"), col("n11"), col("n00"),
          col("n10"), col("n01"), col("po_fp"), col("pe_fp"),
          col("kappa_fp"))
    }.intendsNestedLoop(
      "cross join against the broadcast 1-row global-threshold frame"),

    // ---- Markov removal-effect attribution (Anderl et al.'s data-
    //      driven alternative to q_attribution's rule-based credits):
    //      per channel, how much does 6-step start→purchase conversion
    //      drop when every transition INTO the channel is diverted to
    //      non-conversion (no renormalization — the standard removal
    //      semantics)? Reuses the q_hitting_time fixed-point machinery
    //      (S=1e6 fp, per-round Σ p·h then ONE div) on the same
    //      #types²-bounded matrix plus a synthetic start state fed by
    //      each user's first event; 5 tiny chains (baseline + one per
    //      channel), all broadcast metadata. removal_fp =
    //      S − (p_removed·S) div p_base, exact integers ----
    QueryDef.sql(
      "q_removal_effect",
      {
        val S = 1000000L
        val rounds = 6
        val channels = Seq("click", "view", "error", "signup")
        val sb = new StringBuilder
        sb.append(
          s"""WITH seq AS (
             |  SELECT user_id, event_type AS src,
             |    lead(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS dst
             |  FROM events
             |), fe AS (
             |  SELECT 'graft_start' AS src, event_type AS dst FROM (
             |    SELECT event_type, row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS rn FROM events)
             |  WHERE rn = 1
             |), tr AS (
             |  SELECT src, dst, count(*) AS cnt FROM (
             |    SELECT src, dst FROM seq WHERE dst IS NOT NULL
             |    UNION ALL SELECT src, dst FROM fe)
             |  GROUP BY src, dst
             |), tot AS (
             |  SELECT src, CAST(sum(cnt) AS BIGINT) AS t FROM tr GROUP BY src
             |), pm AS (
             |  SELECT tr.src, tr.dst, (tr.cnt * $S) // tot.t AS p_fp
             |  FROM tr JOIN tot ON tot.src = tr.src
             |), st AS (
             |  SELECT DISTINCT src AS s FROM tr
             |  UNION SELECT DISTINCT dst FROM tr
             |)""".stripMargin)
        // one fixed-point chain per variant: '' = baseline, else the
        // removed channel (its inbound transitions divert to null)
        ("" +: channels).foreach { c =>
          val tag = if (c.isEmpty) "base" else s"rm_$c"
          val pmPred = if (c.isEmpty) "" else s" WHERE dst <> '$c'"
          sb.append(
            s""",
               |pm_$tag AS (SELECT * FROM pm$pmPred),
               |h${tag}_0 AS (
               |  SELECT s, CASE WHEN s = 'purchase'
               |    THEN CAST($S AS BIGINT) ELSE CAST(0 AS BIGINT) END AS h
               |  FROM st
               |)""".stripMargin)
          for (i <- 1 to rounds) sb.append(
            s""",
               |h${tag}_$i AS (
               |  SELECT st.s, CASE WHEN st.s = 'purchase' THEN $S
               |    ELSE COALESCE(x.v, 0) END AS h
               |  FROM st LEFT JOIN (
               |    SELECT p.src AS s,
               |      CAST(sum(p.p_fp * h.h) AS BIGINT) // $S AS v
               |    FROM pm_$tag p JOIN h${tag}_${i - 1} h ON h.s = p.dst
               |    GROUP BY p.src) x USING (s)
               |)""".stripMargin)
        }
        sb.append(
          channels.map { c =>
            s"""
               |SELECT '$c' AS channel, b.h AS p_base_fp, r.h AS p_removed_fp,
               |  CASE WHEN b.h > 0 THEN $S - (r.h * $S) // b.h
               |       ELSE CAST(0 AS BIGINT) END AS removal_fp
               |FROM h${"base"}_$rounds b JOIN hrm_${c}_$rounds r
               |  ON b.s = 'graft_start' AND r.s = 'graft_start'""".stripMargin
          }.mkString("\nUNION ALL"))
        sb.toString
      }
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val S = 1000000L
      val channels = Seq("click", "view", "error", "signup")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val e = ev(s, d)
      val seq = e
        .select(col("user_id"), col("event_type").as("src"),
          lead(col("event_type"), 1).over(w).as("dst"))
        .filter(col("dst").isNotNull)
        .select(col("src"), col("dst"))
      val fe = e.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(lit("graft_start").as("src"), col("event_type").as("dst"))
      val tr = seq.unionAll(fe)
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("cnt"))
      val tot = tr.groupBy(col("src").as("tsrc")).agg(sum(col("cnt")).as("t"))
      val pm = tr.join(tot, col("tsrc") === col("src"))
        .select(col("src"), col("dst"), expr(s"(cnt * ${S}L) div t").as("p_fp"))
      val st = tr.select(col("src").as("s"))
        .union(tr.select(col("dst"))).distinct()
      def absorb(h: org.apache.spark.sql.Column) =
        when(col("s") === "purchase", lit(S)).otherwise(h)
      def reach(pmv: DataFrame): DataFrame = {
        var h = st.select(col("s"), absorb(lit(0L)).as("h"))
        for (_ <- 1 to 6) {
          val step = pmv.join(broadcast(h), h("s") === pmv("dst"))
            .groupBy(pmv("src").as("s"))
            .agg(sum(expr("p_fp * h")).as("sv"))
            .select(col("s"), expr(s"sv div ${S}L").as("v"))
          h = st.join(broadcast(step), Seq("s"), "left")
            .select(col("s"), absorb(coalesce(col("v"), lit(0L))).as("h"))
        }
        h.filter(col("s") === "graft_start")
      }
      val base = reach(pm).select(col("h").as("p_base_fp"))
      channels.map { c =>
        reach(pm.filter(col("dst") =!= c))
          .select(lit(c).as("channel"), col("h").as("p_removed_fp"))
          .crossJoin(broadcast(base))
          .select(col("channel"), col("p_base_fp"), col("p_removed_fp"),
            when(col("p_base_fp") > 0,
              lit(S) - expr(s"(p_removed_fp * ${S}L) div p_base_fp"))
              .otherwise(0L).as("removal_fp"))
      }.reduce(_ unionAll _)
    }.intendsNestedLoop(
      "cross join against the broadcast 1-row baseline-conversion frame"),

    // ---- Top event 3-paths per user sequence (the path-mining
    //      generalization of q_markov's transitions — the Sankey /
    //      user-journey query): two leads over the SAME (user_id)
    //      window exchange, one groupBy, TakeOrdered top-20 ----
    QueryDef.sql(
      "q_event_paths",
      """WITH seq AS (
        |  SELECT user_id, event_type AS e1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS e2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS e3
        |  FROM events
        |)
        |SELECT e1, e2, e3, count(*) AS cnt FROM seq
        |WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY e1, e2, e3
        |ORDER BY cnt DESC, e1, e2, e3 LIMIT 20""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev(s, d)
        .select(col("user_id"), col("event_type").as("e1"),
          lead(col("event_type"), 1).over(w).as("e2"),
          lead(col("event_type"), 2).over(w).as("e3"))
        .filter(col("e2").isNotNull && col("e3").isNotNull)
        .groupBy(col("e1"), col("e2"), col("e3"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("e1"), col("e2"), col("e3"))
        .limit(20)
    },

    // ---- RFM segmentation (the classic customer-value triage): per
    //      customer Recency (days since last order vs the corpus max
    //      day), Frequency (order count), Monetary (2-decimal
    //      fixed-point spend, COARSENED to a 100-unit grid for
    //      bucketing), each quintiled by the integer empirical CDF
    //      (bucket = floor(5·|{x<v}|/n) — the q_decile_bucket
    //      convention, deterministic cross-engine at any scale), and
    //      the 3-digit rfm_code. Scale shape: one groupBy on the
    //      customer key; each CDF window runs over a DISTINCT-VALUE
    //      frame bounded by the day / order-count / coarse-money grids
    //      — never the customer table — and broadcasts back. ----
    QueryDef.sql(
      "q_rfm",
      """WITH cust AS (
        |  SELECT o_custkey,
        |    CAST(max(CAST(o_orderdate AS DATE)) AS DATE) AS cmax,
        |    count(*) AS f,
        |    CAST(sum(CAST(floor(o_totalprice * 1e2) AS BIGINT)) AS BIGINT)
        |      AS m_fp
        |  FROM orders GROUP BY o_custkey
        |), g AS (
        |  SELECT max(cmax) AS gmax FROM cust
        |), base AS (
        |  SELECT o_custkey, gmax - cmax AS r, f, m_fp,
        |    m_fp // 10000 AS mg
        |  FROM cust CROSS JOIN g
        |), rq AS (
        |  SELECT r AS v, CAST(coalesce(sum(c) OVER (ORDER BY r
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS lt, CAST(sum(c) OVER () AS BIGINT) AS n
        |  FROM (SELECT r, count(*) AS c FROM base GROUP BY r)
        |), fq AS (
        |  SELECT f AS v, CAST(coalesce(sum(c) OVER (ORDER BY f
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS lt, CAST(sum(c) OVER () AS BIGINT) AS n
        |  FROM (SELECT f, count(*) AS c FROM base GROUP BY f)
        |), mq AS (
        |  SELECT mg AS v, CAST(coalesce(sum(c) OVER (ORDER BY mg
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS lt, CAST(sum(c) OVER () AS BIGINT) AS n
        |  FROM (SELECT mg, count(*) AS c FROM base GROUP BY mg)
        |)
        |SELECT b.o_custkey, CAST(b.r AS BIGINT) AS r_days, b.f AS f_orders,
        |  b.m_fp,
        |  CAST(floor(5e0 * rq.lt / rq.n) AS BIGINT) AS r_q,
        |  CAST(floor(5e0 * fq.lt / fq.n) AS BIGINT) AS f_q,
        |  CAST(floor(5e0 * mq.lt / mq.n) AS BIGINT) AS m_q,
        |  CAST(floor(5e0 * rq.lt / rq.n) * 100
        |    + floor(5e0 * fq.lt / fq.n) * 10
        |    + floor(5e0 * mq.lt / mq.n) AS BIGINT) AS rfm_code
        |FROM base b
        |JOIN rq ON rq.v = b.r
        |JOIN fq ON fq.v = b.f
        |JOIN mq ON mq.v = b.mg""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val cust = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(max(to_date(col("o_orderdate"))).as("cmax"),
          count(lit(1)).as("f"),
          sum(floor(col("o_totalprice") * 1e2).cast("long")).as("m_fp"))
      val g = cust.agg(max(col("cmax")).as("gmax"))
      val base = cust.crossJoin(broadcast(g))
        .select(col("o_custkey"), datediff(col("gmax"), col("cmax")).as("r"),
          col("f"), col("m_fp"), expr("m_fp div 10000").as("mg"))
      def cdf(metric: String): DataFrame = {
        val vc = base.groupBy(col(metric)).agg(count(lit(1)).as("c"))
        val wLt = Window.orderBy(col(metric))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wAll = Window.partitionBy()
        vc.select(col(metric).as("v"),
          coalesce(sum(col("c")).over(wLt), lit(0L)).as("lt"),
          sum(col("c")).over(wAll).as("n"))
      }
      def quint(t: String) = floor(lit(5.0) * col(s"${t}_lt") / col(s"${t}_n"))
        .cast("long")
      val rq = cdf("r").select(col("v").as("r_v"), col("lt").as("r_lt"),
        col("n").as("r_n"))
      val fq = cdf("f").select(col("v").as("f_v"), col("lt").as("f_lt"),
        col("n").as("f_n"))
      val mq = cdf("mg").select(col("v").as("m_v"), col("lt").as("m_lt"),
        col("n").as("m_n"))
      base
        .join(broadcast(rq), col("r_v") === col("r"))
        .join(broadcast(fq), col("f_v") === col("f"))
        .join(broadcast(mq), col("m_v") === col("mg"))
        .select(col("o_custkey"), col("r").cast("long").as("r_days"),
          col("f").as("f_orders"), col("m_fp"),
          quint("r").as("r_q"), quint("f").as("f_q"), quint("m").as("m_q"),
          (quint("r") * 100 + quint("f") * 10 + quint("m")).as("rfm_code"))
    }.intendsNestedLoop(
      "broadcast side is the 1-row global-max-day frame")
      .intendsGlobalWindow(
        "windowed frames are the three DISTINCT-VALUE grids (days, " +
          "order counts, 100-unit money buckets) — grid-bounded, never " +
          "the customer table"),

    // ---- Two-proportion A/B z-test: variant = user_id parity (the
    //      deterministic hash-split convention of q_split_sets),
    //      conversion = the user purchased at least once. Counts are
    //      exact int64 from ONE user-keyed agg + a 4-way conditional
    //      agg to a single row; the pooled z statistic runs in doubles
    //      with the IDENTICAL textual op order on both engines
    //      (int64 -> double conversions and IEEE /,*,sqrt are
    //      deterministic), then quantizes to 1e6 fp. Scale shape: one
    //      shuffle on user_id, then scalar algebra on a 1-row frame ----
    QueryDef.sql(
      "q_ab_test",
      """WITH u AS (
        |  SELECT user_id, user_id % 2 AS variant,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id
        |), v AS (
        |  SELECT
        |    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT) AS c_a,
        |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT) AS c_b
        |  FROM u
        |)
        |SELECT n_a, c_a, n_b, c_b,
        |  CAST(floor((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
        |    * 1e6) AS BIGINT) AS lift_fp,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND c_a + c_b > 0
        |            AND c_a + c_b < n_a + n_b THEN
        |    CAST(floor((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
        |      / sqrt(CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)
        |             * (1e0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
        |             * (1e0 / n_a + 1e0 / n_b))
        |      * 1e6) AS BIGINT)
        |  END AS z_fp
        |FROM v""".stripMargin
    ) { (s, d) =>
      val u = ev(s, d)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("conv"))
        .withColumn("variant", pmod(col("user_id"), lit(2)))
      val v = u.agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("variant") === 0, col("conv").cast("long")).otherwise(0L))
          .as("c_a"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("variant") === 1, col("conv").cast("long")).otherwise(0L))
          .as("c_b"))
      v.select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
        expr("CAST(floor((CAST(c_a AS DOUBLE) / n_a " +
          "- CAST(c_b AS DOUBLE) / n_b) * 1e6) AS BIGINT)").as("lift_fp"),
        expr("""CASE WHEN n_a > 0 AND n_b > 0 AND c_a + c_b > 0
               |          AND c_a + c_b < n_a + n_b THEN
               |  CAST(floor((CAST(c_a AS DOUBLE) / n_a
               |    - CAST(c_b AS DOUBLE) / n_b)
               |    / sqrt(CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)
               |           * (1e0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
               |           * (1e0 / n_a + 1e0 / n_b))
               |    * 1e6) AS BIGINT)
               |END""".stripMargin).as("z_fp"))
    },

    // ---- Wilson lower-bound ranking of per-brand return rates: the
    //      "how not to sort by average rating" estimator — a brand with
    //      2/3 lines returned must rank below one with 200/300, which
    //      the raw ratio gets backwards. Exact int64 (n, r) per brand
    //      from one co-partitioned lineitem-part join + hash agg; the
    //      Wilson bound (z = 1.96) runs in doubles with identical
    //      textual op order (IEEE /,*,sqrt on exact int64 inputs),
    //      quantized to 1e6 fp ----
    QueryDef.sql(
      "q_wilson",
      """WITH b AS (
        |  SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS r
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY p.p_brand
        |)
        |SELECT p_brand, n, r,
        |  CAST(floor(
        |    (CAST(r AS DOUBLE) / n + 38416e-4 / (2e0 * n)
        |     - 196e-2 * sqrt((CAST(r AS DOUBLE) / n
        |                      * (1e0 - CAST(r AS DOUBLE) / n)) / n
        |                     + 38416e-4 / (4e0 * n * n)))
        |    / (1e0 + 38416e-4 / n) * 1e6) AS BIGINT) AS wilson_fp
        |FROM b WHERE n > 0""".stripMargin
    ) { (s, d) =>
      val b = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_returnflag"))
        .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("r"))
      b.filter(col("n") > 0)
        .select(col("p_brand"), col("n"), col("r"),
          expr("""CAST(floor(
                 |  (CAST(r AS DOUBLE) / n + 38416e-4 / (2e0 * n)
                 |   - 196e-2 * sqrt((CAST(r AS DOUBLE) / n
                 |                    * (1e0 - CAST(r AS DOUBLE) / n)) / n
                 |                   + 38416e-4 / (4e0 * n * n)))
                 |  / (1e0 + 38416e-4 / n) * 1e6) AS BIGINT)""".stripMargin)
            .as("wilson_fp"))
    },

    // ---- Kaplan-Meier survival curves ([[graft.ops.KaplanMeier]]):
    //      per-cohort user-retention curves with right censoring — the
    //      churn analytics workload. Subjects: one row per user, dur =
    //      days from first to last activity, censored (churn = 0) when
    //      the last activity falls in the final 3 observed days (the
    //      user may still be alive); cohort = first event type (the
    //      acquisition channel). The survival product folds over the
    //      LIFE TABLE (one row per cohort × distinct duration — bounded
    //      by the duration range, never by users); the per-user
    //      reduction is the only corpus-sized stage. Oracle replays the
    //      product recurrence as a recursive CTE (the q_holt pattern) ----
    QueryDef.sql(
      "q_kaplan_meier",
      s"""WITH RECURSIVE $survivalSubjectsDuck,
         |${graft.ops.KaplanMeier.oracleSql()}""".stripMargin
    ) { (s, d) =>
      graft.ops.KaplanMeier.curve(survivalSubjects(s, d))
    }.intendsNestedLoop(
      "broadcast side is the 1-row censoring-cutoff frame"),

    // ---- Nelson-Aalen cumulative hazard (the survival tier's additive
    //      twin — [[graft.ops.KaplanMeier.nelsonAalen]]): H(t) =
    //      Σ d_s/n_s over the SAME life table as q_kaplan_meier, each
    //      increment quantized BEFORE the order-independent integer
    //      cumulative sum. Window-only — hazard increments add where
    //      survival factors multiply, so no recursion anywhere ----
    QueryDef.sql(
      "q_nelson_aalen",
      s"""WITH $survivalSubjectsDuck,
         |${graft.ops.KaplanMeier.naOracleSql()}""".stripMargin
    ) { (s, d) =>
      graft.ops.KaplanMeier.nelsonAalen(survivalSubjects(s, d))
    }.intendsNestedLoop(
      "broadcast side is the 1-row censoring-cutoff frame"),

    // ---- View→click pairing within one hour per user — the batch
    //      anchor of the watermarked stream-stream join twin
    //      ([[graft.streaming.ClickViewJoin]]; parity pinned by
    //      ClickViewJoinSpec). ONE user_id equi join with the time-range
    //      residual inside it; at scale both sides shuffle once on
    //      user_id (no interval binning needed — the equi key already
    //      co-locates candidates) ----
    QueryDef.sql(
      "q_click_view_join",
      """SELECT v.user_id, v.event_id AS view_id, v.ts AS view_ts,
        |  c.event_id AS click_id, c.ts AS click_ts
        |FROM events v JOIN events c
        |  ON v.user_id = c.user_id
        |  AND v.event_type = 'view' AND c.event_type = 'click'
        |  AND v.ts <= c.ts AND c.ts < v.ts + INTERVAL 1 HOUR""".stripMargin
    ) { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"))
      graft.streaming.ClickViewJoin.pairs(
        graft.streaming.ClickViewJoin.views(e),
        graft.streaming.ClickViewJoin.clicks(e))
    },

    // ---- Log-rank (Mantel-Cox) two-group test ([[graft.ops.Logrank]]):
    //      do engagement-first users (first event click/view, group 'a')
    //      convert to purchase at a different rate than the rest? The
    //      inferential member of the survival tier — KM estimates curves,
    //      this tests their difference over the POOLED life table.
    //      Subjects: one per user, event = first purchase within a 48h
    //      horizon of the user's first event, right-censored at
    //      min(last activity, horizon) otherwise. Durations are hour
    //      buckets via epoch-floor math (`unix_seconds div 3600`) —
    //      DuckDB's date_diff counts boundary crossings, so both sides
    //      spell the same explicit floor-division instead. Window-only
    //      (hazards add), exact int64 contributions, final chi2 = one
    //      identical-op-order double chain ----
    QueryDef.sql(
      "q_logrank",
      s"""WITH fe AS (
         |  SELECT user_id, event_type,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS rn
         |  FROM events
         |), hb AS (
         |  SELECT user_id,
         |    min(epoch_us(ts) // 1000000 // 3600) AS f_hb,
         |    max(epoch_us(ts) // 1000000 // 3600) AS l_hb
         |  FROM events GROUP BY user_id
         |), pur AS (
         |  SELECT user_id, min(epoch_us(ts) // 1000000 // 3600) AS p_hb
         |  FROM events WHERE event_type = 'purchase' GROUP BY user_id
         |), graft_two AS (
         |  SELECT
         |    CASE WHEN fe.event_type IN ('click', 'view')
         |      THEN 'a' ELSE 'b' END AS grp,
         |    CASE WHEN p_hb IS NOT NULL AND p_hb - f_hb <= 48
         |      THEN p_hb - f_hb
         |      ELSE least(l_hb - f_hb, 48) END AS dur,
         |    CASE WHEN p_hb IS NOT NULL AND p_hb - f_hb <= 48
         |      THEN 1 ELSE 0 END AS churn
         |  FROM hb JOIN fe ON fe.user_id = hb.user_id AND fe.rn = 1
         |  LEFT JOIN pur ON pur.user_id = hb.user_id
         |),
         |${graft.ops.Logrank.oracleSql("a")}""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"),
          expr("unix_seconds(ts) div 3600").as("hbk"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val fe = e.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"),
          when(col("event_type").isin("click", "view"), "a")
            .otherwise("b").as("grp"))
      val hb = e.groupBy(col("user_id"))
        .agg(min(col("hbk")).as("f_hb"), max(col("hbk")).as("l_hb"))
      val pur = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(min(col("hbk")).as("p_hb"))
      val subjects = hb.join(fe, "user_id")
        .join(pur, Seq("user_id"), "left")
        .select(col("grp"),
          when(col("p_hb").isNotNull && col("p_hb") - col("f_hb") <= 48,
            col("p_hb") - col("f_hb"))
            .otherwise(least(col("l_hb") - col("f_hb"), lit(48L)))
            .as("dur"),
          when(col("p_hb").isNotNull && col("p_hb") - col("f_hb") <= 48, 1)
            .otherwise(0).as("churn"))
      graft.ops.Logrank.test(subjects, grpA = "a")
    }.intendsGlobalWindow(
      "windows run over the pooled two-group life table — bounded by " +
        "the 49-bucket horizon, never by subjects"),

    // ---- Viterbi sequence labeling ([[graft.ops.Viterbi]]): each
    //      user's event sequence decoded under a 2-state integer
    //      log-score HMM — q_markov ESTIMATES dynamics, this LABELS
    //      sequences under known dynamics (intent segmentation).
    //      Emission scores are md5-derived integer constants per
    //      (event_type, state) computed as COLUMNS (the fold is pure
    //      int64 adds/maxes); stay/switch = -1/-4. Oracle replays the
    //      exact DP: forward recursive CTE up, backtrack CTE down, the
    //      same tie rules. One shuffle on user_id; O(seq)/key DP state
    //      (the documented exact-decoding bound) ----
    QueryDef.sql(
      "q_viterbi",
      s"""WITH RECURSIVE graft_hmm_ev AS MATERIALIZED (
         |  SELECT user_id, event_id,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS rn,
         |    -1 - (CAST(concat('0x', substr(md5(event_type || ':0'), 1, 15))
         |          AS BIGINT) % 5) AS e0,
         |    -1 - (CAST(concat('0x', substr(md5(event_type || ':1'), 1, 15))
         |          AS BIGINT) % 5) AS e1
         |  FROM events
         |),
         |${graft.ops.Viterbi.oracleSql()}""".stripMargin
    ) { (s, d) =>
      graft.ops.Viterbi.decode(
        Tables.events(s, d).select(
          col("user_id"), col("ts"), col("event_id"),
          expr("-1L - (md5p60(concat(event_type, ':0')) % 5)").as("e0"),
          expr("-1L - (md5p60(concat(event_type, ':1')) % 5)").as("e1")))
    },

    // ---- Burst detection (Kleinberg's two-state automaton, decoded
    //      exactly): label each user's events baseline/burst from
    //      INTER-ARRIVAL GAPS — short gaps (< 1h, ~9% of arrivals)
    //      reward the burst state, long gaps the baseline, and the
    //      stay/switch costs (-1/-4) make isolated short gaps stay
    //      baseline while runs flip a whole segment. Pure composition:
    //      one lag window derives gap emissions, [[graft.ops.Viterbi]]
    //      decodes — the q_viterbi DP and oracle verbatim on a
    //      different emission column ----
    QueryDef.sql(
      "q_bursts",
      s"""WITH RECURSIVE gaps AS (
         |  SELECT user_id, event_id, ts,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS rn,
         |    epoch_us(ts) // 1000000
         |      - lag(epoch_us(ts) // 1000000) OVER (PARTITION BY user_id
         |          ORDER BY ts, event_id) AS gap
         |  FROM events
         |), graft_hmm_ev AS MATERIALIZED (
         |  SELECT user_id, event_id, rn,
         |    CASE WHEN gap IS NULL OR gap >= 3600
         |      THEN CAST(0 AS BIGINT) ELSE -3 END AS e0,
         |    CASE WHEN gap IS NOT NULL AND gap < 3600
         |      THEN CAST(0 AS BIGINT) ELSE -3 END AS e1
         |  FROM gaps
         |),
         |${graft.ops.Viterbi.oracleSql()}""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val gaps = ev(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          (expr("unix_seconds(ts)")
            - lag(expr("unix_seconds(ts)"), 1).over(w)).as("gap"))
      graft.ops.Viterbi.decode(
        gaps.select(col("user_id"), col("ts"), col("event_id"),
          when(col("gap").isNull || col("gap") >= 3600, 0L)
            .otherwise(-3L).as("e0"),
          when(col("gap").isNotNull && col("gap") < 3600, 0L)
            .otherwise(-3L).as("e1")))
    },

    // ---- Forward-algorithm filtering posteriors for the same 2-state
    //      HMM family (see ops.HmmForward): where q_viterbi commits to
    //      ONE most-likely path, this reports P(state 1 | obs so far)
    //      per row — exact fixed-point sum-product, O(1)/key state (the
    //      Holt fold shape, streamable), ONE user_id shuffle. Emission
    //      weights are the md5-derived per-type integers (the q_viterbi
    //      convention), transitions pStay = 0.8 ----
    QueryDef.sql(
      "q_hmm_forward",
      s"""WITH RECURSIVE graft_hmm_ev AS MATERIALIZED (
         |  SELECT user_id, event_id,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS rn,
         |    1 + (CAST(concat('0x', substr(md5(event_type || ':0'), 1, 15))
         |         AS BIGINT) % 9) AS we0,
         |    1 + (CAST(concat('0x', substr(md5(event_type || ':1'), 1, 15))
         |         AS BIGINT) % 9) AS we1
         |  FROM events
         |),
         |${graft.ops.HmmForward.oracleSql()}""".stripMargin
    ) { (s, d) =>
      graft.ops.HmmForward.filter(
        Tables.events(s, d).select(
          col("user_id"), col("ts"), col("event_id"),
          expr("1L + (md5p60(concat(event_type, ':0')) % 9)").as("we0"),
          expr("1L + (md5p60(concat(event_type, ':1')) % 9)").as("we1")))
    },

    // ---- Multi-touch conversion attribution: every non-purchase event
    //      is a touch on the journey toward the user's NEXT purchase
    //      (journey = run between consecutive purchases, keyed by the
    //      preceding-purchase count — one cumulative window). Per
    //      channel: first-touch / last-touch credit counts (argmin /
    //      argmax by (ts, event_id) via rn over the journey) and
    //      linear credit Σ 1e6 div k — exact integers throughout.
    //      Shape: all three windows and the journey groupBy ride ONE
    //      user_id exchange; final channel rollup is #channels rows ----
    QueryDef.sql(
      "q_attribution",
      """WITH seq AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    CAST(COALESCE(sum(CASE WHEN event_type = 'purchase'
        |        THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS journey
        |  FROM events
        |), conv AS (
        |  SELECT DISTINCT user_id, journey FROM seq
        |  WHERE event_type = 'purchase'
        |), touches AS (
        |  SELECT s.user_id, s.journey, s.event_type,
        |    row_number() OVER (PARTITION BY s.user_id, s.journey
        |      ORDER BY s.ts, s.event_id) AS rn_first,
        |    row_number() OVER (PARTITION BY s.user_id, s.journey
        |      ORDER BY s.ts DESC, s.event_id DESC) AS rn_last,
        |    CAST(count(*) OVER (PARTITION BY s.user_id, s.journey)
        |      AS BIGINT) AS k
        |  FROM seq s JOIN conv c
        |    ON c.user_id = s.user_id AND c.journey = s.journey
        |  WHERE s.event_type <> 'purchase'
        |)
        |SELECT event_type AS channel,
        |  CAST(count(*) AS BIGINT) AS n_touches,
        |  CAST(sum(CASE WHEN rn_first = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS first_credits,
        |  CAST(sum(CASE WHEN rn_last = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS last_credits,
        |  CAST(sum(1000000 // k) AS BIGINT) AS linear_fp
        |FROM touches GROUP BY event_type""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val wSeq = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val seq = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("journey",
          coalesce(sum(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).over(wSeq), lit(0L)))
      val conv = seq.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("journey")).distinct()
      val wJ = Window.partitionBy(col("user_id"), col("journey"))
      val touches = seq.join(conv, Seq("user_id", "journey"), "left_semi")
        .filter(col("event_type") =!= "purchase")
        .withColumn("rn_first", row_number().over(
          wJ.orderBy(col("ts"), col("event_id"))))
        .withColumn("rn_last", row_number().over(
          wJ.orderBy(col("ts").desc, col("event_id").desc)))
        .withColumn("k", count(lit(1)).over(
          wJ.orderBy(col("ts")).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
      touches.groupBy(col("event_type").as("channel"))
        .agg(count(lit(1)).as("n_touches"),
          sum(when(col("rn_first") === 1, 1L).otherwise(0L))
            .as("first_credits"),
          sum(when(col("rn_last") === 1, 1L).otherwise(0L))
            .as("last_credits"),
          sum(expr("1000000L div k")).as("linear_fp"))
    },

    // ---- Kruskal-Wallis rank test ([[graft.ops.Kruskal]]): do the
    //      event types share a value distribution? The k-sample
    //      rank-ANOVA completing the testing tier (q_ab_test two-
    //      proportion z, q_ks_drift two-sample KS). Doubled tie-average
    //      ranks off the cents-quantized DISTINCT-VALUE grid; exact
    //      int64 T; final H and tie correction as identical-op-order
    //      double chains quantized at the end ----
    QueryDef.sql(
      "q_kruskal",
      s"""WITH graft_obs AS (
         |  SELECT event_type AS grp,
         |    CAST(floor(value * 1e2) AS BIGINT) AS v
         |  FROM events
         |),
         |${graft.ops.Kruskal.oracleSql}""".stripMargin
    ) { (s, d) =>
      graft.ops.Kruskal.hTest(
        Tables.events(s, d).select(
          col("event_type").as("grp"),
          floor(col("value") * lit(1e2)).cast("long").as("v")))
    }.intendsGlobalWindow(
      "the rank-CDF window runs on the cents-quantized distinct-value " +
        "grid — value-range-bounded, never the events table")
      .intendsNestedLoop(
        "broadcast sides are the 1-row total and tie frames"),

    // ---- Exponentially time-decayed popularity ([[graft.ops.Decay]]):
    //      recency-weighted per-type activity score Σ v·α^days_ago,
    //      α = 97/100, in exact integer fp via the broadcast α-power
    //      table (the DpNoise mechanism-metadata pattern) — the
    //      trending-ranking signal. One broadcast equi-join on the day
    //      offset + one hash agg; per-row quantize then sum keeps it
    //      order-independent ----
    QueryDef.sql(
      "q_decay_pop",
      s"""WITH RECURSIVE cut AS (
         |  SELECT max(date_trunc('day', ts)) AS mx FROM events
         |), graft_decay_obs AS (
         |  SELECT event_type AS key,
         |    CAST(date_diff('day', date_trunc('day', ts), mx) AS BIGINT)
         |      AS days_ago,
         |    CAST(floor(value * 1e2 + 5e-1) AS BIGINT) AS v
         |  FROM events CROSS JOIN cut
         |),
         |${graft.ops.Decay.oracleSql()}""".stripMargin
    ) { (s, d) =>
      val cut = Tables.events(s, d)
        .agg(date_trunc("day", max(col("ts"))).as("mx"))
      val obs = Tables.events(s, d)
        .crossJoin(broadcast(cut))
        .select(col("event_type").as("key"),
          datediff(col("mx"), date_trunc("day", col("ts")))
            .cast("long").as("days_ago"),
          expr("CAST(floor(value * 1e2 + 5e-1) AS BIGINT)").as("v"))
      graft.ops.Decay.decayedSum(obs)
    }.intendsNestedLoop(
      "broadcast sides are the 1-row max-day frame and the day-range-" +
        "sized α-power table"),

    // ---- Audience overlap matrix: Jaccard + Simpson (overlap
    //      coefficient) between every pair of event-type user bases —
    //      the segment-overlap table behind campaign planning. One
    //      DISTINCT (type, user) pass, one user_id self-equi-join
    //      (fan-out bounded by types-per-user, ≤ #types), #types²
    //      output rows. Simpson = ni/min(|A|,|B|) catches the
    //      subset-audience case Jaccard dilutes (same asymmetry
    //      argument as q_containment, at the set level) ----
    QueryDef.sql(
      "q_audience_overlap",
      """WITH au AS (
        |  SELECT DISTINCT event_type, user_id FROM events
        |), sz AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM au GROUP BY event_type
        |), ov AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    CAST(count(*) AS BIGINT) AS ni
        |  FROM au a JOIN au b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2
        |)
        |SELECT type_a, type_b, ni,
        |  (ni * 1000000) // (sa.n + sb.n - ni) AS jaccard_fp,
        |  (ni * 1000000) // least(sa.n, sb.n) AS simpson_fp
        |FROM ov
        |JOIN sz sa ON sa.event_type = type_a
        |JOIN sz sb ON sb.event_type = type_b""".stripMargin
    ) { (s, d) =>
      val au = Tables.events(s, d)
        .select(col("event_type"), col("user_id")).distinct()
      val sz = au.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val ov = au.select(col("event_type").as("type_a"), col("user_id"))
        .join(au.select(col("event_type").as("type_b"), col("user_id")),
          "user_id")
        .filter(col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("ni"))
      ov
        .join(sz.select(col("event_type").as("type_a"), col("n").as("na")),
          Seq("type_a"))
        .join(sz.select(col("event_type").as("type_b"), col("n").as("nb")),
          Seq("type_b"))
        .select(col("type_a"), col("type_b"), col("ni"),
          expr("(ni * 1000000L) div (na + nb - ni)").as("jaccard_fp"),
          expr("(ni * 1000000L) div least(na, nb)").as("simpson_fp"))
    },

    // ---- CUPED variance reduction (Deng et al. 2013, the production
    //      experimentation standard): per user, covariate X = spend in
    //      the first 3 observed days, outcome Y = spend after; adjusted
    //      outcome Y − θ(X − X̄) with θ = cov(X,Y)/var(X) pooled. One
    //      user hash agg (conditional sums against the broadcast 1-row
    //      cutoff), 1-row exact-integer moment frame, θ and the
    //      per-user adjustment as identical-op-order double chains,
    //      per-user quantize before the variant means (order-
    //      independent). Headroom: n·max(x)² < 2^63 documented —
    //      pre-scale cents for larger per-user spend ----
    QueryDef.sql(
      "q_cuped",
      """WITH cut AS (
        |  SELECT min(date_trunc('day', ts)) + INTERVAL 2 DAY AS cutoff
        |  FROM events
        |), u AS (
        |  SELECT user_id,
        |    CAST(COALESCE(sum(CASE WHEN date_trunc('day', ts) <= cutoff
        |      THEN CAST(floor(value * 1e2) AS BIGINT) END), 0) AS BIGINT)
        |      AS x,
        |    CAST(COALESCE(sum(CASE WHEN date_trunc('day', ts) > cutoff
        |      THEN CAST(floor(value * 1e2) AS BIGINT) END), 0) AS BIGINT)
        |      AS y
        |  FROM events CROSS JOIN cut
        |  GROUP BY user_id
        |), m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM u
        |), th AS (
        |  SELECT n, sx,
        |    (1e0 * n * sxy - 1e0 * sx * sy)
        |      / (1e0 * n * sxx - 1e0 * sx * sx) AS theta
        |  FROM m WHERE (1e0 * n * sxx - 1e0 * sx * sx) <> 0e0
        |), adj AS (
        |  SELECT user_id % 2 AS variant, y,
        |    CAST(floor(CAST(y AS DOUBLE)
        |      - theta * (x - (1e0 * sx / n))) AS BIGINT) AS ya_fp,
        |    CAST(floor(theta * 1e6) AS BIGINT) AS theta_fp
        |  FROM u CROSS JOIN th
        |)
        |SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(y) AS BIGINT) // count(*) AS mean_raw_fp,
        |  CAST(sum(ya_fp) AS BIGINT) // count(*) AS mean_adj_fp,
        |  max(theta_fp) AS theta_fp
        |FROM adj GROUP BY variant""".stripMargin
    ) { (s, d) =>
      val ev = Tables.events(s, d).select("user_id", "ts", "value")
      val cut = ev.agg(
        expr("min(date_trunc('DAY', ts)) + INTERVAL 2 DAY").as("cutoff"))
      val u = ev.crossJoin(broadcast(cut))
        .groupBy(col("user_id"))
        .agg(
          coalesce(sum(when(date_trunc("DAY", col("ts")) <= col("cutoff"),
            expr("CAST(floor(value * 1e2) AS BIGINT)"))), lit(0L)).as("x"),
          coalesce(sum(when(date_trunc("DAY", col("ts")) > col("cutoff"),
            expr("CAST(floor(value * 1e2) AS BIGINT)"))), lit(0L)).as("y"))
      val m = u.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("x * x")).as("sxx"), sum(expr("x * y")).as("sxy"))
      val th = m
        .filter(expr("(1e0 * n * sxx - 1e0 * sx * sx) <> 0e0"))
        .select(col("n"), col("sx"),
          expr("(1e0 * n * sxy - 1e0 * sx * sy)" +
            " / (1e0 * n * sxx - 1e0 * sx * sx)").as("theta"))
      u.crossJoin(broadcast(th))
        .select(pmod(col("user_id"), lit(2)).as("variant"), col("y"),
          expr("CAST(floor(CAST(y AS DOUBLE)" +
            " - theta * (x - (1e0 * sx / n))) AS BIGINT)").as("ya_fp"),
          expr("CAST(floor(theta * 1e6) AS BIGINT)").as("theta_fp"))
        .groupBy(col("variant"))
        .agg(count(lit(1)).as("n_users"),
          expr("CAST(sum(y) AS BIGINT) div count(1)").as("mean_raw_fp"),
          expr("CAST(sum(ya_fp) AS BIGINT) div count(1)").as("mean_adj_fp"),
          max(col("theta_fp")).as("theta_fp"))
    }.intendsNestedLoop(
      "broadcast sides are the 1-row cutoff and 1-row theta frames"),

    // ---- Interval union (gaps-and-islands on time ranges): each event
    //      opens a 30-minute activity interval; overlapping or touching
    //      intervals merge into islands — per user the island count,
    //      total covered time, longest stretch. Island flag = start >
    //      running max of PRIOR ends (general form: correct even for
    //      variable-width intervals where ends are not monotone);
    //      island id = cumulative flag sum. Exact integer microseconds;
    //      both windows and both hash aggs ride ONE user_id exchange ----
    QueryDef.sql(
      "q_interval_merge",
      """WITH iv AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS s,
        |    epoch_us(ts) + 1800000000 AS e
        |  FROM events
        |), fl AS (
        |  SELECT user_id, event_id, s, e,
        |    CASE WHEN s > COALESCE(CAST(max(e) OVER (PARTITION BY user_id
        |        ORDER BY s, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |        AS BIGINT), -1)
        |      THEN 1 ELSE 0 END AS ni
        |  FROM iv
        |), isl AS (
        |  SELECT user_id, s, e,
        |    CAST(sum(ni) OVER (PARTITION BY user_id ORDER BY s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS island
        |  FROM fl
        |), g AS (
        |  SELECT user_id, island, min(s) AS st, max(e) AS en
        |  FROM isl GROUP BY user_id, island
        |)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
        |  CAST(sum(en - st) AS BIGINT) AS covered_us,
        |  CAST(max(en - st) AS BIGINT) AS longest_us
        |FROM g GROUP BY user_id""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(col("s"), col("event_id"))
      val iv = Tables.events(s, d).select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("s"),
        expr("unix_micros(ts) + 1800000000L").as("e"))
      val fl = iv.withColumn("ni",
        when(col("s") > coalesce(
          max(col("e")).over(ord.rowsBetween(Window.unboundedPreceding, -1)),
          lit(-1L)), lit(1)).otherwise(lit(0)))
      val isl = fl.withColumn("island",
        sum(col("ni")).over(ord.rowsBetween(Window.unboundedPreceding, 0))
          .cast("long"))
      isl.groupBy(col("user_id"), col("island"))
        .agg(min(col("s")).as("st"), max(col("e")).as("en"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_islands"),
          sum(col("en") - col("st")).cast("long").as("covered_us"),
          max(col("en") - col("st")).cast("long").as("longest_us"))
    },

    // ---- Mann-Whitney U test per event type: the TWO-sample rank test
    //      completing the tier between q_ab_test (two-proportion z) and
    //      q_kruskal (k-sample rank ANOVA) — does the user_id%2 variant
    //      split shift the value distribution? Kruskal's doubled
    //      tie-average ranks off the per-type cents grid keep every
    //      rank sum exact int64; 2·U1 = Σr2(sample 0) − n1(n1+1) is
    //      exact; z uses the tie-corrected variance of 2U1,
    //      (n1·n2/3)((N+1) − tsum/(N(N−1))), as ONE identical-op-order
    //      double chain; rank-biserial effect r = 2U1/(n1n2) − 1
    //      likewise. Degenerate groups (one-distinct-value grid or an
    //      empty sample) are excluded by EXACT integer predicates —
    //      nv ≥ 2 is precisely "tie variance > 0" (tsum = N³−N iff one
    //      grid row), no double-comparison filter. Shape: one (et, v,
    //      sample) hash agg, then everything runs on the value-range-
    //      bounded grid; the rank window partitions by et. Headroom
    //      (q_ols_trend convention): n1·n2 and Σcnt·r2 ≤ 2n_j·N stay
    //      int64 through N ≈ 1e9 per type; beyond, pre-bucket values ----
    QueryDef.sql(
      "q_mann_whitney",
      """WITH obs AS (
        |  SELECT event_type AS et, user_id % 2 AS sample,
        |    CAST(floor(value * 1e2) AS BIGINT) AS v
        |  FROM events
        |), g AS (
        |  SELECT et, v, sample, CAST(count(*) AS BIGINT) AS cnt
        |  FROM obs GROUP BY et, v, sample
        |), grid AS (
        |  SELECT et, v, CAST(sum(cnt) AS BIGINT) AS cv
        |  FROM g GROUP BY et, v
        |), rk AS (
        |  SELECT et, v, cv,
        |    2 * CAST(sum(cv) OVER (PARTITION BY et ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      - cv + 1 AS r2
        |  FROM grid
        |), s AS (
        |  SELECT et,
        |    CAST(sum(CASE WHEN sample = 0 THEN cnt ELSE 0 END) AS BIGINT)
        |      AS n1,
        |    CAST(sum(CASE WHEN sample = 1 THEN cnt ELSE 0 END) AS BIGINT)
        |      AS n2,
        |    CAST(sum(CASE WHEN sample = 0 THEN cnt * r2 ELSE 0 END)
        |      AS BIGINT) AS r2s1
        |  FROM g JOIN rk USING (et, v) GROUP BY et
        |), t AS (
        |  SELECT et, CAST(sum(cv * cv * cv - cv) AS BIGINT) AS tsum,
        |    CAST(count(*) AS BIGINT) AS nv
        |  FROM grid GROUP BY et
        |)
        |SELECT et, n1, n2,
        |  r2s1 - n1 * (n1 + 1) AS u2,
        |  CAST(floor((1e0 * (r2s1 - n1 * (n1 + 1)) - 1e0 * n1 * n2)
        |    / sqrt((1e0 * n1 * n2 / 3e0)
        |      * ((n1 + n2 + 1e0)
        |        - tsum / (1e0 * (n1 + n2) * (n1 + n2 - 1)))) * 1e6)
        |    AS BIGINT) AS z_fp,
        |  CAST(floor((1e0 * (r2s1 - n1 * (n1 + 1)) / (n1 * n2) - 1e0)
        |    * 1e6) AS BIGINT) AS rb_fp
        |FROM s JOIN t USING (et)
        |WHERE n1 > 0 AND n2 > 0 AND nv >= 2""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val obs = Tables.events(s, d).select(
        col("event_type").as("et"),
        pmod(col("user_id"), lit(2)).as("sample"),
        floor(col("value") * lit(1e2)).cast("long").as("v"))
      val g = obs.groupBy(col("et"), col("v"), col("sample"))
        .agg(count(lit(1)).as("cnt"))
      val grid = g.groupBy(col("et"), col("v")).agg(sum(col("cnt")).as("cv"))
      val wCum = Window.partitionBy(col("et")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val rk = grid
        .withColumn("cc", sum(col("cv")).over(wCum))
        .select(col("et"), col("v"),
          (lit(2) * col("cc") - col("cv") + 1).as("r2"))
      val sS = g.join(rk, Seq("et", "v"))
        .groupBy(col("et"))
        .agg(
          sum(when(col("sample") === 0, col("cnt")).otherwise(0L)).as("n1"),
          sum(when(col("sample") === 1, col("cnt")).otherwise(0L)).as("n2"),
          sum(when(col("sample") === 0, col("cnt") * col("r2"))
            .otherwise(0L)).as("r2s1"))
      val t = grid.groupBy(col("et")).agg(
        sum(col("cv") * col("cv") * col("cv") - col("cv")).as("tsum"),
        count(lit(1)).as("nv"))
      sS.join(t, "et")
        .filter(col("n1") > 0 && col("n2") > 0 && col("nv") >= 2)
        .select(col("et"), col("n1"), col("n2"),
          (col("r2s1") - col("n1") * (col("n1") + 1)).as("u2"),
          expr("""CAST(floor((1e0 * (r2s1 - n1 * (n1 + 1)) - 1e0 * n1 * n2)
                 |  / sqrt((1e0 * n1 * n2 / 3e0)
                 |    * ((n1 + n2 + 1e0)
                 |      - tsum / (1e0 * (n1 + n2) * (n1 + n2 - 1)))) * 1e6)
                 |  AS BIGINT)""".stripMargin).as("z_fp"),
          expr("""CAST(floor((1e0 * (r2s1 - n1 * (n1 + 1)) / (n1 * n2)
                 |  - 1e0) * 1e6) AS BIGINT)""".stripMargin).as("rb_fp"))
    },

    // ---- Benjamini-Hochberg FDR control over an exact-p hypothesis
    //      family: one paired sign test per (event_type, hour) cell —
    //      daily variant-0 minus variant-1 value totals (exact cents),
    //      the 40 most recent nonzero-diff days per cell so the
    //      binomial stays in int64 — with the two-sided tail
    //      probability computed EXACTLY (Sum C(n,i), i <= min(k, n-k),
    //      over 2^n; C(n,i) threads through the fold as stepwise-exact
    //      integer division), then the BH step-up rule as the pure
    //      integer comparison p_fp * m <= 50000 * rank (alpha = 0.05).
    //      No normal approximation anywhere, so both engines agree to
    //      the bit. Scale shape: the data pass is one partial-agg
    //      groupBy; everything after lives on the <= |types| x 24
    //      hypothesis grid ----
    QueryDef.sql(
      "q_fdr",
      """WITH RECURSIVE diffs AS (
        |  SELECT event_type AS et, CAST(hour(ts) AS BIGINT) AS hr,
        |    CAST(ts AS DATE) AS day,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE -1 END
        |      * CAST(floor(value * 1e2 + 5e-1) AS BIGINT)) AS BIGINT) AS d
        |  FROM events GROUP BY 1, 2, 3
        |), nz AS (
        |  SELECT et, hr, d,
        |    row_number() OVER (PARTITION BY et, hr ORDER BY day DESC) AS rkd
        |  FROM diffs WHERE d <> 0
        |), cells AS (
        |  SELECT et, hr, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS k,
        |    least(CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT),
        |      CAST(count(*) AS BIGINT)
        |        - CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT))
        |      AS j
        |  FROM nz WHERE rkd <= 40 GROUP BY et, hr
        |), bc(et, hr, i, c, s) AS (
        |  SELECT et, hr, CAST(0 AS BIGINT), CAST(1 AS BIGINT),
        |    CAST(1 AS BIGINT)
        |  FROM cells
        |  UNION ALL
        |  SELECT b.et, b.hr, b.i + 1,
        |    (b.c * (t.n - b.i)) // (b.i + 1),
        |    b.s + (b.c * (t.n - b.i)) // (b.i + 1)
        |  FROM bc b JOIN cells t ON t.et = b.et AND t.hr = b.hr
        |  WHERE b.i < t.j
        |), pv AS (
        |  SELECT t.et, t.hr, t.n, t.k,
        |    least(1000000, (2 * b.s * 1000000) // (CAST(1 AS BIGINT) << t.n))
        |      AS p_fp
        |  FROM cells t JOIN bc b ON b.et = t.et AND b.hr = t.hr
        |    AND b.i = t.j
        |), bh AS (
        |  SELECT et, hr, n, k, p_fp,
        |    row_number() OVER (ORDER BY p_fp, et, hr) AS rk,
        |    CAST(count(*) OVER () AS BIGINT) AS m
        |  FROM pv
        |)
        |SELECT et AS event_type, hr, n, k, p_fp, rk,
        |  CASE WHEN rk <= COALESCE(max(CASE WHEN p_fp * m <= 50000 * rk
        |    THEN rk END) OVER (), 0) THEN 1 ELSE 0 END AS reject
        |FROM bh""".stripMargin
    ) { (s, d) =>
      val diffs = Tables.events(s, d)
        .groupBy(col("event_type").as("et"),
          hour(col("ts")).cast("long").as("hr"),
          to_date(col("ts")).as("day"))
        .agg(sum(
          when(pmod(col("user_id"), lit(2)) === 0, lit(1L)).otherwise(lit(-1L))
            * expr("CAST(floor(value * 1e2 + 5e-1) AS BIGINT)")).as("d"))
      val wRecent = Window.partitionBy(col("et"), col("hr"))
        .orderBy(col("day").desc)
      val cells = diffs.filter(col("d") =!= 0)
        .withColumn("rkd", row_number().over(wRecent))
        .filter(col("rkd") <= 40)
        .groupBy(col("et").as("k1"), col("hr").as("k2"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("d") > 0, 1L).otherwise(0L)).as("k"))
      graft.ops.Fdr.bh(cells)
        .select(col("k1").as("event_type"), col("k2").as("hr"),
          col("n"), col("k"), col("p_fp"), col("rk"), col("reject"))
    }.intendsGlobalWindow(
      "the BH rank/step-up windows run over the hypothesis grid — " +
        "bounded by |event_types| x 24 cells, never the event data"),

    // ---- Difference-in-differences estimator per event_type: the
    //      quasi-experimental workhorse when treatment wasn't randomized
    //      over time — treated (user-hash variant 1) vs control value
    //      means, before vs after the midpoint day of the observed
    //      range; DiD = (T_post - T_pre) - (C_post - C_pre) cancels both
    //      the group baseline and the common time trend. Exact integer
    //      cents; means in 1e6 fixed point with the sign.abs-div
    //      spelling; pre_gap_fp (the pre-period group gap) is the
    //      parallel-trends diagnostic reviewers ask for first. One
    //      partial-agg pass + a 1-row cutoff broadcast ----
    QueryDef.sql(
      "q_did",
      """WITH b AS (
        |  SELECT event_type,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS dd,
        |    user_id % 2 AS grp,
        |    CAST(floor(value * 1e2 + 5e-1) AS BIGINT) AS cents
        |  FROM events
        |), cut AS (
        |  SELECT (min(dd) + max(dd)) // 2 AS cutoff FROM b
        |), cells AS (
        |  SELECT event_type, grp,
        |    CASE WHEN dd > cutoff THEN 1 ELSE 0 END AS post,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(cents) AS BIGINT) AS s
        |  FROM b CROSS JOIN cut GROUP BY 1, 2, 3
        |), m AS (
        |  SELECT event_type, grp, post, n,
        |    CASE WHEN s < 0 THEN -((-s * 1000000) // n)
        |         ELSE (s * 1000000) // n END AS mean_fp
        |  FROM cells
        |), w AS (
        |  SELECT event_type,
        |    max(CASE WHEN grp = 1 AND post = 1 THEN mean_fp END) AS mtp,
        |    max(CASE WHEN grp = 1 AND post = 0 THEN mean_fp END) AS mtr,
        |    max(CASE WHEN grp = 0 AND post = 1 THEN mean_fp END) AS mcp,
        |    max(CASE WHEN grp = 0 AND post = 0 THEN mean_fp END) AS mcr,
        |    max(CASE WHEN grp = 1 AND post = 1 THEN n END) AS n_t_post,
        |    max(CASE WHEN grp = 1 AND post = 0 THEN n END) AS n_t_pre,
        |    max(CASE WHEN grp = 0 AND post = 1 THEN n END) AS n_c_post,
        |    max(CASE WHEN grp = 0 AND post = 0 THEN n END) AS n_c_pre
        |  FROM m GROUP BY event_type
        |)
        |SELECT event_type, n_t_pre, n_t_post, n_c_pre, n_c_post,
        |  (mtp - mtr) - (mcp - mcr) AS did_fp,
        |  mtr - mcr AS pre_gap_fp
        |FROM w
        |WHERE mtp IS NOT NULL AND mtr IS NOT NULL
        |  AND mcp IS NOT NULL AND mcr IS NOT NULL""".stripMargin
    ) { (s, d) =>
      val b = Tables.events(s, d).select(
        col("event_type"),
        expr("CAST(datediff(to_date(ts), DATE '1970-01-01') AS BIGINT)")
          .as("dd"),
        pmod(col("user_id"), lit(2)).as("grp"),
        expr("CAST(floor(value * 1e2 + 5e-1) AS BIGINT)").as("cents"))
      val cut = b.agg(expr("(min(dd) + max(dd)) div 2").as("cutoff"))
      val m = b.crossJoin(broadcast(cut))
        .groupBy(col("event_type"), col("grp"),
          when(col("dd") > col("cutoff"), 1).otherwise(0).as("post"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
        .select(col("event_type"), col("grp"), col("post"), col("n"),
          expr("""CASE WHEN s < 0 THEN -((-s * 1000000L) div n)
                 |     ELSE (s * 1000000L) div n END""".stripMargin)
            .as("mean_fp"))
      m.groupBy(col("event_type"))
        .agg(
          max(when(col("grp") === 1 && col("post") === 1, col("mean_fp")))
            .as("mtp"),
          max(when(col("grp") === 1 && col("post") === 0, col("mean_fp")))
            .as("mtr"),
          max(when(col("grp") === 0 && col("post") === 1, col("mean_fp")))
            .as("mcp"),
          max(when(col("grp") === 0 && col("post") === 0, col("mean_fp")))
            .as("mcr"),
          max(when(col("grp") === 1 && col("post") === 1, col("n")))
            .as("n_t_post"),
          max(when(col("grp") === 1 && col("post") === 0, col("n")))
            .as("n_t_pre"),
          max(when(col("grp") === 0 && col("post") === 1, col("n")))
            .as("n_c_post"),
          max(when(col("grp") === 0 && col("post") === 0, col("n")))
            .as("n_c_pre"))
        .filter(col("mtp").isNotNull && col("mtr").isNotNull &&
          col("mcp").isNotNull && col("mcr").isNotNull)
        .select(col("event_type"), col("n_t_pre"), col("n_t_post"),
          col("n_c_pre"), col("n_c_post"),
          ((col("mtp") - col("mtr")) - (col("mcp") - col("mcr")))
            .as("did_fp"),
          (col("mtr") - col("mcr")).as("pre_gap_fp"))
    }.intendsNestedLoop(
      "broadcast side is the 1-row midpoint-cutoff frame"),

    // ---- Shapley-value conversion attribution (Shapley 1953 applied to
    //      channel credit — the "data-driven attribution" model; Zhao et
    //      al. 2018): the game v(S) = conversion rate of journeys whose
    //      EXACT touched-channel set is S (unobserved coalitions -> 0),
    //      phi_i = sum_{S !∋ i} |S|!(C-1-|S|)!/C! (v(S∪i) - v(S)).
    //      Completes the attribution ladder: first/last/linear
    //      (q_attribution) and time-decay (q_attribution_decay) credit
    //      POSITIONS; Shapley credits MARGINAL CONTRIBUTION, the only
    //      axiomatically fair split. Exactness: v quantized first
    //      (nc*1e6 div nj — exact int both engines), then phi stays on
    //      the common denominator C!: phi_num = Σ |S|!(C-1-|S|)!·Δv_fp,
    //      all integer (headroom (C-1)!·1e6·2^C < 2^63 to C = 12; the
    //      factorial CASE returns NULL beyond — loud, not wrong).
    //      Scale: journeys ride ONE user_id exchange; coalition stats
    //      are ≤ 2^C rows; the lattice is data-INDEPENDENT 2^C·C rows
    //      from broadcast 1-row/|C|-row frames — never corpus-sized ----
    QueryDef.sql(
      "q_shapley",
      s"""WITH seq AS (
         |  SELECT user_id, event_type, ts, event_id,
         |    CAST(COALESCE(sum(CASE WHEN event_type = 'purchase'
         |        THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
         |        ORDER BY ts, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS journey
         |  FROM events
         |), chan AS MATERIALIZED (
         |  SELECT channel,
         |    CAST(pow(2e0, row_number() OVER (ORDER BY channel) - 1)
         |      AS BIGINT) AS p2
         |  FROM (SELECT DISTINCT event_type AS channel FROM seq
         |        WHERE event_type <> 'purchase')
         |), jour AS (
         |  SELECT s.user_id, s.journey,
         |    CAST(COALESCE(sum(DISTINCT c.p2), 0) AS BIGINT) AS mask,
         |    max(CASE WHEN s.event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS conv
         |  FROM seq s LEFT JOIN chan c ON c.channel = s.event_type
         |  GROUP BY s.user_id, s.journey
         |), coal AS MATERIALIZED (
         |  SELECT mask,
         |    (CAST(sum(conv) AS BIGINT) * 1000000)
         |      // CAST(count(*) AS BIGINT) AS v_fp
         |  FROM jour GROUP BY mask
         |), cc AS MATERIALIZED (
         |  SELECT CAST(count(*) AS BIGINT) AS c FROM chan
         |), terms AS (
         |  SELECT ch.channel, t.c,
         |    (${factCase("bit_count(t.smask)")})
         |      * (${factCase("t.c - 1 - bit_count(t.smask)")})
         |      * (COALESCE(v1.v_fp, 0) - COALESCE(v0.v_fp, 0)) AS term
         |  FROM (SELECT c, unnest(range(0, CAST(pow(2e0, c) AS BIGINT)))
         |          AS smask FROM cc) t
         |  JOIN chan ch ON (t.smask // ch.p2) % 2 = 0
         |  LEFT JOIN coal v0 ON v0.mask = t.smask
         |  LEFT JOIN coal v1 ON v1.mask = t.smask + ch.p2
         |)
         |SELECT channel, CAST(sum(term) AS BIGINT) AS phi_num,
         |  max(c) AS c_channels,
         |  ${factCase("max(c)")} AS fact_c
         |FROM terms GROUP BY channel""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val wSeq = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val seqF = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("journey",
          coalesce(sum(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).over(wSeq), lit(0L)))
      // channel index: |C|-row global window (channel vocabulary, not
      // corpus) -> 2^idx as an exact double->int pow (idx <= 11)
      val chan = seqF.filter(col("event_type") =!= "purchase")
        .select(col("event_type").as("channel")).distinct()
        .withColumn("p2", expr(
          "CAST(pow(2e0, row_number() OVER (ORDER BY channel) - 1) AS BIGINT)"))
      val jour = seqF
        .join(broadcast(chan), col("event_type") === col("channel"), "left")
        .groupBy(col("user_id"), col("journey"))
        .agg(coalesce(sum_distinct(col("p2")), lit(0L)).as("mask"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"))
      val coal = jour.groupBy("mask")
        .agg(expr("(sum(conv) * 1000000) div count(*)").as("v_fp"))
      val cc = chan.agg(count(lit(1)).as("c"))
      val lattice = cc.select(col("c"), explode(sequence(lit(0L),
        expr("CAST(pow(2e0, c) AS BIGINT) - 1"))).as("smask"))
      val v0 = coal.select(col("mask").as("m0"), col("v_fp").as("v0"))
      val v1 = coal.select(col("mask").as("m1"), col("v_fp").as("v1"))
      lattice.crossJoin(broadcast(chan))
        .filter(expr("(smask div p2) % 2 = 0"))
        .join(broadcast(v0), col("smask") === col("m0"), "left")
        .join(broadcast(v1), (col("smask") + col("p2")) === col("m1"), "left")
        .select(col("channel"), col("c"),
          (expr(factCase("bit_count(smask)"))
            * expr(factCase("c - 1 - bit_count(smask)"))
            * (coalesce(col("v1"), lit(0L)) - coalesce(col("v0"), lit(0L))))
            .as("term"))
        .groupBy("channel")
        .agg(sum(col("term")).as("phi_num"), max(col("c")).as("c_channels"))
        .withColumn("fact_c", expr(factCase("c_channels")))
        .select("channel", "phi_num", "c_channels", "fact_c")
    }.intendsNestedLoop(
      "lattice sides are the broadcast 1-row channel-count frame, the " +
        "|C|-row channel frame, and the <= 2^C-row coalition stats — all " +
        "channel-vocabulary-bounded, never corpus-sized"
    ).intendsGlobalWindow(
      "channel indexing windows over the |C|-row channel vocabulary"),

    // ---- Inverse-propensity-weighted ATE (the Horvitz-Thompson leg of
    //      the causal tier — q_matching pairs units, q_did needs a time
    //      split, q_cuped reduces variance; IPW reweights by 1/e(x)
    //      when treatment correlates with a confounder): treated =
    //      signup share above the uniform 1/5, confounder = activity
    //      (total events), propensity = exact per-activity-quartile
    //      treated share. ATE = Σ_b [nb·ΣY_t/tb − nb·ΣY_c/(nb−tb)] / N
    //      over bins with POSITIVITY (0 < tb < nb; dropped bins are the
    //      standard overlap trim and N counts only kept bins). Exact
    //      int64: cents outcomes, per-bin terms (ΣY·nb·1e4) div tb —
    //      headroom ΣY_cents·nb·1e4 < 2^63. Activity bins from a 1-row
    //      broadcast max — no ntile window over users. ONE user agg,
    //      4-row bin table, 1-row output ----
    QueryDef.sql(
      "q_ipw",
      """WITH u AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS s,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 1e2) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events GROUP BY user_id
        |), mx AS (
        |  SELECT max(n) AS mxn FROM u
        |), ub AS (
        |  SELECT u.*, CASE WHEN s * 5 > n THEN 1 ELSE 0 END AS t,
        |    (n * 4) // (mx.mxn + 1) AS bin
        |  FROM u, mx
        |), b AS (
        |  SELECT bin, CAST(count(*) AS BIGINT) AS nb,
        |    CAST(sum(t) AS BIGINT) AS tb,
        |    CAST(sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT) AS syt,
        |    CAST(sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT) AS syc
        |  FROM ub GROUP BY bin
        |), kept AS (
        |  SELECT * FROM b WHERE tb > 0 AND tb < nb
        |), tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(t) AS BIGINT) AS n_treated,
        |    CAST(sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT) AS syt,
        |    CAST(sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT) AS syc
        |  FROM ub
        |)
        |SELECT tot.n_users, tot.n_treated,
        |  CAST(count(*) AS BIGINT) AS n_bins_used,
        |  CAST(sum((kept.syt * nb * 10000) // tb
        |    - (kept.syc * nb * 10000) // (nb - tb)) // sum(nb) AS BIGINT)
        |    AS ate_ipw_fp,
        |  CAST((tot.syt * 10000) // tot.n_treated
        |    - (tot.syc * 10000) // (tot.n_users - tot.n_treated)
        |    AS BIGINT) AS naive_fp
        |FROM kept CROSS JOIN tot
        |GROUP BY tot.n_users, tot.n_treated, tot.syt, tot.syc""".stripMargin
    ) { (s, d) =>
      val u = Tables.events(s, d).groupBy("user_id").agg(
        count(lit(1)).as("n"),
        sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("s"),
        sum(when(col("event_type") === "purchase",
          expr("CAST(floor(value * 1e2) AS BIGINT)")).otherwise(0L)).as("y"))
      val mx = u.agg(max(col("n")).as("mxn"))
      val ub = u.crossJoin(broadcast(mx))
        .withColumn("t", when(col("s") * 5 > col("n"), 1L).otherwise(0L))
        .withColumn("bin", expr("(n * 4) div (mxn + 1)"))
      val b = ub.groupBy("bin").agg(
        count(lit(1)).as("nb"), sum(col("t")).as("tb"),
        sum(when(col("t") === 1, col("y")).otherwise(0L)).as("syt"),
        sum(when(col("t") === 0, col("y")).otherwise(0L)).as("syc"))
      val kept = b.filter(col("tb") > 0 && col("tb") < col("nb"))
      val tot = ub.agg(
        count(lit(1)).as("n_users"), sum(col("t")).as("n_treated"),
        sum(when(col("t") === 1, col("y")).otherwise(0L)).as("syt_t"),
        sum(when(col("t") === 0, col("y")).otherwise(0L)).as("syc_t"))
      kept.crossJoin(broadcast(tot))
        .groupBy("n_users", "n_treated", "syt_t", "syc_t")
        .agg(count(lit(1)).as("n_bins_used"),
          expr("CAST(sum((syt * nb * 10000) div tb" +
            " - (syc * nb * 10000) div (nb - tb)) div sum(nb) AS BIGINT)")
            .as("ate_ipw_fp"))
        .select(col("n_users"), col("n_treated"), col("n_bins_used"),
          col("ate_ipw_fp"),
          expr("CAST((syt_t * 10000) div n_treated" +
            " - (syc_t * 10000) div (n_users - n_treated) AS BIGINT)")
            .as("naive_fp"))
    }.intendsNestedLoop(
      "broadcast sides are the 1-row max-activity and 1-row totals frames")
  )
}
