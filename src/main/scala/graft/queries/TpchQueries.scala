package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Join/aggregation coverage over the TPC-H-style star schema (SURVEY.md §2.7
  * note + §7 step 7): the reference itself has no joins (single fact table),
  * so these queries establish the engine capability at scale — broadcast
  * joins for the small dimensions, shuffle hash/sort-merge for the fact
  * tables, semi/anti joins, distinct aggregation, per-group top-k.
  *
  * Revenue-style sums use the exact fixed-point accumulation from
  * [[graft.queries.Num]] so the results are independent of parallelism and
  * summation order — reproducible on 1 core or 1000.
  */
object TpchQueries {

  import Num.{davg, davg2, davg2Sql, davgSql, dsum, dsum2, dsum2Sql, dsumSql}

  val all: Seq[QueryDef] = Seq(
    // ---- TPC-H Q1 shape: pricing summary (scan + filter + groupBy agg) ----
    QueryDef.sql(
      "q1_pricing",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsum2Sql("l_extendedprice")} AS sum_base_price,
         |  ${dsum2Sql("l_extendedprice * (1e0 - l_discount)")} AS sum_disc_price,
         |  ${dsum2Sql("l_extendedprice * (1e0 - l_discount) * (1e0 + l_tax)")} AS sum_charge,
         |  ${davgSql("l_quantity")} AS avg_qty,
         |  ${davg2Sql("l_extendedprice")} AS avg_price,
         |  ${davgSql("l_discount")} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum2(col("l_extendedprice")).as("sum_base_price"),
          dsum2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("sum_disc_price"),
          dsum2(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg2(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order")
        )
    },

    // ---- TPC-H Q3 shape: 3-way join + group + exact top-10 ----
    QueryDef.sql(
      "q3_shipping",
      s"""SELECT l_orderkey,
         |  ${dsumSql("l_extendedprice * (1e0 - l_discount)")} AS revenue,
         |  o_orderdate, o_orderpriority
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""".stripMargin
    ) { (s, d) =>
      val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1999-01-01 00:00:00").cast("timestamp"))
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1999-01-01 00:00:00").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // ---- TPC-H Q5 shape: 6-way join, broadcast dims, group by nation ----
    QueryDef.sql(
      "q5_local_supplier",
      s"""SELECT n_name,
         |  ${dsum2Sql("l_extendedprice * (1e0 - l_discount)")} AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name""".stripMargin
    ) { (s, d) =>
      val ord = Tables.orders(s, d).filter(
        col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      val asiaNations = Tables.nation(s, d)
        .join(
          broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
      Tables.lineitem(s, d)
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(
          broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsum2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
    },

    // ---- left-semi join (EXISTS): orders having a returned line ----
    QueryDef.sql(
      "q_semi_returned_orders",
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')""".stripMargin
    ) { (s, d) =>
      Tables.orders(s, d)
        .join(
          Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"),
          "left_semi")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    },

    // ---- left-anti join (NOT EXISTS): customers with no orders ----
    QueryDef.sql(
      "q_anti_customers_no_orders",
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin
    ) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
    },

    // ---- exact distinct aggregation ----
    QueryDef.sql(
      "q_distinct_counts",
      """SELECT l_returnflag,
        |  count(DISTINCT l_orderkey) AS n_orders,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n_rows"))
    },

    // ---- approximate distinct (HLL sketch) — the scale path for
    //      cardinality when exact count(DISTINCT) would shuffle every
    //      value. No oracle (DuckDB's HLL differs); ApproxDistinctSpec
    //      pins the error bound against the exact counts. ----
    QueryDef.rowsOnly("q_approx_distinct") { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_orderkey"), rsd = 0.02)
            .as("approx_orders"),
          approx_count_distinct(col("l_partkey"), rsd = 0.02)
            .as("approx_parts"))
    },

    // ---- per-group top-k (window rank) ----
    QueryDef.sql(
      "q_topk_lines_per_supplier",
      """SELECT l_suppkey, rn, l_orderkey, l_linenumber, l_extendedprice FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem) WHERE rn <= 3""".stripMargin
    ) { (s, d) =>
      val w = Window
        .partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, d)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("l_suppkey", "rn", "l_orderkey", "l_linenumber", "l_extendedprice")
    },

    // ---- global sort + limit (top-1 path, TakeOrderedAndProject) ----
    QueryDef.sql(
      "q_top_orders",
      """SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 5""".stripMargin
    ) { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(5)
    },

    // ---- TPC-H Q6 shape: forecast-revenue — pure scan + conjunctive
    //      range predicates + ONE scalar agg. The predicates must all
    //      reach the parquet scan (PushedFilters); zero joins, zero
    //      window — the cheapest full-table query there is ----
    QueryDef.sql(
      "q_q6_revenue",
      s"""SELECT ${dsum2Sql("l_extendedprice * l_discount")} AS revenue,
         |  count(*) AS n_lines
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_discount BETWEEN 5e-2 AND 7e-2
         |  AND l_quantity < 24e0""".stripMargin
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24.0)
        .agg(
          dsum2(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // ---- TPC-H Q19 shape: discounted revenue under an OR-of-ANDs
    //      predicate (three brand/size/quantity bands) — the
    //      disjunctive-pushdown case: the whole disjunction is
    //      row-local, so it must reach the scan as one filter (no join,
    //      no union of three scans). Catalyst folds the common
    //      `p_partkey = l_partkey` conjunct out of the OR and pushes
    //      the residual; the plan is scan → broadcast join on part →
    //      single filter → agg ----
    QueryDef.sql(
      "q19_disjunctive",
      s"""SELECT ${dsum2Sql("l_extendedprice * (1e0 - l_discount)")}
         |    AS revenue,
         |  count(*) AS n_lines
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
         |        AND l_quantity >= 1e0 AND l_quantity <= 11e0)
         |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25
         |        AND l_quantity >= 10e0 AND l_quantity <= 20e0)
         |   OR (p_brand = 'Brand#33' AND p_size BETWEEN 1 AND 35
         |        AND l_quantity >= 20e0 AND l_quantity <= 30e0)"""
        .stripMargin
    ) { (s, d) =>
      val band = (brand: String, szHi: Int, qLo: Double, qHi: Double) =>
        col("p_brand") === brand && col("p_size").between(1, szHi) &&
          col("l_quantity") >= qLo && col("l_quantity") <= qHi
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("p_partkey") === col("l_partkey"))
        .filter(band("Brand#11", 15, 1.0, 11.0) ||
          band("Brand#22", 25, 10.0, 20.0) ||
          band("Brand#33", 35, 20.0, 30.0))
        .agg(
          dsum2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // ---- TPC-H Q18 shape: large-quantity orders — grouped HAVING on the
    //      fact table first (shrinks before any join), then customer
    //      enrichment on the tiny survivor set ----
    QueryDef.sql(
      "q_large_orders",
      s"""WITH big AS (
         |  SELECT l_orderkey, ${dsumSql("l_quantity")} AS total_qty
         |  FROM lineitem GROUP BY l_orderkey
         |  HAVING ${dsumSql("l_quantity")} > 220e0
         |)
         |SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
         |       o.o_totalprice, b.total_qty
         |FROM big b
         |JOIN orders o ON b.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin
    ) { (s, d) =>
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 220.0)
      big
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
          "o_totalprice", "total_qty")
    },

    // ---- TPC-H Q7 shape: bilateral trade volume — the 5-way join with
    //      TWO independent nation lookups (supplier side + customer
    //      side), grouped by the nation pair and year. Both nation dims
    //      broadcast; the fact table shuffles once for the final agg ----
    QueryDef.sql(
      "q_nation_trade",
      s"""SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         |  year(o.o_orderdate) AS o_year,
         |  ${dsum2Sql("l.l_extendedprice * (1e0 - l.l_discount)")} AS volume
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation nc ON c.c_nationkey = nc.n_nationkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation ns ON s.s_nationkey = ns.n_nationkey
         |WHERE ns.n_name <> nc.n_name
         |GROUP BY supp_nation, cust_nation, o_year""".stripMargin
    ) { (s, d) =>
      val nc = Tables.nation(s, d)
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      val ns = Tables.nation(s, d)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nc), col("c_nationkey") === col("c_nk"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(ns), col("s_nationkey") === col("s_nk"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(dsum2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("volume"))
    },

    // ---- TPC-H Q14 shape: promo revenue share — conditional-agg ratio
    //      over a fact-dim join; both sums fixed-point exact so the
    //      ratio is one correctly-rounded divide ----
    QueryDef.sql(
      "q_promo_share",
      s"""SELECT
         |  ${dsum2Sql("CASE WHEN p.p_type LIKE 'PROMO%' THEN l.l_extendedprice * (1e0 - l.l_discount) ELSE 0e0 END")}
         |    AS promo_revenue,
         |  ${dsum2Sql("l.l_extendedprice * (1e0 - l.l_discount)")} AS total_revenue,
         |  (${dsum2Sql("CASE WHEN p.p_type LIKE 'PROMO%' THEN l.l_extendedprice * (1e0 - l.l_discount) ELSE 0e0 END")})
         |    / (${dsum2Sql("l.l_extendedprice * (1e0 - l.l_discount)")}) AS promo_share
         |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey""".stripMargin
    ) { (s, d) =>
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      val promo = when(col("p_type").like("PROMO%"), rev).otherwise(lit(0.0))
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .agg(
          dsum2(promo).as("promo_revenue"),
          dsum2(rev).as("total_revenue"),
          (dsum2(promo) / dsum2(rev)).as("promo_share"))
    },

    // ---- TPC-H Q4 shape: priority count over a correlated EXISTS with a
    //      NON-EQUI component (shipped after the order date) — a semi
    //      join whose condition mixes the orderkey equality with an
    //      inequality filter; the schema has no commitdate/receiptdate,
    //      so "late line" is l_shipdate > o_orderdate ----
    QueryDef.sql(
      "q_priority_count",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin
    ) { (s, d) =>
      val ord = Tables.orders(s, d).filter(
        col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
      ord
        .join(Tables.lineitem(s, d).select("l_orderkey", "l_shipdate"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    },

    // ---- TPC-H Q10 shape: returned-item revenue ranking — fact-side
    //      filter, 3-way join, per-customer agg, exact global top-20
    //      (TakeOrdered, never a full sort); nation broadcast ----
    QueryDef.sql(
      "q_returned_revenue",
      s"""SELECT c.c_custkey, c.c_name, n.n_name,
         |  ${dsumSql("l.l_extendedprice * (1e0 - l.l_discount)")} AS revenue
         |FROM customer c
         |JOIN orders o ON c.c_custkey = o.o_custkey
         |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |WHERE l.l_returnflag = 'R'
         |  AND o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
         |  AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
         |GROUP BY c.c_custkey, c.c_name, n.n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin
    ) { (s, d) =>
      val ord = Tables.orders(s, d).filter(
        col("o_orderdate") >= lit("1996-07-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1996-10-01 00:00:00").cast("timestamp"))
      Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // ---- TPC-H Q12 shape: shipping-priority split — conditional counts
    //      (CASE ... IN-list) after a fact-fact join + range filter; the
    //      schema has no l_shipmode, so the split key is the order's
    //      priority class ----
    QueryDef.sql(
      "q_priority_split",
      """SELECT year(l.l_shipdate) AS ship_year,
        |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY ship_year""".stripMargin
    ) { (s, d) =>
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, d).filter(
        col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("l_shipdate")).as("ship_year"))
        .agg(
          sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
    },

    // ---- TPC-H Q19 shape: disjunctive OR-of-ANDs predicate mixing part
    //      attributes and line quantities — the optimizer must still push
    //      the common l_quantity envelope + join before filtering; part
    //      is the broadcast side ----
    QueryDef.sql(
      "q_brand_bands",
      s"""SELECT ${dsum2Sql("l.l_extendedprice * (1e0 - l.l_discount)")} AS revenue,
         |  count(*) AS n_lines
         |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
         |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
         |       AND l.l_quantity >= 1e0 AND l.l_quantity <= 21e0)
         |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
         |       AND l.l_quantity >= 10e0 AND l.l_quantity <= 30e0)
         |   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
         |       AND l.l_quantity >= 20e0 AND l.l_quantity <= 40e0)""".stripMargin
    ) { (s, d) =>
      def band(brand: String, sizeHi: Int, qLo: Double, qHi: Double) =
        col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
          col("l_quantity") >= qLo && col("l_quantity") <= qHi
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("p_partkey") === col("l_partkey"))
        .filter(band("Brand#12", 15, 1.0, 21.0) ||
          band("Brand#23", 25, 10.0, 30.0) ||
          band("Brand#34", 35, 20.0, 40.0))
        .agg(
          dsum2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // ---- TPC-H Q8 shape: national market share — the 8-way join (two
    //      independent nation lookups again) reduced to a conditional-agg
    //      ratio per year. Every dimension broadcasts; the fact table is
    //      filtered through the broadcast part dim BEFORE the orders join
    //      so the expensive fact-fact join runs on the 1/5 type slice ----
    QueryDef.sql(
      "q_market_share",
      s"""WITH vols AS (
         |  SELECT year(o_orderdate) AS o_year,
         |    l_extendedprice * (1e0 - l_discount) AS volume,
         |    ns.n_name AS supp_nation
         |  FROM lineitem
         |  JOIN part ON p_partkey = l_partkey
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation nc ON c_nationkey = nc.n_nationkey
         |  JOIN region ON nc.n_regionkey = r_regionkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ns ON s_nationkey = ns.n_nationkey
         |  WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
         |)
         |SELECT o_year,
         |  ${dsum2Sql("CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0e0 END")}
         |    AS nation_volume,
         |  ${dsum2Sql("volume")} AS total_volume,
         |  (${dsum2Sql("CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0e0 END")})
         |    / (${dsum2Sql("volume")}) AS mkt_share
         |FROM vols GROUP BY o_year""".stripMargin
    ) { (s, d) =>
      val stdParts = Tables.part(s, d)
        .filter(col("p_type") === "STANDARD").select("p_partkey")
      val asiaCust = Tables.nation(s, d)
        .join(
          broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("c_nk"))
      val ns = Tables.nation(s, d)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      val natVol = when(col("supp_nation") === "NATION_2", vol).otherwise(lit(0.0))
      Tables.lineitem(s, d)
        .join(broadcast(stdParts), col("p_partkey") === col("l_partkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(asiaCust), col("c_nationkey") === col("c_nk"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(ns), col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(dsum2(natVol).as("nation_volume"), dsum2(vol).as("total_volume"))
        .select(col("o_year"), col("nation_volume"), col("total_volume"),
          (col("nation_volume") / col("total_volume")).as("mkt_share"))
    },

    // ---- TPC-H Q13 shape: customer order-count distribution — an OUTER
    //      join with a join-side filter (the filter must stay in the join
    //      condition, not become a WHERE that would turn it inner), then a
    //      double aggregation: per-customer count, then a histogram over
    //      those counts (second agg runs on |customers| rows) ----
    QueryDef.sql(
      "q_custdist",
      """WITH c_orders AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey
        |)
        |SELECT c_count, count(*) AS custdist
        |FROM c_orders GROUP BY c_count""".stripMargin
    ) { (s, d) =>
      Tables.customer(s, d).select("c_custkey")
        .join(
          Tables.orders(s, d).filter(col("o_orderpriority") =!= "1-URGENT")
            .select("o_custkey", "o_orderkey"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    },

    // ---- TPC-H Q15 shape: top supplier — revenue per supplier for a
    //      quarter, then an agg-of-agg (global max) equi-joined back on
    //      the VALUE. The fixed-point revenue makes the equality exact
    //      cross-engine; the 1-row max frame broadcasts so the rejoin is
    //      a BroadcastHashJoin, never a sort or nested loop ----
    QueryDef.sql(
      "q_top_supplier",
      s"""WITH rev AS (
         |  SELECT l_suppkey,
         |    ${dsum2Sql("l_extendedprice * (1e0 - l_discount)")} AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         |  GROUP BY l_suppkey
         |)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM rev JOIN supplier ON s_suppkey = l_suppkey
         |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""".stripMargin
    ) { (s, d) =>
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(dsum2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("mx"))
      Tables.supplier(s, d)
        .join(
          broadcast(rev.join(broadcast(mx), col("total_revenue") === col("mx"))),
          col("s_suppkey") === col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    },

    // ---- TPC-H Q17 shape: small-quantity revenue — a correlated
    //      per-part scalar average rewritten as a grouped agg over the
    //      SAME brand-filtered slice, broadcast back onto it (the agg
    //      frame is |parts of one brand| rows). The threshold compare
    //      touches only the fixed-point-exact average, so the row set is
    //      identical cross-engine ----
    QueryDef.sql(
      "q_small_qty_revenue",
      s"""WITH pa AS (
         |  SELECT l_partkey AS a_partkey, ${davgSql("l_quantity")} AS avg_qty
         |  FROM lineitem JOIN part ON p_partkey = l_partkey
         |  WHERE p_brand = 'Brand#9'
         |  GROUP BY l_partkey
         |)
         |SELECT ${dsum2Sql("l_extendedprice")} / 7e0 AS avg_yearly,
         |  count(*) AS n_lines
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |JOIN pa ON a_partkey = l_partkey
         |WHERE p_brand = 'Brand#9' AND l_quantity < 5e-1 * avg_qty""".stripMargin
    ) { (s, d) =>
      val brandParts = Tables.part(s, d)
        .filter(col("p_brand") === "Brand#9").select("p_partkey")
      val li = Tables.lineitem(s, d)
        .join(broadcast(brandParts), col("p_partkey") === col("l_partkey"))
      val pa = li.groupBy(col("l_partkey").as("a_partkey"))
        .agg(davg(col("l_quantity")).as("avg_qty"))
      li.join(broadcast(pa), col("a_partkey") === col("l_partkey"))
        .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .agg(
          (dsum2(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
          count(lit(1)).as("n_lines"))
    },

    // ---- TPC-H Q21 shape: the lone late supplier — a semi join AND an
    //      anti join on the same fact table, each with a non-equi
    //      component (different supplier; the anti side also correlates
    //      on the outer order date). Both stay hash joins on the orderkey
    //      equality; the schema has no commit/receipt dates, so "late" is
    //      shipped-after-order-date ----
    QueryDef.sql(
      "q_late_supplier",
      """SELECT s_name, count(DISTINCT l1.l_orderkey) AS numwait
        |FROM lineitem l1
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE o_orderstatus = 'F' AND l1.l_shipdate > o_orderdate
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin
    ) { (s, d) =>
      val li = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey", "l_shipdate")
      val ord = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate")
      val l2 = li.select(col("l_orderkey").as("x2_orderkey"),
        col("l_suppkey").as("x2_suppkey"))
      val l3 = li.select(col("l_orderkey").as("x3_orderkey"),
        col("l_suppkey").as("x3_suppkey"), col("l_shipdate").as("x3_shipdate"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate"))
        .join(l2,
          col("l_orderkey") === col("x2_orderkey") &&
            col("l_suppkey") =!= col("x2_suppkey"),
          "left_semi")
        .join(l3,
          col("l_orderkey") === col("x3_orderkey") &&
            col("l_suppkey") =!= col("x3_suppkey") &&
            col("x3_shipdate") > col("o_orderdate"),
          "left_anti")
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(countDistinct(col("l_orderkey")).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(10)
    },

    // ---- TPC-H Q22 shape: dormant high-balance customers — a scalar
    //      subquery threshold (fixed-point global average, broadcast as a
    //      1-row frame) plus a dated NOT EXISTS anti join, grouped by
    //      nation. The anti join's order-side filter prunes at the scan
    //      before the join ----
    QueryDef.sql(
      "q_dormant_rich",
      s"""WITH ab AS (
         |  SELECT ${davgSql("c_acctbal")} AS avg_bal
         |  FROM customer WHERE c_acctbal > 0e0
         |)
         |SELECT n_name, count(*) AS numcust,
         |  ${dsum2Sql("c_acctbal")} AS totacctbal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |CROSS JOIN ab
         |WHERE c_acctbal > avg_bal
         |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
         |                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
         |GROUP BY n_name""".stripMargin
    ) { (s, d) =>
      val ab = Tables.customer(s, d).filter(col("c_acctbal") > 0.0)
        .agg(davg(col("c_acctbal")).as("avg_bal"))
      Tables.customer(s, d)
        .crossJoin(broadcast(ab))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(
          Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast("timestamp"))
            .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("numcust"), dsum2(col("c_acctbal")).as("totacctbal"))
    }.intendsNestedLoop(
      "cross join against the broadcast 1-row global-average-balance frame"),

    // ---- TPC-H Q2 shape (adapted: no partsupp table — a supplier's
    //      offered cost for a part is its min observed unit price in
    //      lineitem): min-cost supplier per part. The oracle keeps the
    //      CORRELATED scalar-min subquery of the original; the Spark plan
    //      is the decorrelated form — per-part min agg joined back on
    //      (partkey, cost). Double equality is safe because both sides
    //      compute the identical IEEE quotient ----
    QueryDef.sql(
      "q_min_cost_supplier",
      """WITH offer AS (
        |  SELECT l_partkey, l_suppkey,
        |         min(l_extendedprice / l_quantity) AS supp_cost
        |  FROM lineitem GROUP BY l_partkey, l_suppkey
        |)
        |SELECT p_partkey, p_brand, s_name, s_acctbal,
        |       supp_cost AS min_cost
        |FROM part JOIN offer ON p_partkey = offer.l_partkey
        |JOIN supplier ON s_suppkey = offer.l_suppkey
        |WHERE p_size BETWEEN 10 AND 20 AND p_type = 'ECONOMY'
        |  AND supp_cost = (SELECT min(o2.supp_cost) FROM offer o2
        |                   WHERE o2.l_partkey = p_partkey)
        |ORDER BY s_acctbal DESC, s_name, p_partkey LIMIT 25""".stripMargin
    ) { (s, d) =>
      val offer = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"),
          (col("l_extendedprice") / col("l_quantity")).as("uc"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("uc")).as("supp_cost"))
      val minCost = offer.groupBy(col("l_partkey").as("mc_partkey"))
        .agg(min(col("supp_cost")).as("min_cost"))
      offer
        .join(minCost, col("l_partkey") === col("mc_partkey") &&
          col("supp_cost") === col("min_cost"))
        .join(Tables.part(s, d).filter(
          col("p_size").between(10, 20) && col("p_type") === "ECONOMY"),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("p_partkey"), col("p_brand"), col("s_name"),
          col("s_acctbal"), col("min_cost"))
        .orderBy(col("s_acctbal").desc, col("s_name"), col("p_partkey"))
        .limit(25)
    },

    // ---- TPC-H Q9 shape (adapted: supply cost stood in by 10% of the
    //      part's retail price): profit by supplier nation and ship year
    //      over a part-name substring filter. The profit expression keeps
    //      the SAME textual operator order on both engines; the sum is
    //      fixed-point exact ----
    QueryDef.sql(
      "q_profit_by_nation",
      s"""SELECT n_name, year(l_shipdate) AS o_year,
         |  ${dsumSql(
             "l_extendedprice * (1e0 - l_discount) - " +
               "p_retailprice * l_quantity * 1e-1")} AS sum_profit
         |FROM lineitem
         |JOIN part ON p_partkey = l_partkey
         |JOIN supplier ON s_suppkey = l_suppkey
         |JOIN nation ON n_nationkey = s_nationkey
         |WHERE p_name LIKE '%red%'
         |GROUP BY n_name, o_year""".stripMargin
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_name").contains("red")),
          col("p_partkey") === col("l_partkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("n_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"), year(col("l_shipdate")).as("o_year"))
        .agg(dsum(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
            col("p_retailprice") * col("l_quantity") * lit(0.1))
          .as("sum_profit"))
    },

    // ---- TPC-H Q11 shape (adapted: part "stock value" at a nation is the
    //      extended price its suppliers shipped): grouped agg filtered by a
    //      GLOBAL scalar threshold — the 1-row total broadcast, never a
    //      window; both sides of the comparison are fixed-point-exact
    //      doubles scaled by the same literal ----
    QueryDef.sql(
      "q_important_parts",
      s"""WITH natline AS (
         |  SELECT l_partkey, l_extendedprice
         |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
         |  JOIN nation ON n_nationkey = s_nationkey
         |  WHERE n_name = 'NATION_3'
         |), tot AS (
         |  SELECT ${dsumSql("l_extendedprice")} AS total FROM natline
         |)
         |SELECT l_partkey AS p_key, ${dsumSql("l_extendedprice")} AS value
         |FROM natline CROSS JOIN tot
         |GROUP BY l_partkey, total
         |HAVING ${dsumSql("l_extendedprice")} > total * 1e-3
         |ORDER BY value DESC, p_key""".stripMargin
    ) { (s, d) =>
      val natline = Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)),
          col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_3")),
          col("n_nationkey") === col("s_nationkey"))
        .select(col("l_partkey"), col("l_extendedprice"))
      val tot = natline.agg(dsum(col("l_extendedprice")).as("total"))
      natline
        .groupBy(col("l_partkey").as("p_key"))
        .agg(dsum(col("l_extendedprice")).as("value"))
        .crossJoin(broadcast(tot))
        .filter(col("value") > col("total") * lit(1e-3))
        .select(col("p_key"), col("value"))
        .orderBy(col("value").desc, col("p_key"))
    }.intendsNestedLoop(
      "cross join against the broadcast 1-row national-total frame"),

    // ---- TPC-H Q16 shape (adapted: the part-supplier relation is the
    //      distinct (partkey, suppkey) pairs observed in lineitem):
    //      supplier-variety counts per part attribute with a NOT-IN
    //      supplier exclusion — an anti join on the fact side feeding a
    //      distinct aggregation ----
    QueryDef.sql(
      "q_supplier_variety",
      """SELECT p_brand, p_type, p_size,
        |       count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#25' AND p_type <> 'SMALL'
        |  AND p_size IN (5, 10, 15, 20, 25, 30)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_name LIKE '%7')
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        |LIMIT 30""".stripMargin
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.supplier(s, d).filter(col("s_name").endsWith("7"))
          .select("s_suppkey"),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(Tables.part(s, d).filter(
          col("p_brand") =!= "Brand#25" && col("p_type") =!= "SMALL" &&
            col("p_size").isin(5, 10, 15, 20, 25, 30)),
          col("p_partkey") === col("l_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
        .limit(30)
    },

    // ---- TPC-H Q20 shape (adapted): bulk shippers — suppliers whose
    //      shipped quantity of a part exceeds the across-supplier average
    //      for that part. Nested aggregation (per supplier-part, then per
    //      part) with the comparison kept in EXACT integers:
    //      qty * n_suppliers > total_qty avoids any cross-engine division.
    //      Quantities are integral doubles, so the sums are exact ----
    QueryDef.sql(
      "q_bulk_shippers",
      """WITH sq AS (
        |  SELECT l_suppkey, l_partkey,
        |         CAST(sum(l_quantity) AS BIGINT) AS qty
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_name LIKE 'small%'
        |  GROUP BY l_suppkey, l_partkey
        |), pa AS (
        |  SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS total_qty,
        |         count(*) AS n_supp
        |  FROM sq GROUP BY l_partkey
        |)
        |SELECT s_name, s_acctbal,
        |       CAST(count(*) AS BIGINT) AS bulk_parts
        |FROM sq JOIN pa ON sq.l_partkey = pa.l_partkey
        |JOIN supplier ON s_suppkey = sq.l_suppkey
        |WHERE qty * n_supp > total_qty
        |GROUP BY s_name, s_acctbal
        |ORDER BY bulk_parts DESC, s_name LIMIT 20""".stripMargin
    ) { (s, d) =>
      val sq = Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_name").startsWith("small"))
          .select("p_partkey"),
          col("p_partkey") === col("l_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("l_quantity")).cast("long").as("qty"))
      val pa = sq.groupBy(col("l_partkey").as("pa_partkey"))
        .agg(sum(col("qty")).as("total_qty"), count(lit(1)).as("n_supp"))
      sq.join(pa, col("l_partkey") === col("pa_partkey"))
        .filter(col("qty") * col("n_supp") > col("total_qty"))
        .join(broadcast(Tables.supplier(s, d)),
          col("s_suppkey") === col("l_suppkey"))
        .groupBy(col("s_name"), col("s_acctbal"))
        .agg(count(lit(1)).as("bulk_parts"))
        .orderBy(col("bulk_parts").desc, col("s_name"))
        .limit(20)
    },

    // ---- Per-brand Pareto skyline (Börzsönyi et al. 2001): parts not
    //      dominated on (p_retailprice, p_size) — both minimized — by
    //      any same-brand part. For 2-d the skyline is a sort +
    //      prefix-min, NOT a pairwise dominance join: aggregate to one
    //      row per (brand, price) carrying min(size), prefix-min that
    //      per-price frame over strictly smaller prices (ROWS frame is
    //      exact because the frame has one row per distinct price), and
    //      keep rows whose size equals their price-group min AND beats
    //      every cheaper price's min. All comparisons, no arithmetic on
    //      the doubles -> hash-exact. Scale shape: windows partition by
    //      brand; the per-price frame is price-cardinality bounded; the
    //      dominance test never leaves the partition. ----
    QueryDef.sql(
      "q_skyline",
      """WITH pp AS (
        |  SELECT p_brand, p_retailprice,
        |         CAST(min(p_size) AS INT) AS ms
        |  FROM part GROUP BY p_brand, p_retailprice
        |), pm AS (
        |  SELECT p_brand, p_retailprice, ms,
        |    min(ms) OVER (PARTITION BY p_brand ORDER BY p_retailprice
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pfx
        |  FROM pp
        |)
        |SELECT p.p_partkey, p.p_brand, p.p_retailprice, p.p_size
        |FROM part p
        |JOIN pm ON pm.p_brand = p.p_brand
        |       AND pm.p_retailprice = p.p_retailprice
        |WHERE p.p_size = pm.ms AND (pm.pfx IS NULL OR p.p_size < pm.pfx)
        |""".stripMargin
    ) { (s, d) =>
      val part = Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
          col("p_size"))
      val pp = part.groupBy(col("p_brand").as("b"), col("p_retailprice").as("pr"))
        .agg(min(col("p_size")).as("ms"))
      val w = Window.partitionBy(col("b")).orderBy(col("pr"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val pm = pp.withColumn("pfx", min(col("ms")).over(w))
      part.join(pm,
          col("b") === col("p_brand") && col("pr") === col("p_retailprice"))
        .filter(col("p_size") === col("ms") &&
          (col("pfx").isNull || col("p_size") < col("pfx")))
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
          col("p_size"))
    },

    // ---- Peak interval concurrency (sweep-line): max simultaneously
    //      open orders per priority, each order open for a
    //      key-derived deterministic number of days. The sweep
    //      decomposes intervals into +1/-1 boundary deltas, NETS them
    //      per (priority, day) FIRST — so the running-sum window runs
    //      over the day-cardinality-bounded aggregate, never the
    //      order rows — then takes the peak and its first day via a
    //      partial-aggregable max(struct). Integer-exact throughout;
    //      the peak day is emitted as VARCHAR to keep the driver's
    //      pandas compare engine-neutral. ----
    QueryDef.sql(
      "q_concurrency",
      """WITH iv AS (
        |  SELECT o_orderpriority AS prio,
        |         CAST(o_orderdate AS DATE) AS d0,
        |         CAST(o_orderdate AS DATE)
        |           + CAST(o_orderkey % 30 + 1 AS INTEGER) AS d1
        |  FROM orders
        |), delta AS (
        |  SELECT prio, d, CAST(sum(dl) AS BIGINT) AS net FROM (
        |    SELECT prio, d0 AS d, 1 AS dl FROM iv
        |    UNION ALL SELECT prio, d1, -1 FROM iv)
        |  GROUP BY prio, d
        |), run AS (
        |  SELECT prio, d,
        |    CAST(sum(net) OVER (PARTITION BY prio ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS open_now
        |  FROM delta
        |)
        |SELECT prio, CAST(max(open_now) AS BIGINT) AS peak,
        |  CAST(min(CASE WHEN open_now = m THEN d END) AS VARCHAR) AS peak_day
        |FROM (SELECT *, max(open_now) OVER (PARTITION BY prio) AS m FROM run)
        |GROUP BY prio""".stripMargin
    ) { (s, d) =>
      val iv = Tables.orders(s, d).select(
        col("o_orderpriority").as("prio"),
        to_date(col("o_orderdate")).as("d0"),
        date_add(to_date(col("o_orderdate")),
          (pmod(col("o_orderkey"), lit(30)) + 1).cast("int")).as("d1"))
      val delta = iv.select(col("prio"), col("d0").as("d"), lit(1L).as("dl"))
        .union(iv.select(col("prio"), col("d1").as("d"), lit(-1L).as("dl")))
        .groupBy(col("prio"), col("d")).agg(sum(col("dl")).as("net"))
      val w = Window.partitionBy(col("prio")).orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // peak + its first day as ONE partial-aggregable argmin:
      // min(struct(-open_now, d)) picks the largest running count,
      // earliest day — no second whole-partition window
      delta.withColumn("open_now", sum(col("net")).over(w))
        .groupBy(col("prio"))
        .agg(min(struct((-col("open_now")).as("neg"), col("d").as("dd")))
          .as("m"))
        .select(col("prio"), (-col("m.neg")).as("peak"),
          col("m.dd").cast("string").as("peak_day"))
    },

    // ---- ROLLUP hierarchy aggregation (region > nation > ALL): the
    //      drill-down companion to q_cube_events's full CUBE — one
    //      shuffle produces every level of the hierarchy (Spark expands
    //      grouping sets map-side; no per-level re-scan). Money sums via
    //      the 2-decimal fixed-point scheme; grouping-null labels are
    //      COALESCEd to 'ALL' so the result is engine-neutral (no
    //      grouping_id bit-layout dependence). ----
    QueryDef.sql(
      "q_grouping_sets",
      s"""SELECT COALESCE(r_name, 'ALL') AS region_name,
         |  COALESCE(n_name, 'ALL') AS nation_name,
         |  ${Num.dsum2Sql("l_extendedprice * (1e0 - l_discount)")} AS revenue,
         |  CAST(count(*) AS BIGINT) AS n_lines
         |FROM lineitem
         |JOIN supplier ON s_suppkey = l_suppkey
         |JOIN nation ON n_nationkey = s_nationkey
         |JOIN region ON r_regionkey = n_regionkey
         |GROUP BY ROLLUP (r_name, n_name)""".stripMargin
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
        .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
          col("n_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.region(s, d)
          .select(col("r_regionkey"), col("r_name"))),
          col("r_regionkey") === col("n_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(
          Num.dsum2(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"),
          count(lit(1)).as("n_lines"))
        .select(coalesce(col("r_name"), lit("ALL")).as("region_name"),
          coalesce(col("n_name"), lit("ALL")).as("nation_name"),
          col("revenue"), col("n_lines"))
    },

    // ---- Gini coefficient of supplier-revenue concentration per
    //      nation (the Lorenz-curve inequality audit — "is this
    //      nation's trade dominated by a few suppliers?"). Exact
    //      integers end-to-end: revenue in whole currency units (cent
    //      precision is noise at inequality granularity and buys 100x
    //      headroom), the rank-form identity
    //      G = (2*Σ(i*x_i) - (n+1)*Σx_i) * 1e6 div (n*Σx_i) with i the
    //      ascending revenue rank (suppkey tie-break). Headroom: the
    //      scaled numerator is bounded by n*Σx*1e6 < 2^63 — safe to
    //      ~9e12 revenue-units per nation (≈ sf1 density ×400); lower
    //      the 1e6 scale or rescale units beyond, the exactness scheme
    //      is unchanged. Scale shape: one lineitem hash agg, a
    //      broadcast supplier-dim join, a NATION-partitioned rank
    //      window over the supplier aggregate (dim-sized, not
    //      fact-sized), one moment agg per nation ----
    QueryDef.sql(
      "q_gini",
      """WITH rev AS (
        |  SELECT s.s_nationkey, l.l_suppkey,
        |    CAST(sum(CAST(floor(l.l_extendedprice) AS BIGINT))
        |      AS BIGINT) AS units
        |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  GROUP BY s.s_nationkey, l.l_suppkey
        |), rk AS (
        |  SELECT s_nationkey, units,
        |    CAST(row_number() OVER (PARTITION BY s_nationkey
        |      ORDER BY units, l_suppkey) AS BIGINT) AS i
        |  FROM rev
        |)
        |SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers,
        |  CAST(sum(units) AS BIGINT) AS total_units,
        |  (2 * CAST(sum(i * units) AS BIGINT)
        |   - (count(*) + 1) * CAST(sum(units) AS BIGINT)) * 1000000
        |    // (count(*) * CAST(sum(units) AS BIGINT)) AS gini_fp
        |FROM rk GROUP BY s_nationkey
        |HAVING CAST(sum(units) AS BIGINT) > 0""".stripMargin
    ) { (s, d) =>
      val rev = Tables.lineitem(s, d)
        .select(col("l_suppkey"),
          expr("CAST(floor(l_extendedprice) AS BIGINT)")
            .as("units0"))
        .groupBy(col("l_suppkey")).agg(sum(col("units0")).as("units"))
        .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
      val w = Window.partitionBy(col("s_nationkey"))
        .orderBy(col("units"), col("l_suppkey"))
      rev.withColumn("i", row_number().over(w).cast("long"))
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_suppliers"),
          sum(col("units")).as("total_units"),
          sum(col("i") * col("units")).as("sic"))
        .filter(col("total_units") > 0)
        .select(col("s_nationkey"), col("n_suppliers"), col("total_units"),
          expr("(2 * sic - (n_suppliers + 1) * total_units) * 1000000 " +
            "div (n_suppliers * total_units)").as("gini_fp"))
    },

    // ---- Herfindahl-Hirschman market-concentration index per nation:
    //      the antitrust-screen companion to q_gini — HHI = Σ share_i²
    //      with share_i the supplier's basis-point revenue share. Each
    //      share quantizes FIRST (rev*1e4 div total — exact integer,
    //      order-independent), then squares and sums, so both engines
    //      agree bit-for-bit; HHI lands on the familiar 0..1e8 scale
    //      (10000² = monopoly). Same scale shape as q_gini minus the
    //      window: two hash aggs and a broadcast dim join ----
    QueryDef.sql(
      "q_hhi",
      """WITH rev AS (
        |  SELECT s.s_nationkey, l.l_suppkey,
        |    CAST(sum(CAST(floor(l.l_extendedprice * 1e2 + 5e-1) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  GROUP BY s.s_nationkey, l.l_suppkey
        |), tot AS (
        |  SELECT s_nationkey, CAST(sum(cents) AS BIGINT) AS total
        |  FROM rev GROUP BY s_nationkey
        |)
        |SELECT r.s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers,
        |  CAST(sum(((r.cents * 10000) // t.total)
        |            * ((r.cents * 10000) // t.total)) AS BIGINT) AS hhi
        |FROM rev r JOIN tot t ON r.s_nationkey = t.s_nationkey
        |WHERE t.total > 0
        |GROUP BY r.s_nationkey""".stripMargin
    ) { (s, d) =>
      val rev = Tables.lineitem(s, d)
        .select(col("l_suppkey"),
          expr("CAST(floor(l_extendedprice * 1e2 + 5e-1) AS BIGINT)")
            .as("cents0"))
        .groupBy(col("l_suppkey")).agg(sum(col("cents0")).as("cents"))
        .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
      val tot = rev.groupBy(col("s_nationkey").as("nk"))
        .agg(sum(col("cents")).as("total"))
      rev.join(tot, col("s_nationkey") === col("nk") && col("total") > 0)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_suppliers"),
          sum(expr("((cents * 10000) div total) * ((cents * 10000) div total)"))
            .as("hhi"))
    },

    // ---- Incremental JOIN-view maintenance (see ops.JoinIvm): the
    //      per-(nation, priority) order-revenue view kept current as
    //      BOTH relations arrive in interleaved delta batches (orders
    //      in 3, customers in 2, one orders-only step) — the
    //      counting-algorithm decomposition ΔA⋈(B∪ΔB) ∪ A⋈ΔB, history
    //      never re-joined. The oracle states the full recompute, so
    //      the hash-match proves the decomposition ----
    QueryDef.sql(
      "q_join_ivm",
      """SELECT c_nationkey, o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(floor(o_totalprice * 1e2 + 5e-1) AS BIGINT))
        |    AS BIGINT) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey, o_orderpriority""".stripMargin
    ) { (s, d) =>
      import graft.ops.JoinIvm
      val ords = Tables.orders(s, d).select(
        col("o_custkey").as("custkey"), col("o_orderpriority"),
        col("o_orderkey"),
        expr("CAST(floor(o_totalprice * 1e2 + 5e-1) AS BIGINT)").as("cents"))
      val cust = Tables.customer(s, d).select(
        col("c_custkey").as("custkey"), col("c_nationkey"), col("c_custkey"))
      def oStep(i: Int) =
        ords.filter(pmod(col("o_orderkey"), lit(3)) === i).drop("o_orderkey")
      def cStep(i: Int) = cust.filter(pmod(col("c_custkey"), lit(2)) === i)
        .drop("c_custkey")
      JoinIvm.maintain(
        Seq(
          (oStep(0), cStep(0)),
          (oStep(1), cStep(1)),
          (oStep(2), cStep(0).limit(0))),
        key = "custkey",
        viewKeys = Seq("c_nationkey", "o_orderpriority"),
        value = col("cents"))
        .select(col("c_nationkey"), col("o_orderpriority"), col("n"),
          col("total"))
    }
  )
}
