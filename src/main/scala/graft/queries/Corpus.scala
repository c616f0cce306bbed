package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The declared relational corpus S1–S24 (FIXTURES.md §3) — the operator
  * shapes of the reference's TPC-H capability surface
  * (reference `testdata/queries/q1.sql`–`q22.sql`, `tests/tpch.rs:54-206`,
  * status table `README.md:44-87`) re-expressed Spark-first.
  *
  * Most queries are written with the DataFrame API so Catalyst plans them
  * directly (partial aggregation, join strategy selection, filter/column
  * pushdown into the parquet scan); a few dialect-sensitive ones run as
  * `spark.sql` with text shared verbatim with the DuckDB oracle.
  *
  * Scale discipline (100 TB north star):
  *  - dimension tables (region, nation) are explicitly `broadcast()`;
  *    fact-fact joins are left to sort-merge + AQE.
  *  - filters are applied before joins so they reach the scan
  *    (`PushedFilters` in the formatted plan).
  *  - every aggregate is a plain `groupBy().agg()` → Spark plans
  *    partial+final HashAggregate automatically (map-side combine).
  */
object Corpus {

  private def ts(s: String): Column = to_timestamp(lit(s))

  type Q = (SparkSession, String) => DataFrame

  /** S1 — Q1 shape: filter + groupBy + 5 aggregates + order.
    * (ref testdata/queries/q1.sql; fused agg translation src/parser.rs:40-181) */
  val s01PricingSummary: Q = (spark, dir) =>
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum("l_quantity").as("sum_qty"),
        sum("l_extendedprice").as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
        avg("l_quantity").as("avg_qty"),
        avg("l_extendedprice").as("avg_price"),
        avg("l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** S2 — Q3 shape: 3-way join + group + top-k (ref q3.sql). */
  val s02ShippingPriority: Q = (spark, dir) => {
    val customer = Tables.load(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val orders = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") < ts("1995-03-15 00:00:00"))
    val lineitem = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") > ts("1995-03-15 00:00:00"))
    customer
      .join(orders, col("c_custkey") === col("o_custkey"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .select("l_orderkey", "revenue", "o_orderdate")
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  /** S3 — Q5 shape: 6-way join chain (ref q5.sql). region/nation broadcast. */
  val s03LocalSupplierVolume: Q = (spark, dir) => {
    val orders = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
              col("o_orderdate") < ts("1997-01-01 00:00:00"))
    Tables.load(spark, dir, "customer")
      .join(orders, col("c_custkey") === col("o_custkey"))
      .join(Tables.load(spark, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.load(spark, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.load(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.load(spark, dir, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** S4 — Q6 shape: conjunctive range filter + single aggregate (ref q6.sql).
    * All predicates reach the parquet scan as PushedFilters. */
  val s04ForecastRevenue: Q = (spark, dir) =>
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1994-01-01 00:00:00") &&
              col("l_shipdate") < ts("1995-01-01 00:00:00") &&
              col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice") * col("l_discount")).as("revenue"))

  /** S5 — Q7 shape: aliased dimension self-join + derived table + year()
    * (ref q7.sql). The two `nation` roles are disambiguated by renaming
    * before the join — the DataFrame analog of `nation n1 / nation n2`. */
  val s05VolumeShipping: Q = (spark, dir) => {
    val nation = Tables.load(spark, dir, "nation")
    val n1 = nation.select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = nation.select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    Tables.load(spark, dir, "supplier")
      .join(Tables.load(spark, dir, "lineitem")
          .filter(col("l_shipdate").between(ts("1995-01-01 00:00:00"), ts("1996-12-31 00:00:00"))),
        col("s_suppkey") === col("l_suppkey"))
      .join(Tables.load(spark, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.load(spark, dir, "customer"), col("c_custkey") === col("o_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .select(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sum("volume").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
      .limit(50)
  }

  /** S6 — Q8 shape: CASE inside aggregate, market-share ratio (ref q8.sql). */
  val s06MarketShare: Q = (spark, dir) => {
    val nation = Tables.load(spark, dir, "nation")
    val n1 = nation.select(col("n_nationkey").as("n1_key"), col("n_regionkey").as("n1_region"))
    val n2 = nation.select(col("n_nationkey").as("n2_key"), col("n_name").as("nation"))
    Tables.load(spark, dir, "part")
      .join(Tables.load(spark, dir, "lineitem"), col("p_partkey") === col("l_partkey"))
      .join(Tables.load(spark, dir, "supplier"), col("s_suppkey") === col("l_suppkey"))
      .join(Tables.load(spark, dir, "orders")
          .filter(col("o_orderdate").between(ts("1995-01-01 00:00:00"), ts("1996-12-31 00:00:00"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.load(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("c_nationkey") === col("n1_key"))
      .join(broadcast(Tables.load(spark, dir, "region").filter(col("r_name") === "AMERICA")),
        col("n1_region") === col("r_regionkey"))
      .join(broadcast(n2), col("s_nationkey") === col("n2_key"))
      .select(year(col("o_orderdate")).as("o_year"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"),
        col("nation"))
      .groupBy("o_year")
      .agg((sum(when(col("nation") === "BRAZIL", col("volume")).otherwise(0.0)) /
            sum(col("volume"))).as("mkt_share"))
      .orderBy("o_year")
  }

  /** S7 — Q10 shape: many grouping keys + order desc + limit (ref q10.sql). */
  val s07ReturnedItems: Q = (spark, dir) => {
    Tables.load(spark, dir, "customer")
      .join(Tables.load(spark, dir, "orders")
          .filter(col("o_orderdate") >= ts("1996-10-01 00:00:00") &&
                  col("o_orderdate") < ts("1997-01-01 00:00:00")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.load(spark, dir, "lineitem").filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.load(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** S8 — Q13 shape: LEFT OUTER JOIN + nested aggregation (ref q13.sql).
    * `count(o_orderkey)` ignores the nulls produced by unmatched customers,
    * exactly like SQL COUNT(col). */
  val s08CustomerDistribution: Q = (spark, dir) =>
    Tables.load(spark, dir, "customer")
      .join(Tables.load(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** S9 — Q14 shape: LIKE + CASE ratio (ref q14.sql). */
  val s09PromoEffect: Q = (spark, dir) => {
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1995-09-01 00:00:00") &&
              col("l_shipdate") < ts("1995-10-01 00:00:00"))
      .join(Tables.load(spark, dir, "part"), col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) * sum(when(col("p_type").like("PROMO%"), rev).otherwise(0.0)) / sum(rev))
        .as("promo_revenue"))
  }

  /** S10 — Q18 shape: IN-subquery with GROUP BY + HAVING (ref q18.sql).
    * The IN-subquery decorrelates to a left-semi join, which is what
    * Catalyst's RewritePredicateSubquery would produce from the SQL form. */
  val s10LargeOrders: Q = (spark, dir) => {
    val lineitem = Tables.load(spark, dir, "lineitem")
    val bigOrders = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum("l_quantity").as("big_qty"))
      .filter(col("big_qty") > 150)
      .select(col("l_orderkey").as("big_orderkey"))
    Tables.load(spark, dir, "customer")
      .join(Tables.load(spark, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .join(bigOrders, col("o_orderkey") === col("big_orderkey"), "left_semi")
      .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .agg(sum("l_quantity").as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
      .limit(100)
  }

  /** S11 — Q22 shape: scalar-subquery threshold + NOT EXISTS anti-join
    * (ref q22.sql). The uncorrelated scalar subquery becomes a broadcast
    * single-row cross join; NOT EXISTS becomes left-anti. */
  val s11GlobalSales: Q = (spark, dir) => {
    val eligible = Tables.load(spark, dir, "customer")
      .filter((col("c_custkey") % 7).isin(1, 3, 5))
    val threshold = eligible.filter(col("c_acctbal") > 0.0)
      .agg(avg("c_acctbal").as("avg_bal"))
    eligible
      .join(Tables.load(spark, dir, "orders")
          .filter(col("o_orderdate") >= ts("1998-01-01 00:00:00")).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .crossJoin(broadcast(threshold))
      .filter(col("c_acctbal") > col("avg_bal"))
      .select((col("c_custkey") % 7).as("cntrycode"), col("c_acctbal"))
      .groupBy("cntrycode")
      .agg(count(lit(1)).as("numcust"), sum("c_acctbal").as("totacctbal"))
      .orderBy("cntrycode")
  }

  /** S12 — EXISTS with correlated inequality → left-semi join with a
    * compound condition (ref q4.sql shape; semi joins rejected by the
    * reference at src/parser.rs:1180-1190). */
  val s12OrderPriority: Q = (spark, dir) => {
    val orders = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-07-01 00:00:00") &&
              col("o_orderdate") < ts("1996-10-01 00:00:00"))
    val lineitem = Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders
      .join(lineitem, col("l_orderkey") === col("o_orderkey") &&
                      col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** S13 — NOT IN anti-join (ref q16.sql shape). `l_partkey` is non-null in
    * this schema, so NOT IN ≡ left-anti. */
  val s13PartsNotShipped: Q = (spark, dir) =>
    Tables.load(spark, dir, "part")
      .filter(col("p_size").isin(1, 2, 3, 4, 5))
      .join(Tables.load(spark, dir, "lineitem")
          .filter(col("l_quantity") > 45).select("l_partkey"),
        col("p_partkey") === col("l_partkey"), "left_anti")
      .groupBy("p_brand", "p_type")
      .agg(countDistinct(col("p_partkey")).as("part_cnt"))
      .orderBy(col("part_cnt").desc, col("p_brand"), col("p_type"))

  /** S14 — correlated scalar subquery (ref q17.sql shape): per-partkey
    * average computed once over lineitem, then joined back — Catalyst's
    * decorrelation produces the same aggregate+join plan. */
  val s14SmallQuantityRevenue: Q = (spark, dir) => {
    val lineitem = Tables.load(spark, dir, "lineitem")
    val brandParts = Tables.load(spark, dir, "part")
      .filter(col("p_brand") === "Brand#23").select("p_partkey")
    val avgQty = lineitem.groupBy(col("l_partkey").as("avg_partkey"))
      .agg((avg("l_quantity") * 0.5).as("half_avg_qty"))
    lineitem
      .join(brandParts, col("l_partkey") === col("p_partkey"))
      .join(avgQty, col("l_partkey") === col("avg_partkey"))
      .filter(col("l_quantity") < col("half_avg_qty"))
      .agg((sum("l_extendedprice") / 7.0).as("avg_yearly"))
  }

  /** S15 — set operations (UNION ALL / INTERSECT / EXCEPT; all `todo!()` in
    * the reference, src/parser.rs:216,278,399). */
  val s15aUnionAll: Q = (spark, dir) =>
    Tables.load(spark, dir, "customer").select(col("c_nationkey").as("nk"))
      .unionAll(Tables.load(spark, dir, "supplier").select(col("s_nationkey")))
      .orderBy("nk").limit(200)

  val s15bIntersect: Q = (spark, dir) =>
    Tables.load(spark, dir, "customer").select(col("c_nationkey").as("nk"))
      .intersect(Tables.load(spark, dir, "supplier").select(col("s_nationkey")))
      .orderBy("nk")

  val s15cExcept: Q = (spark, dir) =>
    Tables.load(spark, dir, "nation").select(col("n_nationkey").as("nk"))
      .except(Tables.load(spark, dir, "supplier")
        .filter(col("s_suppkey") <= 10).select(col("s_nationkey")))
      .orderBy("nk")

  /** S16 — DISTINCT + COUNT(DISTINCT) (ref q16 supplier_cnt shape;
    * reference DISTINCT never emitted, src/parser.rs:113,453). */
  val s16aCountDistinct: Q = (spark, dir) =>
    Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_suppkey")).as("supp_cnt"),
           countDistinct(col("l_partkey")).as("part_cnt"))
      .orderBy("l_returnflag")

  val s16bDistinct: Q = (spark, dir) =>
    Tables.load(spark, dir, "orders")
      .select("o_orderstatus", "o_orderpriority").distinct()
      .orderBy("o_orderstatus", "o_orderpriority")

  /** S17 — window functions (reference surface: `todo!()` at
    * src/parser.rs:251,893): ranking and a running-sum frame. */
  val s17aRank: Q = (spark, dir) => {
    val byPrice = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    val byKey = Window.partitionBy(col("p_brand")).orderBy(col("p_partkey"))
    Tables.load(spark, dir, "part")
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        rank().over(byPrice).as("price_rank"),
        row_number().over(byKey).as("rn"))
      .orderBy(col("p_brand"), col("price_rank"), col("p_partkey"))
      .limit(100)
  }

  val s17bRunningSum: Q = (spark, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        sum("o_totalprice").over(w).as("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
      .limit(200)
  }

  /** S18 — ROLLUP / CUBE (reference: `Expr::GroupingSet` `todo!()`,
    * src/parser.rs:940). */
  val s18aRollup: Q = (spark, dir) =>
    Tables.load(spark, dir, "nation")
      .join(broadcast(Tables.load(spark, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)

  val s18bCube: Q = (spark, dir) =>
    Tables.load(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum("l_quantity").as("q"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** S19 — explicit null ordering + OFFSET (reference preserves nulls_first,
    * src/parser.rs:296-297; OFFSET via Dataset.offset, Spark ≥3.4). */
  val s19NullOrdering: Q = (spark, dir) =>
    Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("O")).as("st"),
        col("o_totalprice"))
      .orderBy(col("st").desc_nulls_first, col("o_totalprice").desc, col("o_orderkey"))
      .offset(10).limit(50)

  /** S20 — cross join (ref src/parser.rs:354-397; broken in the reference
    * for DataFusion-generated cross joins, README.md:80). */
  val s20CrossJoin: Q = (spark, dir) =>
    Tables.load(spark, dir, "region")
      .crossJoin(broadcast(Tables.load(spark, dir, "nation")))
      .select("r_name", "n_name")
      .orderBy("r_name", "n_name")
      .limit(200)

  // ---- dialect-shared SQL queries (identical text runs on Spark + DuckDB) ----

  /** S21a — scalar-function battery (reference C9–C11 surface, nearly all
    * `todo!()` at src/parser.rs:739-809). CEIL/FLOOR are cast to DOUBLE in
    * the shared text because Spark returns BIGINT and DuckDB DOUBLE. */
  val s21aScalarBatterySql: String =
    """SELECT UPPER(p_brand) AS ub, LOWER(p_type) AS lt, SUBSTRING(p_name, 1, 8) AS pfx,
      |       LENGTH(p_name) AS nlen, TRIM(CONCAT(' ', p_brand, ' ')) AS trimmed,
      |       REPLACE(p_type, ' ', '_') AS rep,
      |       ABS(p_retailprice - 1000.0) AS ab, ROUND(p_retailprice, 1) AS rnd,
      |       CAST(CEIL(p_retailprice) AS DOUBLE) AS ce, CAST(FLOOR(p_retailprice) AS DOUBLE) AS fl,
      |       SQRT(CAST(p_size AS DOUBLE)) AS sq, CAST(p_size AS BIGINT) AS sz
      |FROM part WHERE p_size IN (1, 5, 10) ORDER BY p_partkey LIMIT 100""".stripMargin

  /** S21b — date functions battery. */
  val s21bDateBatterySql: String =
    """SELECT YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS m,
      |       DATE_TRUNC('MONTH', o_orderdate) AS mstart, COUNT(*) AS cnt
      |FROM orders GROUP BY 1, 2, 3 ORDER BY y, m""".stripMargin

  /** S22 — statistical aggregates (reference enumerates them all as
    * `todo!()`, src/parser.rs:879-891). */
  val s22StatAggSql: String =
    """SELECT l_returnflag,
      |       STDDEV_SAMP(l_quantity) AS sd, VAR_SAMP(l_quantity) AS vr,
      |       CORR(l_quantity, l_extendedprice) AS cr, MEDIAN(l_quantity) AS med
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** S23a — tumbling-window aggregation over the events table. */
  val s23aHourlySql: String =
    """SELECT DATE_TRUNC('HOUR', ts) AS hour_start, event_type,
      |       COUNT(*) AS n, SUM(value) AS total
      |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin

  /** S23b — sessionization with a 30-minute gap via window functions.
    * Output typing is pinned engine-neutral: SUM over INT is HUGEINT in
    * DuckDB (Arrow decimal128) but BIGINT in Spark, so session_id is CAST
    * explicitly; session_start is second-truncated because the source's
    * physical ts precision has differed across driver regens (NANOS, then
    * micros) — truncation keeps the oracle engine-neutral either way. */
  val s23bSessionsSql: String =
    """SELECT user_id, session_id, COUNT(*) AS events_in_session,
      |       DATE_TRUNC('SECOND', MIN(ts)) AS session_start
      |FROM ( SELECT user_id, ts,
      |              CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |                   AS BIGINT) AS session_id
      |       FROM ( SELECT user_id, ts, event_id,
      |                     CASE WHEN LAG(ts) OVER w IS NULL
      |                            OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
      |                     THEN 1 ELSE 0 END AS is_new
      |              FROM events
      |              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) ) flagged ) sessions
      |GROUP BY user_id, session_id ORDER BY user_id, session_id LIMIT 500""".stripMargin

  /** S24 — Q19 shape: OR-of-conjunctions + in-list + between (ref q19.sql). */
  val s24DiscountedRevenue: Q = (spark, dir) => {
    val li = Tables.load(spark, dir, "lineitem")
    val p = Tables.load(spark, dir, "part")
    li.join(p, col("p_partkey") === col("l_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity") >= 1 && col("l_quantity") <= 11) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity") >= 10 && col("l_quantity") <= 20) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
          col("l_quantity") >= 20 && col("l_quantity") <= 30))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
  }

  /** S18c — explicit GROUPING SETS incl. grand total (C15 surface;
    * `Expr::GroupingSet` is `todo!()` at src/parser.rs:940). Shared text. */
  val s18cGroupingSetsSql: String =
    """SELECT r_name, n_name, COUNT(*) AS cnt
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY GROUPING SETS ((r_name), (n_name), ())
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin

  /** S25 — JSON extraction from the events props column (reference C12
    * surface: array/struct/json all absent, src/parser.rs:760,811,698). */
  val s25JsonProps: Q = (spark, dir) =>
    Tables.load(spark, dir, "events")
      .select(get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .groupBy("k").agg(count(lit(1)).as("n"))
      .orderBy("k")

  /** S25b — the SAME extraction through Spark 4's VariantType
    * (`try_parse_json` → binary variant → `variant_get`): the modern
    * scale path for semi-structured props — the JSON string is parsed
    * ONCE into the shredded binary encoding and every field access is a
    * path probe, where [[s25JsonProps]]'s `get_json_object` re-parses
    * the string per access (one access here, so results are identical —
    * the entry pins that the variant path and the string path agree,
    * and the oracle is the same SQL). try_parse_json: a malformed props
    * row degrades to NULL variant → NULL k, never a failed 100 TB job. */
  val s25bVariantProps: Q = (spark, dir) =>
    Tables.load(spark, dir, "events")
      .select(expr("try_parse_json(props)").as("v"))
      .select(expr("cast(variant_get(v, '$.k') as bigint)").as("k"))
      .groupBy("k").agg(count(lit(1)).as("n"))
      .orderBy("k")

  /** S26 — array/struct functions over the embeddings vectors. */
  val s26ArrayStruct: Q = (spark, dir) =>
    Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("first_val"),
        round(aggregate(col("embedding"), lit(0.0d),
          (acc, x) => acc + x.cast("double")), 6).as("sum_vals"),
        struct(col("vec_id"), col("label")).getField("label").as("label2"))
      .orderBy("vec_id")

  /** S27a — FULL OUTER JOIN with unmatched rows on both sides (B8; the
    * shifted key guarantees right-only rows). */
  val s27aFullOuter: Q = (spark, dir) => {
    val shifted = Tables.load(spark, dir, "supplier")
      .groupBy((col("s_nationkey") + 20).as("sk"))
      .agg(count(lit(1)).as("s_cnt"))
    Tables.load(spark, dir, "nation")
      .join(shifted, col("n_nationkey") === col("sk"), "full_outer")
      .select(col("n_nationkey"), col("sk"), col("s_cnt"))
      .orderBy(col("n_nationkey").asc_nulls_first, col("sk").asc_nulls_first)
  }

  /** S27b — RIGHT OUTER JOIN (B8). */
  val s27bRightOuter: Q = (spark, dir) =>
    Tables.load(spark, dir, "orders")
      .join(Tables.load(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey") &&
        col("o_orderdate") >= ts("1999-01-01 00:00:00"), "right_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("recent_orders"))
      .orderBy(col("c_custkey"))

  /** S30 — PIVOT: long-to-wide aggregation with an explicit value list
    * (no collect job for value discovery); the oracle expresses the same
    * shape as FILTERed aggregates, the dialect-shared form. */
  val s30Pivot: Q = (spark, dir) =>
    Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum("l_quantity"))
      .withColumnRenamed("F", "qty_f")
      .withColumnRenamed("O", "qty_o")
      .orderBy("l_returnflag")

  private def sqlQ(text: String): Q = (spark, dir) => {
    Tables.registerAll(spark, dir)
    spark.sql(text)
  }

  /** S23c — sessionization via Spark's NATIVE session_window operator (the
    * built-in the custom flatMapGroupsWithState path should be preferred
    * against when no per-session ordinal is needed). Semantics note:
    * session_window starts a NEW session when the gap is >= 30 min (the
    * window [start, start+gap) excludes its end), so the oracle's is_new
    * flag uses >= — s23b's custom formulation uses > (both agree on this
    * data: no exact-boundary gaps exist, verified at sf0.01/sf0.1). */
  val s23cSessionWindow: Q = (spark, dir) =>
    Tables.load(spark, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("events_in_session"))
      .select(col("user_id"),
        date_trunc("second", col("sw.start")).as("session_start"),
        col("events_in_session"))
      .orderBy("user_id", "session_start")
      .limit(500)

  val s23cSessionWindowOracleSql: String =
    """SELECT user_id, DATE_TRUNC('SECOND', MIN(ts)) AS session_start,
      |       COUNT(*) AS events_in_session
      |FROM ( SELECT user_id, ts,
      |              CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |                   AS BIGINT) AS session_id
      |       FROM ( SELECT user_id, ts, event_id,
      |                     CASE WHEN LAG(ts) OVER w IS NULL
      |                            OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
      |                     THEN 1 ELSE 0 END AS is_new
      |              FROM events
      |              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) ) flagged ) sessions
      |GROUP BY user_id, session_id ORDER BY user_id, session_start LIMIT 500""".stripMargin

  /** S31 — catalog-qualified resolution: `graft_db.main.<table>` resolves
    * through the [[graft.sources.GraftCatalog]] plugin (the analog of the
    * reference's database→schema→table registry, `src/catalog.rs:8-103`)
    * into the same DSv2 scan path as `spark.read.format("graft-sqldb")`,
    * so pruning/pushdown apply to catalog-resolved scans too. */
  val s31Catalog: Q = (spark, dir) => {
    spark.conf.set("spark.sql.catalog.graft_db", "graft.sources.GraftCatalog")
    spark.conf.set("graft.catalog.dir", dir)
    spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS n, SUM(l_quantity) AS sum_qty
        |FROM graft_db.main.lineitem JOIN graft_db.main.orders
        |  ON l_orderkey = o_orderkey
        |WHERE l_shipdate > TIMESTAMP '1995-01-01 00:00:00'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  /** S32 — federated WRITE round-trip (SURVEY §2.A A10 under the driver
    * oracle, not just specs): the top-100 orders stream through the DSv2
    * sink into a backend table (executor-rendered INSERT tuples, dialect
    * literals) and come back through the DSv2 scan. The oracle reads the
    * same rows straight from the source table, so any value corrupted by
    * the literal render → SQL parse → storage → scan round-trip
    * hash-mismatches. Idempotent (DROP + CREATE) because Verify and both
    * Bench passes re-run entries in one session. */
  val s32FederatedWrite: Q = (spark, dir) => {
    val backend = graft.sources.SparkViewBackend.forDir(dir)
    backend.executeUpdate("DROP TABLE IF EXISTS fed_sink")
    // explicit location, wiped first: a managed table's directory outlives
    // the session-temp catalog that knew about it, and a stale dir from a
    // previous JVM would fail CREATE with LOCATION_ALREADY_EXISTS
    val loc = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_fed_sink_" + dir.replaceAll("[^a-zA-Z0-9]", "_"))
    def rm(f: java.io.File): Unit = if (f.exists) {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(): Unit
    }
    rm(loc)
    backend.executeUpdate(
      "CREATE TABLE fed_sink (o_orderkey BIGINT, o_totalprice DOUBLE, o_orderpriority STRING) " +
        s"USING parquet LOCATION '${loc.getAbsolutePath}'")
    Tables.load(spark, dir, "orders")
      .orderBy("o_orderkey").limit(100)
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .write.format("graft-sqldb").option("dir", dir).option("table", "fed_sink")
      .mode("append").save()
    spark.read.format("graft-sqldb").option("dir", dir).option("table", "fed_sink")
      .load().orderBy("o_orderkey")
  }

  /** S37 — federated key-matched UPSERT under the driver oracle: the
    * MERGE-semantics write path ([[graft.sources.GraftMergeBatchWrite]])
    * exercised end-to-end on the in-process double (emulated
    * overwrite-merge publish; the ANSI MERGE rendering itself is
    * live-tested against Derby in MergeUpsertSpec). Seed the target with
    * the top-50 orders, then upsert orders 26..75 with re-stated totals
    * (+1000): keys 1..25 survive unchanged, 26..50 update in place,
    * 51..75 insert — all three MERGE outcomes in one final state the
    * oracle recomputes relationally. Idempotent (DROP + CREATE) because
    * Verify and both Bench passes re-run entries in one session. */
  val s37Upsert: Q = (spark, dir) => {
    val backend = graft.sources.SparkViewBackend.forDir(dir)
    backend.executeUpdate("DROP TABLE IF EXISTS fed_upsert")
    // explicit location, wiped first — same stale-managed-dir reasoning
    // as s32's sink table
    val loc = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_fed_upsert_" + dir.replaceAll("[^a-zA-Z0-9]", "_"))
    def rm(f: java.io.File): Unit = if (f.exists) {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(): Unit
    }
    rm(loc)
    backend.executeUpdate(
      "CREATE TABLE fed_upsert (o_orderkey BIGINT, o_totalprice DOUBLE, o_orderpriority STRING) " +
        s"USING parquet LOCATION '${loc.getAbsolutePath}'")
    val src = Tables.load(spark, dir, "orders")
      .orderBy("o_orderkey")
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
    src.limit(50)
      .write.format("graft-sqldb").option("dir", dir).option("table", "fed_upsert")
      .mode("append").save()
    src.offset(25).limit(50)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      .write.format("graft-sqldb").option("dir", dir).option("table", "fed_upsert")
      .option("upsertKeys", "o_orderkey")
      .mode("append").save()
    spark.read.format("graft-sqldb").option("dir", dir).option("table", "fed_upsert")
      .load().orderBy("o_orderkey")
  }

  /** S33 — decimal money end-to-end (SURVEY C7/C13 over DecimalType; the
    * reference maps NUMERIC → Decimal(38,4), `src/sqldb/postgres/
    * datatypes.rs:160-162`, but its parquet fixtures are double-typed so
    * decimals never flow through its tests — here they do). Money columns
    * cast to DECIMAL(18,4) at the scan, a decimal-literal predicate, and
    * exact decimal aggregation. The ARITHMETIC is all-decimal and the
    * intermediate types are pinned (DECIMAL(38,8) keeps the full product
    * scale, so no rounding step exists whose half-even/half-up mode could
    * diverge between engines), but the DRIVER-VISIBLE columns are the
    * exact decimals rendered as strings. Measured reason (round-6 red row,
    * r7 diagnosis): DuckDB 1.0.0's pandas fetch (`.df()`) converts
    * DECIMAL columns to float64 ("1008506245.1815"), while reading this
    * entry's parquet output back with pandas keeps `Decimal` objects
    * ("1008506245.18150000") — so any harness that fetches the oracle via
    * pandas and the engine output via parquet canonicalizes the SAME exact
    * value two different ways and the hash diverges. A terminal
    * decimal→string cast on BOTH sides is the only surface that renders
    * identically across every fetch path (fetchall / Arrow / pandas),
    * verified against all three; the full 8-digit scale stays visible, so
    * exactness is still what's being checked. */
  val s33DecimalMoney: Q = (spark, dir) =>
    Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        col("l_extendedprice").cast("decimal(18,4)").as("price_dec"),
        col("l_discount").cast("decimal(18,4)").as("disc_dec"))
      .filter(col("price_dec") > lit(new java.math.BigDecimal("1000.0000")))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("price_dec") * (lit(1) - col("disc_dec")))
          .cast("decimal(38,8)").cast("string").as("rev_dec"),
        min(col("price_dec")).cast("decimal(18,4)").cast("string").as("min_price"),
        max(col("disc_dec")).cast("decimal(18,4)").cast("string").as("max_disc"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** S34 — runtime-pruned federated join (VERDICT r5 §next 8): the FACT
    * side is a federated scan (`graft-sqldb`), the dim side a selective
    * parquet filter; Spark's dynamic-pruning planning hands the dim's join
    * keys to the scan as a runtime V2 filter, which renders into the
    * backend SQL as `l_orderkey IN (…)` — the backend then never produces
    * the non-qualifying fact rows at all. At 100 TB this is the difference
    * between shipping the whole fact table over the wire and shipping the
    * ~20% that joins. Runs in its own session: the view-double backend has
    * no partition statistics, so DPP's benefit heuristic is conf-forced
    * (a real backend's catalog row counts make it automatic); session
    * isolation keeps that conf from touching other entries' plans.
    * `FederationSpec`/`CorpusSpec` assert the IN-list actually reaches the
    * backend; this entry makes the same path a BENCH line. */
  val s34RuntimePrunedJoin: Q = (spark0, dir) => {
    val spark = spark0.newSession()
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "10000")
    val fact = spark.read.format("graft-sqldb").option("dir", dir)
      .option("table", "lineitem").load()
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val dim = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderpriority")
    fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      // prices carry exactly 2 decimals, so the TRUE sum has 2 decimals;
      // rounding the float sum there erases the ~1e-7 partial-sum-order
      // difference between Spark and the oracle (sum_qty is integer-valued
      // and already exact)
      .agg(sum("l_quantity").as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_price"),
        count(lit(1)).as("n"))
  }

  /** S35 — LISTAGG / string_agg (SURVEY C13's string-concatenation
    * aggregate; the reference's Postgres target spells it string_agg).
    * WITHIN GROUP ordering makes the concatenation deterministic — an
    * unordered listagg would be partition-order-dependent and can never
    * be oracle-checked. */
  /** S36 — interval year-month arithmetic, the reference's Q4 blocker
    * class (`README.md:52` "DateIntervalExpr does not support
    * IntervalYearMonth"; literal support stopped at year-month,
    * `parser.rs:645-647`): a window bound computed as timestamp +
    * INTERVAL '6' MONTH, a shifted due-date column (+ INTERVAL '3'
    * MONTH), a conditional count against it, and a MAX over the shifted
    * timestamps. Both engines clamp month-end arithmetic identically
    * (Jan 31 + 1 month = Feb 28), so the results compare exactly. */
  val s36IntervalWindow: Q = (spark, dir) => {
    val o = Tables.load(spark, dir, "orders")
    val winStart = "TIMESTAMP '1996-01-01 00:00:00'"
    o.filter(col("o_orderdate") >= expr(winStart) &&
        col("o_orderdate") < expr(s"$winStart + INTERVAL '6' MONTH"))
      .withColumn("due", col("o_orderdate") + expr("INTERVAL '3' MONTH"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        count(when(col("due") < ts("1996-08-01 00:00:00"), 1))
          .as("n_due_before_aug96"),
        max(col("due")).as("latest_due"))
      .orderBy(col("o_orderpriority"))
  }

  val s35ListAggSql: String =
    """SELECT n_regionkey,
      |       listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS names,
      |       count(*) AS n
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  /** queries keyed for SparkEntry; insertion order = corpus order. */
  val queries: Seq[(String, Q)] = Seq(
    "s01_pricing_summary" -> s01PricingSummary,
    "s02_shipping_priority" -> s02ShippingPriority,
    "s03_local_supplier_volume" -> s03LocalSupplierVolume,
    "s04_forecast_revenue" -> s04ForecastRevenue,
    "s05_volume_shipping" -> s05VolumeShipping,
    "s06_market_share" -> s06MarketShare,
    "s07_returned_items" -> s07ReturnedItems,
    "s08_customer_distribution" -> s08CustomerDistribution,
    "s09_promo_effect" -> s09PromoEffect,
    "s10_large_orders" -> s10LargeOrders,
    "s11_global_sales" -> s11GlobalSales,
    "s12_order_priority" -> s12OrderPriority,
    "s13_parts_not_shipped" -> s13PartsNotShipped,
    "s14_small_qty_revenue" -> s14SmallQuantityRevenue,
    "s15a_union_all" -> s15aUnionAll,
    "s15b_intersect" -> s15bIntersect,
    "s15c_except" -> s15cExcept,
    "s16a_count_distinct" -> s16aCountDistinct,
    "s16b_distinct" -> s16bDistinct,
    "s17a_rank" -> s17aRank,
    "s17b_running_sum" -> s17bRunningSum,
    "s18a_rollup" -> s18aRollup,
    "s18b_cube" -> s18bCube,
    "s18c_grouping_sets" -> sqlQ(s18cGroupingSetsSql),
    "s19_null_ordering" -> s19NullOrdering,
    "s20_cross_join" -> s20CrossJoin,
    "s21a_scalar_battery" -> sqlQ(s21aScalarBatterySql),
    "s21b_date_battery" -> sqlQ(s21bDateBatterySql),
    "s22_stat_agg" -> sqlQ(s22StatAggSql),
    "s23a_events_hourly" -> sqlQ(s23aHourlySql),
    "s23b_sessionization" -> sqlQ(s23bSessionsSql),
    "s23c_session_window" -> s23cSessionWindow,
    "s24_or_conjunctions" -> s24DiscountedRevenue,
    "s25_json_props" -> s25JsonProps,
    "s25b_variant_props" -> s25bVariantProps,
    "s26_array_struct" -> s26ArrayStruct,
    "s27a_full_outer" -> s27aFullOuter,
    "s27b_right_outer" -> s27bRightOuter,
    "s30_pivot" -> s30Pivot,
    "s31_catalog" -> s31Catalog,
    "s32_federated_write" -> s32FederatedWrite,
    "s33_decimal_money" -> s33DecimalMoney,
    "s34_runtime_pruned_join" -> s34RuntimePrunedJoin,
    "s35_listagg" -> sqlQ(s35ListAggSql),
    "s36_interval_window" -> s36IntervalWindow,
    "s37_upsert" -> s37Upsert,
  )

  /** DuckDB oracle SQL per key (FIXTURES.md §3 text). */
  val oracleSql: Seq[(String, String)] = Seq(
    "s36_interval_window" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |       COUNT(*) FILTER (WHERE o_orderdate + INTERVAL 3 MONTH
        |                              < TIMESTAMP '1996-08-01 00:00:00') AS n_due_before_aug96,
        |       MAX(o_orderdate + INTERVAL 3 MONTH) AS latest_due
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00' + INTERVAL 6 MONTH
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "s01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       SUM(l_quantity) AS sum_qty,
        |       SUM(l_extendedprice) AS sum_base_price,
        |       SUM(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
        |       SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
        |       AVG(l_quantity) AS avg_qty, AVG(l_extendedprice) AS avg_price,
        |       AVG(l_discount) AS avg_disc, COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "s02_shipping_priority" ->
      """SELECT l_orderkey, SUM(l_extendedprice * (1 - l_discount)) AS revenue, o_orderdate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,
    "s03_local_supplier_volume" ->
      """SELECT n_name, SUM(l_extendedprice * (1 - l_discount)) AS revenue
        |FROM customer JOIN orders   ON c_custkey = o_custkey
        |              JOIN lineitem ON l_orderkey = o_orderkey
        |              JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |              JOIN nation   ON s_nationkey = n_nationkey
        |              JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "s04_forecast_revenue" ->
      """SELECT SUM(l_extendedprice * l_discount) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "s05_volume_shipping" ->
      """SELECT supp_nation, cust_nation, l_year, SUM(volume) AS revenue
        |FROM ( SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |              YEAR(l_shipdate) AS l_year,
        |              l_extendedprice * (1 - l_discount) AS volume
        |       FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        |                     JOIN orders   ON o_orderkey = l_orderkey
        |                     JOIN customer ON c_custkey = o_custkey
        |                     JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |                     JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |       WHERE n1.n_name <> n2.n_name
        |         AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
        |                            AND TIMESTAMP '1996-12-31 00:00:00' ) shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year LIMIT 50""".stripMargin,
    "s06_market_share" ->
      """SELECT o_year,
        |       SUM(CASE WHEN nation = 'BRAZIL' THEN volume ELSE 0 END) / SUM(volume) AS mkt_share
        |FROM ( SELECT YEAR(o_orderdate) AS o_year,
        |              l_extendedprice * (1 - l_discount) AS volume, n2.n_name AS nation
        |       FROM part JOIN lineitem ON p_partkey = l_partkey
        |                 JOIN supplier ON s_suppkey = l_suppkey
        |                 JOIN orders   ON l_orderkey = o_orderkey
        |                 JOIN customer ON o_custkey = c_custkey
        |                 JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |                 JOIN region   ON n1.n_regionkey = r_regionkey
        |                 JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |       WHERE r_name = 'AMERICA'
        |         AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
        |                             AND TIMESTAMP '1996-12-31 00:00:00' ) all_nations
        |GROUP BY o_year ORDER BY o_year""".stripMargin,
    "s07_returned_items" ->
      """SELECT c_custkey, c_name, SUM(l_extendedprice * (1 - l_discount)) AS revenue,
        |       c_acctbal, n_name
        |FROM customer JOIN orders   ON c_custkey = o_custkey
        |              JOIN lineitem ON l_orderkey = o_orderkey
        |              JOIN nation   ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "s08_customer_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM ( SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |       FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |       GROUP BY c_custkey ) c_orders
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "s09_promo_effect" ->
      """SELECT 100.00 * SUM(CASE WHEN p_type LIKE 'PROMO%'
        |                         THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        |       / SUM(l_extendedprice * (1 - l_discount)) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'""".stripMargin,
    "s10_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, SUM(l_quantity) AS total_qty
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN ( SELECT l_orderkey FROM lineitem
        |                      GROUP BY l_orderkey HAVING SUM(l_quantity) > 150 )
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100""".stripMargin,
    "s11_global_sales" ->
      """SELECT cntrycode, COUNT(*) AS numcust, SUM(c_acctbal) AS totacctbal
        |FROM ( SELECT c_custkey % 7 AS cntrycode, c_acctbal, c_custkey
        |       FROM customer
        |       WHERE c_custkey % 7 IN (1, 3, 5)
        |         AND c_acctbal > ( SELECT AVG(c_acctbal) FROM customer
        |                           WHERE c_acctbal > 0.00 AND c_custkey % 7 IN (1, 3, 5) )
        |         AND NOT EXISTS ( SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                          AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00' ) ) custsale
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin,
    "s12_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS ( SELECT 1 FROM lineitem
        |               WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate )
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "s13_parts_not_shipped" ->
      """SELECT p_brand, p_type, COUNT(DISTINCT p_partkey) AS part_cnt
        |FROM part
        |WHERE p_size IN (1, 2, 3, 4, 5)
        |  AND p_partkey NOT IN ( SELECT l_partkey FROM lineitem WHERE l_quantity > 45 )
        |GROUP BY p_brand, p_type ORDER BY part_cnt DESC, p_brand, p_type""".stripMargin,
    "s14_small_qty_revenue" ->
      """SELECT SUM(l_extendedprice) / 7.0 AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#23'
        |  AND l_quantity < ( SELECT 0.5 * AVG(l2.l_quantity)
        |                     FROM lineitem l2 WHERE l2.l_partkey = p_partkey )""".stripMargin,
    "s15a_union_all" ->
      """SELECT nk FROM ( SELECT c_nationkey AS nk FROM customer
        |                 UNION ALL SELECT s_nationkey FROM supplier ) u
        |ORDER BY nk LIMIT 200""".stripMargin,
    "s15b_intersect" ->
      "SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk",
    "s15c_except" ->
      "SELECT n_nationkey AS nk FROM nation EXCEPT SELECT s_nationkey FROM supplier WHERE s_suppkey <= 10 ORDER BY nk",
    "s16a_count_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS supp_cnt,
        |       COUNT(DISTINCT l_partkey) AS part_cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "s16b_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "s17a_rank" ->
      """SELECT p_brand, p_partkey, p_retailprice,
        |       RANK()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS price_rank,
        |       ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_partkey) AS rn
        |FROM part ORDER BY p_brand, price_rank, p_partkey LIMIT 100""".stripMargin,
    "s17b_running_sum" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |       SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey LIMIT 200""".stripMargin,
    "s18a_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS cnt FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name) ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "s18b_cube" ->
      """SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS q FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "s18c_grouping_sets" -> s18cGroupingSetsSql,
    "s19_null_ordering" ->
      """SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS st, o_totalprice
        |FROM orders
        |ORDER BY st DESC NULLS FIRST, o_totalprice DESC, o_orderkey LIMIT 50 OFFSET 10""".stripMargin,
    "s20_cross_join" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name LIMIT 200""".stripMargin,
    "s21a_scalar_battery" -> s21aScalarBatterySql,
    "s21b_date_battery" -> s21bDateBatterySql,
    "s22_stat_agg" -> s22StatAggSql,
    "s23a_events_hourly" -> s23aHourlySql,
    "s23b_sessionization" -> s23bSessionsSql,
    "s23c_session_window" -> s23cSessionWindowOracleSql,
    "s24_or_conjunctions" ->
      """SELECT SUM(l_extendedprice * (1 - l_discount)) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE ( p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |        AND l_quantity >= 1  AND l_quantity <= 11 )
        |   OR ( p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |        AND l_quantity >= 10 AND l_quantity <= 20 )
        |   OR ( p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |        AND l_quantity >= 20 AND l_quantity <= 30 )""".stripMargin,
    "s25_json_props" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, COUNT(*) AS n
        |FROM events GROUP BY k ORDER BY k""".stripMargin,
    // the variant path must land on exactly the string path's answer
    "s25b_variant_props" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, COUNT(*) AS n
        |FROM events GROUP BY k ORDER BY k""".stripMargin,
    "s26_array_struct" ->
      """SELECT vec_id, len(embedding) AS dim,
        |       ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
        |       ROUND(list_sum(CAST(embedding AS DOUBLE[])), 6) AS sum_vals,
        |       label AS label2
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "s27a_full_outer" ->
      """SELECT n_nationkey, sk, s_cnt
        |FROM nation FULL OUTER JOIN
        |     ( SELECT s_nationkey + 20 AS sk, COUNT(*) AS s_cnt
        |       FROM supplier GROUP BY 1 ) s
        |ON n_nationkey = sk
        |ORDER BY n_nationkey NULLS FIRST, sk NULLS FIRST""".stripMargin,
    "s27b_right_outer" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS recent_orders
        |FROM orders RIGHT OUTER JOIN customer
        |  ON o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "s30_pivot" ->
      """SELECT l_returnflag,
        |       SUM(l_quantity) FILTER (WHERE l_linestatus = 'F') AS qty_f,
        |       SUM(l_quantity) FILTER (WHERE l_linestatus = 'O') AS qty_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "s31_catalog" ->
      """SELECT o_orderpriority, COUNT(*) AS n, SUM(l_quantity) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > TIMESTAMP '1995-01-01 00:00:00'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // the write round-trip must hand back exactly the source rows: the
    // oracle IS the source selection
    "s32_federated_write" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority
        |FROM orders ORDER BY o_orderkey LIMIT 100""".stripMargin,
    // the upsert's final state recomputed relationally: updates win over
    // the seed by key, unmatched seed rows survive, new keys insert
    "s37_upsert" ->
      """WITH base AS (SELECT o_orderkey, o_totalprice, o_orderpriority
        |              FROM orders ORDER BY o_orderkey LIMIT 50),
        |     up AS (SELECT o_orderkey, o_totalprice + 1000 AS o_totalprice, o_orderpriority
        |            FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 25)
        |SELECT o_orderkey, o_totalprice, o_orderpriority FROM (
        |  SELECT * FROM up
        |  UNION ALL
        |  SELECT * FROM base b
        |  WHERE NOT EXISTS (SELECT 1 FROM up WHERE up.o_orderkey = b.o_orderkey)
        |) ORDER BY o_orderkey""".stripMargin,
    "s33_decimal_money" ->
      """SELECT l_returnflag,
        |       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
        |                 * (1 - CAST(l_discount AS DECIMAL(18,4))))
        |            AS DECIMAL(38,8)) AS VARCHAR) AS rev_dec,
        |       CAST(CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS min_price,
        |       CAST(CAST(MAX(CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS VARCHAR) AS max_disc,
        |       COUNT(*) AS n
        |FROM lineitem
        |WHERE CAST(l_extendedprice AS DECIMAL(18,4)) > 1000.0000
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "s34_runtime_pruned_join" ->
      """SELECT o_orderpriority, SUM(l_quantity) AS sum_qty,
        |       ROUND(SUM(l_extendedprice), 2) AS sum_price, COUNT(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderpriority""".stripMargin,
    "s35_listagg" ->
      """SELECT n_regionkey,
        |       string_agg(n_name, ',' ORDER BY n_name) AS names,
        |       COUNT(*) AS n
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
  )
}
