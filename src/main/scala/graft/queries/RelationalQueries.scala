package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Relational operator families beyond the reference's surface (SURVEY.md §2
  * marks them ABSENT in the reference; they are table stakes for a usable
  * engine and for the §7.3 extensions): aggregations, joins, windows, sorts,
  * set ops, scalar functions, subqueries.
  *
  * Conventions for oracle stability: every query ends in a deterministic
  * ORDER BY over a unique key (with NULLS FIRST spelled out in the DuckDB SQL
  * to match Spark's asc_nulls_first); double aggregates are round()ed; DuckDB
  * integer sums are cast ::BIGINT to match Spark's LongType.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // --- Aggregation family -------------------------------------------------
    // TPC-H Q1 shape: map-side partial agg + one hash shuffle on the two
    // grouping keys; doubles rounded at the end for cross-engine stability.
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // TPC-H Q6 shape: tight filter fully pushed to the parquet scan, then a
    // single scalar agg — the plan should show PushedFilters on l_shipdate,
    // l_discount, l_quantity.
    "q6_filter_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
                col("l_shipdate") < lit("1997-01-01") &&
                col("l_discount").between(0.02, 0.06) &&
                col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue"))
    }),

    "agg_stats" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
          round(expr("percentile(l_discount, 0.5)"), 6).as("median_disc"),
          count_distinct(col("l_partkey")).as("n_parts"))
        .orderBy(col("l_returnflag"))
    }),

    "agg_having" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
             round(sum(col("o_totalprice")), 2).as("spend"))
        .filter(col("n_orders") >= 15)
        .orderBy(col("o_custkey"))
    }),

    // GROUP BY ROLLUP / CUBE (multi-dimensional aggregates).
    "rollup_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
             count(lit(1)).as("cnt"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),

    "cube_agg" -> ((s, dir) => {
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"),
             round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(asc_nulls_first("o_orderstatus"),
                 asc_nulls_first("o_orderpriority"))
    }),

    "distinct_pairs" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // --- Join family --------------------------------------------------------
    // TPC-H Q5 shape: two broadcast-able dims (nation, region) + a fact-side
    // equi-join; Catalyst should pick BroadcastHashJoin for every dim.
    "q5_join_agg" -> ((s, dir) => {
      val customer = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
      val nation = t(s, dir, "nation")
      val region = t(s, dir, "region")
      orders
        .join(customer, orders("o_custkey") === customer("c_custkey"))
        .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
             count(lit(1)).as("n_orders"))
        .orderBy(col("n_name"))
    }),

    "join_semi" -> ((s, dir) => {
      val customer = t(s, dir, "customer")
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      customer.join(urgent, customer("c_custkey") === urgent("o_custkey"),
          "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    "join_anti" -> ((s, dir) => {
      val customer = t(s, dir, "customer")
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
      customer.join(big, customer("c_custkey") === big("o_custkey"),
          "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    "join_outer_agg" -> ((s, dir) => {
      val customer = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
      customer.join(orders, customer("c_custkey") === orders("o_custkey"),
          "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
             round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("spend"))
        .orderBy(col("c_custkey"))
    }),

    // --- Window family ------------------------------------------------------
    "window_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
                 col("l_linenumber"))
      t(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("l_returnflag"), col("rn"), col("l_orderkey"),
                col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_returnflag"), col("rn"))
    }),

    "window_lag_delta" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .select(
          col("event_id"), col("user_id"),
          round((unix_micros(col("ts")) - unix_micros(col("prev_ts")))
            .cast("double") / 1e6, 6).as("gap_s"),
          col("next_type"))
        .orderBy(col("event_id"))
    }),

    "window_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(w), 2).as("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Schema-drift-tolerant union: generational frames with different
    // column sets align BY NAME, absent columns null-filled — the read-side
    // companion to `schema_evolution` (which exercises the same drift at
    // the parquet layer via mergeSchema).
    "union_by_name" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val gen1 = o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val gen2 = o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderstatus"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
      gen1.unionByName(gen2, allowMissingColumns = true)
        .orderBy(col("o_orderkey"))
    }),

    // Trailing event-time window: per-user 1-hour rolling sum via a RANGE
    // frame on epoch seconds — interval-bounded (not row-count) trailing
    // aggregates, the time-series form tumbling windows can't express.
    // RANGE includes all order-value peers, so second-level ties get the
    // same frame on both engines (ROWS frames would be tie-ambiguous).
    "rolling_window_agg" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").cast("long"))
        .rangeBetween(-3599, Window.currentRow)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          (round(sum(col("value")).over(w), 2) + 0.0).as("trailing_1h"),
          count(lit(1)).over(w).as("n_trailing"))
        .orderBy(col("event_id"))
    }),

    // --- Sort / limit family ------------------------------------------------
    "topk_orders" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .limit(10)),

    "sort_multi" -> ((s, dir) =>
      t(s, dir, "supplier")
        .orderBy(col("s_nationkey").desc, col("s_acctbal"), col("s_suppkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))),

    // --- Set operations -----------------------------------------------------
    "set_intersect" -> ((s, dir) => {
      val building = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("k"))
      val withOrders = t(s, dir, "orders").select(col("o_custkey").as("k"))
      building.intersect(withOrders).orderBy(col("k"))
    }),

    "set_except" -> ((s, dir) => {
      val all = t(s, dir, "customer").select(col("c_custkey").as("k"))
      val building = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("k"))
      all.except(building).orderBy(col("k"))
    }),

    "set_union_distinct" -> ((s, dir) => {
      t(s, dir, "events").select(col("event_type").as("v"))
        .union(t(s, dir, "region").select(col("r_name").as("v")))
        .distinct().orderBy(col("v"))
    }),

    // --- Scalar functions ---------------------------------------------------
    "scalar_funcs" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          upper(substring(col("o_orderpriority"), 3, 10)).as("prio"),
          length(col("o_orderstatus")).as("st_len"),
          concat_ws("#", col("o_orderstatus"),
            col("o_orderkey").cast("string")).as("tag"),
          // floor/ceil instead of per-row round(): round's tie rule on
          // doubles differs across engines at the x.xx5 knife edge.
          floor(col("o_totalprice")).as("price_floor"),
          ceil(col("o_totalprice")).as("price_ceil"),
          pmod(col("o_orderkey"), lit(7)).as("bucket"),
          when(col("o_totalprice") < 100000, "low")
            .when(col("o_totalprice") < 200000, "mid")
            .otherwise("high").as("band"))
        .orderBy(col("o_orderkey"))),

    "json_extract" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_val"))
        .orderBy(col("event_id"))),

    // Corrupt-tolerant ingestion: a deterministic 1-in-7 slice of the JSON
    // column is truncated mid-token, then parsed PERMISSIVE — bad records
    // become NULL rows to account for, not task failures (the posture that
    // keeps a 100 TB ingest alive when a few files are mangled). The oracle
    // applies the same corruption and gates extraction on json_valid.
    "corrupt_json_tolerance" -> ((s, dir) => {
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      t(s, dir, "events")
        .select(col("event_id"),
          when(col("event_id") % 7 === 0, substring(col("props"), 1, 4))
            .otherwise(col("props")).as("raw"))
        .withColumn("k",
          from_json(col("raw"),
            StructType(Seq(StructField("k", LongType)))).getField("k"))
        .agg(count(lit(1)).as("n"), count(col("k")).as("n_parsed"),
          sum(col("k")).as("sum_k"))
    }),

    // --- Event-time windowing (batch form of the streaming tumbling agg) ----
    "time_window_agg" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").getField("start").as("hour_start"),
                 col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .orderBy(col("hour_start"), col("event_type"))),

    // --- SQL entry point (§3.2 parity): scalar subquery through spark.sql --
    "sql_scalar_subquery" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT o_orderkey, o_totalprice FROM orders_v
          |WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders_v)
          |ORDER BY o_orderkey""".stripMargin)
    }),

    // SQL-over-path (SELECT … FROM '<file>' — duckdb…/worker.go:14 analog).
    "sql_count_path" -> ((s, dir) =>
      s.sql(s"SELECT count(*) AS cnt FROM parquet.`$dir/lineitem.parquet`")),

    // Catalog-shaped SQL: every table registered as a view, arbitrary
    // multi-table SQL on top (graft.Tables.registerAll).
    "sql_over_views" -> ((s, dir) => {
      graft.Tables.registerAll(s, dir)
      s.sql(
        """SELECT r_name, count(*) AS n_suppliers,
          |  round(sum(s_acctbal), 2) AS bal
          |FROM supplier
          |JOIN nation ON s_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY r_name ORDER BY r_name""".stripMargin)
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q6_filter_agg" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin,

    "agg_stats" ->
      """SELECT l_returnflag,
        |  min(l_quantity) AS min_qty,
        |  max(l_quantity) AS max_qty,
        |  round(stddev_samp(l_extendedprice), 4) AS sd_price,
        |  round(quantile_cont(l_discount, 0.5), 6) AS median_disc,
        |  count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS spend
        |FROM orders GROUP BY o_custkey
        |HAVING count(*) >= 15 ORDER BY o_custkey""".stripMargin,

    "rollup_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "cube_agg" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "distinct_pairs" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q5_join_agg" ->
      """SELECT n_name, round(sum(o_totalprice), 2) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,

    "join_outer_agg" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  round(coalesce(sum(o_totalprice), 0.0), 2) AS spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "window_topk_per_group" ->
      """SELECT l_returnflag, rn, l_orderkey, l_linenumber, l_extendedprice
        |FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem)
        |WHERE rn <= 3 ORDER BY l_returnflag, rn""".stripMargin,

    "window_lag_delta" ->
      """SELECT event_id, user_id,
        |  round(epoch(ts - lag(ts, 1) OVER w), 6) AS gap_s,
        |  lead(event_type, 1) OVER w AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "window_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |    AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "union_by_name" ->
      """SELECT o_orderkey, o_orderstatus, NULL AS o_totalprice
        |FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL BY NAME
        |SELECT o_orderstatus, o_orderkey, round(o_totalprice, 2)
        |  AS o_totalprice
        |FROM orders WHERE o_orderkey % 2 = 1
        |ORDER BY o_orderkey""".stripMargin,

    "rolling_window_agg" ->
      """SELECT event_id, user_id,
        |  round(sum(value) OVER w, 2) + 0.0 AS trailing_1h,
        |  count(*) OVER w AS n_trailing
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |  RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "sort_multi" ->
      """SELECT s_suppkey, s_nationkey, s_acctbal FROM supplier
        |ORDER BY s_nationkey DESC, s_acctbal, s_suppkey""".stripMargin,

    "set_intersect" ->
      """SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey AS k FROM orders
        |ORDER BY k""".stripMargin,

    "set_except" ->
      """SELECT c_custkey AS k FROM customer
        |EXCEPT
        |SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY k""".stripMargin,

    "set_union_distinct" ->
      """SELECT DISTINCT v FROM (
        |  SELECT event_type AS v FROM events
        |  UNION ALL SELECT r_name AS v FROM region)
        |ORDER BY v""".stripMargin,

    "scalar_funcs" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS yr,
        |  month(o_orderdate) AS mo,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  upper(substring(o_orderpriority, 3, 10)) AS prio,
        |  length(o_orderstatus) AS st_len,
        |  concat_ws('#', o_orderstatus, o_orderkey::VARCHAR) AS tag,
        |  floor(o_totalprice)::BIGINT AS price_floor,
        |  ceil(o_totalprice)::BIGINT AS price_ceil,
        |  o_orderkey % 7 AS bucket,
        |  CASE WHEN o_totalprice < 100000 THEN 'low'
        |       WHEN o_totalprice < 200000 THEN 'mid'
        |       ELSE 'high' END AS band
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "json_extract" ->
      """SELECT event_id, json_extract_string(props, '$.k')::INT AS k_val
        |FROM events ORDER BY event_id""".stripMargin,

    "corrupt_json_tolerance" ->
      """WITH e AS (
        |  SELECT CASE WHEN event_id % 7 = 0 THEN substr(props, 1, 4)
        |              ELSE props END AS raw
        |  FROM events),
        |p AS (
        |  SELECT CASE WHEN json_valid(raw)
        |              THEN CAST(json_extract(raw, '$.k') AS BIGINT) END AS k
        |  FROM e)
        |SELECT count(*) AS n, count(k) AS n_parsed,
        |  CAST(sum(k) AS BIGINT) AS sum_k
        |FROM p""".stripMargin,

    "time_window_agg" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,

    "sql_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "sql_count_path" ->
      "SELECT count(*) AS cnt FROM lineitem",

    "sql_over_views" ->
      """SELECT r_name, count(*) AS n_suppliers,
        |  round(sum(s_acctbal), 2) AS bal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin
  )
}
