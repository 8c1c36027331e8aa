package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 *
 * Every entry in [[queries]] is an operator from the SURVEY §2 inventory (or a
 * BASELINE.json extension op) expressed Spark-first; entries with a DuckDB
 * oracle in [[oracleSql]] are hash-checked by the driver at sf0.01, the rest
 * get a rows-only check. Column names and types are aligned 1:1 with the
 * oracle SQL (the driver sorts columns by name before hashing).
 */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalOps.tpchQ1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- SURVEY §2.2 to_frame pipeline analogues + §2.4 workload ops --
    "q03_filter_project" -> (RelationalOps.filterProject(_, _)),
    "q04_datetime_convert" -> (RelationalOps.datetimeConvert(_, _)),
    "q05_sort_topk" -> (RelationalOps.sortTopK(_, _)),
    "q06_union_tag" -> (RelationalOps.unionTag(_, _)),
    // -- SURVEY §2.5 gap map: aggregations / joins / windows / set ops / scalars --
    "q01_tpch1_agg" -> (RelationalOps.tpchQ1(_, _)),
    "q02_tpch6_filter_agg" -> (RelationalOps.tpchQ6(_, _)),
    "q07_downsample8" -> (RelationalOps.downsample8(_, _)),
    "q08_join_broadcast" -> (RelationalOps.joinBroadcast(_, _)),
    "q09_join_shuffle" -> (RelationalOps.joinShuffle(_, _)),
    "q10_join_anti" -> (RelationalOps.joinAnti(_, _)),
    "q11_join_semi" -> (RelationalOps.joinSemi(_, _)),
    "q12_tpch3_topk" -> (RelationalOps.tpchQ3(_, _)),
    "q13_window_rank" -> (RelationalOps.windowRank(_, _)),
    "q14_window_running" -> (RelationalOps.windowRunning(_, _)),
    "q15_set_except" -> (RelationalOps.setExcept(_, _)),
    "q16_set_intersect" -> (RelationalOps.setIntersect(_, _)),
    "q17_scalar_funcs" -> (RelationalOps.scalarFuncs(_, _)),
    "q18_date_parts" -> (RelationalOps.dateParts(_, _))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q03_filter_project" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'purchase' AND value > 50 ORDER BY event_id""".stripMargin,
    "q04_datetime_convert" ->
      """SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
        |strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_bucket
        |FROM events ORDER BY event_id""".stripMargin,
    "q05_sort_topk" ->
      "SELECT event_id, user_id, value FROM events ORDER BY value DESC, event_id LIMIT 100",
    "q06_union_tag" ->
      """SELECT 'high' AS tag, event_id, value FROM events WHERE value >= 100
        |UNION ALL
        |SELECT 'low' AS tag, event_id, value FROM events WHERE value < 100
        |ORDER BY event_id, tag""".stripMargin,
    "q01_tpch1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |round(sum(l_quantity),2) AS sum_qty,
        |round(sum(l_extendedprice),2) AS sum_base_price,
        |round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        |round(avg(l_quantity),4) AS avg_qty,
        |round(avg(l_discount),4) AS avg_disc,
        |CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_tpch6_filter_agg" ->
      """SELECT round(sum(l_extendedprice*l_discount),2) AS revenue FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q07_downsample8" ->
      """SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_bucket,
        |CAST(count(*) AS BIGINT) AS n,
        |round(avg(value),4) AS agg_average,
        |round(sum(value),2) AS agg_sum,
        |arg_max(value, event_id) AS agg_last,
        |max(value) AS agg_max,
        |min(value) AS agg_min,
        |round(avg(coalesce(value,0)),4) AS agg_avg_zero,
        |max(abs(value)) AS agg_absmax,
        |min(abs(value)) AS agg_absmin
        |FROM events GROUP BY 1,2 ORDER BY event_type, hour_bucket""".stripMargin,
    "q08_join_broadcast" ->
      """SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_cust,
        |round(sum(c_acctbal),2) AS total_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q09_join_shuffle" ->
      """SELECT o_orderpriority, CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
        |round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q10_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,
    "q11_join_semi" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q12_tpch3_topk" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS odate,
        |round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY o_orderkey, odate ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q13_window_rank" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q14_window_running" ->
      """SELECT event_id, user_id,
        |round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running
        |FROM events ORDER BY event_id""".stripMargin,
    "q15_set_except" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
        |EXCEPT SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 250
        |ORDER BY user_id""".stripMargin,
    "q16_set_intersect" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        |INTERSECT SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin,
    "q17_scalar_funcs" ->
      """SELECT doc_id, upper(substr(text,1,10)) AS head10,
        |CAST(length(text) AS BIGINT) AS len, n_chars,
        |lang || '_' || source AS tag FROM documents ORDER BY doc_id""".stripMargin,
    "q18_date_parts" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS oyear,
        |CAST(quarter(o_orderdate) AS INT) AS oquarter,
        |CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice),2) AS total
        |FROM orders GROUP BY 1,2 ORDER BY oyear, oquarter""".stripMargin
  )
}
