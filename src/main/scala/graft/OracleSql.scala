package graft

import graft.sources.Tables

/** DuckDB oracle SQL for every query in [[Queries.core]].
  *
  * Contract (driver): each SQL runs in DuckDB against views named after the
  * parquet tables; results are compared to the Spark parquet dump after
  * sorting columns by name. So: identical column aliases, a total ORDER BY,
  * and arithmetic that is bit-identical across engines (DECIMAL for sums,
  * integer-only derived columns, rounding only far from representable
  * boundaries).
  */
object OracleSql {

  private val changelog = Tables.shareHoldersChangelogSql

  /** events with ts truncated ns -> us, matching the Spark-side loader. */
  private val eventsUs =
    """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
      |FROM events""".stripMargin

  val core: Map[String, String] = Map(
    "q1_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-07-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q2_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_join_agg" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q4_broadcast_join" ->
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,

    "q5_left_join" ->
      """SELECT c_custkey, c_name, COUNT(o_orderkey) AS order_count
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY c_custkey""".stripMargin,

    "q6_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q7_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q8_multi_join" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  COUNT(*) AS n
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q9_count_distinct" ->
      """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_cust
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q10_rollup" ->
      """SELECT COALESCE(n_name, 'ALL') AS nation,
        |  COALESCE(c_mktsegment, 'ALL') AS segment,
        |  CAST(GROUPING(n_name) AS INT) AS g_nation,
        |  CAST(GROUPING(c_mktsegment) AS INT) AS g_segment,
        |  COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, c_mktsegment)
        |ORDER BY nation, segment""".stripMargin,

    "q11_rank_window" ->
      """SELECT o_custkey, o_orderkey, rn, rnk FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT) AS rn,
        |    CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS INT) AS rnk
        |  FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q12_frame_window" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q13_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q14_set_ops" ->
      """WITH a AS (SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000),
        |     b AS (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |SELECT 'union' AS op, custkey FROM (SELECT custkey FROM a UNION SELECT custkey FROM b)
        |UNION ALL
        |SELECT 'intersect' AS op, custkey FROM (SELECT custkey FROM a INTERSECT SELECT custkey FROM b)
        |UNION ALL
        |SELECT 'except' AS op, custkey FROM (SELECT custkey FROM a EXCEPT SELECT custkey FROM b)
        |ORDER BY op, custkey""".stripMargin,

    "q15_scalars" ->
      """SELECT o_orderkey,
        |  upper(o_orderpriority) AS pri_upper,
        |  lower(o_orderstatus) AS status_lower,
        |  substring(o_orderpriority, 1, 1) AS pri_code,
        |  o_orderstatus || '-' || o_orderpriority AS status_pri,
        |  (o_orderpriority LIKE '%URGENT%') AS is_urgent,
        |  CAST(length(o_orderpriority) AS INT) AS pri_len,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mon,
        |  CAST(datediff('day', DATE '1994-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
        |  floor(o_totalprice) AS price_floor,
        |  ceil(o_totalprice) AS price_ceil,
        |  abs(o_totalprice - 100000.0) AS price_dev,
        |  round(o_totalprice / 7.0, 2) AS price_div
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q16_array_json" ->
      """WITH toks AS (
        |  SELECT 'tok' AS op, p_partkey AS id, unnest(string_split(p_type, ' ')) AS val FROM part),
        |js AS (
        |  SELECT 'json' AS op, event_id AS id, json_extract_string(props, '$.k') AS val FROM events)
        |SELECT op, id, val FROM (SELECT * FROM toks UNION ALL SELECT * FROM js)
        |ORDER BY op, id, val""".stripMargin,

    "q17_latest_per_key" ->
      s"""WITH ev AS ($eventsUs)
         |SELECT user_id, event_id, ts, event_type, value FROM ev
         |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
         |ORDER BY user_id""".stripMargin,

    "q18_reference_query" ->
      s"""WITH changelog AS ($changelog),
         |latest AS (
         |  SELECT * FROM changelog
         |  QUALIFY row_number() OVER (PARTITION BY key ORDER BY seq DESC) = 1)
         |SELECT client, array_to_string(list_sort(list(DISTINCT key)), '|') AS nasdaq_position_ids
         |FROM latest
         |WHERE NOT tombstone AND exchange = 'NASDAQ'
         |GROUP BY client
         |ORDER BY client""".stripMargin,

    "q19_time_window" ->
      s"""WITH ev AS ($eventsUs)
         |SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start, event_type,
         |  COUNT(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM ev
         |GROUP BY 1, 2
         |ORDER BY 1, 2""".stripMargin,

    "q20_dedup" ->
      """SELECT user_id, event_type, MIN(event_id) AS first_event_id
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,

    "q21_cosine_topk" ->
      """WITH p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
        |s AS (
        |  SELECT vec_id,
        |    list_sum(list_transform(range(1, len(embedding) + 1),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(pe[i] AS DOUBLE))) AS dp,
        |    sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS na,
        |    sqrt(list_sum(list_transform(range(1, len(pe) + 1),
        |      i -> CAST(pe[i] AS DOUBLE) * CAST(pe[i] AS DOUBLE)))) AS nb
        |  FROM embeddings, p WHERE vec_id <> 0)
        |SELECT vec_id, round(dp / (na * nb), 6) AS sim FROM s
        |ORDER BY sim DESC, vec_id LIMIT 5""".stripMargin,

    "q22_top_tokens" ->
      """SELECT token, COUNT(*) AS cnt FROM (
        |  SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
        |WHERE token <> ''
        |GROUP BY token
        |ORDER BY cnt DESC, token LIMIT 20""".stripMargin,

    "q23_full_join" ->
      """SELECT COALESCE(c_custkey, o_custkey) AS custkey, c_name, n_orders,
        |  (c_custkey IS NULL) AS only_right, (o_custkey IS NULL) AS only_left
        |FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 = 0) c
        |FULL JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) o
        |  ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,

    "q24_right_join" ->
      """SELECT p_partkey, p_brand, n_items
        |FROM (SELECT l_partkey, COUNT(*) AS n_items FROM lineitem GROUP BY l_partkey) l
        |RIGHT JOIN part ON l_partkey = p_partkey
        |ORDER BY p_partkey""".stripMargin,

    "q25_range_join" ->
      """WITH bands(lo, hi, band) AS (VALUES
        |  (0, 100000, 'low'), (100000, 200000, 'mid'), (200000, 100000000, 'high'))
        |SELECT band, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band
        |ORDER BY band""".stripMargin,

    "q26_rank_funcs" ->
      """SELECT o_custkey, o_orderkey, rn, drk, quartile, prev_price, next_price FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(row_number() OVER w AS INT) AS rn,
        |    CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS INT) AS drk,
        |    CAST(ntile(4) OVER w AS INT) AS quartile,
        |    lag(o_totalprice, 1) OVER w AS prev_price,
        |    lead(o_totalprice, 1) OVER w AS next_price
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
        |WHERE rn <= 5
        |ORDER BY o_custkey, rn""".stripMargin,

    "q27_cube" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q28_setops_all" ->
      """WITH a AS (SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000),
        |     b AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |SELECT 'union_all' AS op, custkey FROM (SELECT custkey FROM a UNION ALL SELECT custkey FROM b)
        |UNION ALL
        |SELECT 'intersect_all' AS op, custkey FROM (SELECT custkey FROM a INTERSECT ALL SELECT custkey FROM b)
        |UNION ALL
        |SELECT 'except_all' AS op, custkey FROM (SELECT custkey FROM a EXCEPT ALL SELECT custkey FROM b)
        |ORDER BY op, custkey""".stripMargin,

    "q29_session_window" ->
      s"""WITH ev AS ($eventsUs),
         |x AS (
         |  SELECT user_id, ts,
         |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
         |         THEN 1 ELSE 0 END AS ns
         |  FROM ev),
         |y AS (
         |  SELECT user_id, ts,
         |    SUM(ns) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM x)
         |SELECT MIN(ts) AS session_start, user_id, COUNT(*) AS n
         |FROM y GROUP BY user_id, sid
         |ORDER BY user_id, session_start""".stripMargin,

    "q30_map_funcs" ->
      """SELECT event_id,
        |  CAST(m['k'][1] AS INT) AS k_val,
        |  CAST(cardinality(m) AS INT) AS m_size,
        |  map_keys(m)[1] AS first_key
        |FROM (SELECT event_id, map(['k'], [json_extract_string(props, '$.k')]) AS m FROM events)
        |ORDER BY event_id""".stripMargin,

    // Q31/Q42 bounded-tolerance sketch oracles: the Spark side emits the
    // EXACT value plus a within-tolerance boolean computed against its own
    // sketch (±10% HLL, ±2% GK — the suite-gated bounds); the oracle
    // recomputes the exact value and asserts the bound held (TRUE literal).
    // A sketch drifting out of tolerance fails the hash compare.
    "q31_approx_distinct" ->
      """SELECT o_orderpriority,
        |  count(DISTINCT o_custkey) AS exact_cust,
        |  TRUE AS within_10pct
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q32_grouping_sets" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,

    "q33_range_frame" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |    RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_within_1000,
        |  first_value(o_orderkey) OVER w AS cheapest_key,
        |  last_value(o_orderkey) OVER w AS dearest_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,

    "q35_percentiles" ->
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.25), 6) AS p25,
        |  round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
        |  round(quantile_cont(o_totalprice, 0.75), 6) AS p75,
        |  round(median(o_totalprice), 6) AS med
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q36_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (o_orderstatus = 'F') AS F_n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'F') AS DOUBLE) AS F_total,
        |  COUNT(*) FILTER (o_orderstatus = 'O') AS O_n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'O') AS DOUBLE) AS O_total,
        |  COUNT(*) FILTER (o_orderstatus = 'P') AS P_n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'P') AS DOUBLE) AS P_total
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q37_scalar_subquery" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(o_totalprice AS DOUBLE) AS o_totalprice,
        |  round((SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |         FROM orders o2 WHERE o2.o_custkey = orders.o_custkey), 6) AS cust_avg
        |FROM orders
        |WHERE o_totalprice > 300000
        |ORDER BY o_orderkey""".stripMargin,

    "q38_exists_subquery" ->
      """SELECT 'has_urgent' AS op, c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |UNION ALL
        |SELECT 'no_orders' AS op, c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY op, c_custkey""".stripMargin,

    "q39_recursive_cte" ->
      """WITH RECURSIVE b(bucket) AS (
        |  SELECT 0
        |  UNION ALL SELECT bucket + 1 FROM b WHERE bucket < 9)
        |SELECT bucket, COUNT(o_orderkey) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM b LEFT JOIN orders
        |  ON CAST(floor(o_totalprice / 60000) AS INT) = bucket
        |GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q40_gapfill" ->
      s"""WITH ev AS ($eventsUs),
         |b AS (SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1 FROM ev),
         |spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour_start FROM b),
         |agg AS (
         |  SELECT date_trunc('hour', ts) AS hour_start, COUNT(*) AS n,
         |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |  FROM ev WHERE event_type = 'purchase' GROUP BY 1)
         |SELECT CAST(spine.hour_start AS TIMESTAMP) AS hour_start,
         |  COALESCE(n, 0) AS n, COALESCE(sum_value, 0.0) AS sum_value
         |FROM spine LEFT JOIN agg ON agg.hour_start = spine.hour_start
         |ORDER BY hour_start""".stripMargin,

    "q41_sliding_window" ->
      s"""WITH ev AS ($eventsUs),
         |e2 AS (SELECT date_trunc('hour', ts) AS h, event_type, value FROM ev),
         |w AS (
         |  SELECT CAST(h AS TIMESTAMP) AS win_start, event_type, value FROM e2
         |  UNION ALL
         |  SELECT CAST(h - INTERVAL 1 HOUR AS TIMESTAMP), event_type, value FROM e2)
         |SELECT win_start, event_type, COUNT(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q34_array_funcs" ->
      """SELECT p_partkey,
        |  COALESCE(array_to_string(list_sort(list_distinct(list_concat(string_split(p_type, ' '), string_split(p_brand, '#')))), '|'), '') AS union_w,
        |  COALESCE(array_to_string(list_sort(list_filter(list_distinct(string_split(p_type, ' ')),
        |    w -> w != 'PROMO' AND w != 'STANDARD')), '|'), '') AS minus_w,
        |  list_contains(string_split(p_type, ' '), 'BRUSHED') AS has_brushed,
        |  COALESCE(array_to_string(list_slice(list_sort(string_split(p_type, ' ')), 1, 2), '|'), '') AS first_two,
        |  CAST(len(string_split(p_type, ' ')) AS INT) AS n_words
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q42_approx_percentile" ->
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.25), 6) AS p25,
        |  round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
        |  round(quantile_cont(o_totalprice, 0.75), 6) AS p75,
        |  TRUE AS within_2pct
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q43_lateral_join" ->
      """SELECT c.o_custkey, t.o_orderkey, t.o_totalprice
        |FROM (SELECT DISTINCT o_custkey FROM orders WHERE o_custkey < 20) c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
        |         WHERE o.o_custkey = c.o_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c.o_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin,

    "q44_unpivot" ->
      """WITH w AS (
        |  SELECT l_returnflag,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |    CAST(COUNT(*) AS DOUBLE) AS n_rows
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
        |UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM w
        |UNION ALL SELECT l_returnflag, 'n_rows', n_rows FROM w
        |ORDER BY l_returnflag, metric""".stripMargin,

    "q45_listagg" ->
      """SELECT p_brand,
        |  string_agg(p_type, '|' ORDER BY p_type) AS types,
        |  COUNT(p_type) AS n_types
        |FROM (SELECT DISTINCT p_brand, p_type FROM part)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    // exact integer moments (hundredths quantization, HUGEINT-exact sums),
    // then the same double formula both engines — see q46StatAggs scaladoc
    "q46_stat_aggs" ->
      """WITH q AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS qx,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS ey
        |  FROM lineitem),
        |m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(qx) AS DOUBLE) AS sx, CAST(SUM(ey) AS DOUBLE) AS sy,
        |    CAST(SUM(qx * qx) AS DOUBLE) AS sxx,
        |    CAST(SUM(ey * ey) AS DOUBLE) AS syy,
        |    CAST(SUM(qx * ey) AS DOUBLE) AS sxy
        |  FROM q GROUP BY l_returnflag)
        |SELECT l_returnflag, n AS n_rows,
        |  round((CAST(n AS DOUBLE) * sxy - sx * sy) /
        |    (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) *
        |     sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS corr_qty_price,
        |  round((CAST(n AS DOUBLE) * sxy - sx * sy) /
        |    (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 10000.0, 4) AS covar_pop_qty_price,
        |  round(sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) /
        |    CAST(n AS DOUBLE) / 100.0, 6) AS stddev_pop_qty,
        |  round(sqrt(CAST(n AS DOUBLE) * syy - sy * sy) /
        |    CAST(n AS DOUBLE) / 100.0, 4) AS stddev_pop_price
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "q47_datetime" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
        |  CAST(MIN(year(o_orderdate)) AS INT) AS yr,
        |  CAST(MIN(quarter(o_orderdate)) AS INT) AS qtr,
        |  COUNT(*) AS n_orders,
        |  COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS n_active_days,
        |  CAST(datediff('day', MIN(CAST(o_orderdate AS DATE)),
        |                 MAX(CAST(o_orderdate AS DATE))) AS INT) AS span_days,
        |  MAX(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY)::DATE AS max_plus_30,
        |  MIN(last_day(CAST(o_orderdate AS DATE))) AS month_end
        |FROM orders GROUP BY mon ORDER BY mon""".stripMargin,

    "q48_strings" ->
      """SELECT p_partkey,
        |  CAST(length(p_name) AS INT) AS name_len,
        |  CAST(levenshtein(p_type, 'STANDARD BRUSHED STEEL') AS INT) AS type_dist,
        |  split_part(p_type, ' ', 1) AS type_head,
        |  reverse(p_brand) AS brand_rev,
        |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
        |  CAST(strpos(p_name, 's') AS INT) AS first_s,
        |  translate(p_brand, '#', '-') AS brand_clean,
        |  upper(substring(p_name, 1, 5)) AS name_head
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q49_cond_bitwise" ->
      """SELECT l_returnflag,
        |  COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_disc,
        |  COUNT(CASE WHEN l_tax = 0 THEN 1 END) AS n_notax,
        |  CAST(SUM(CASE WHEN l_quantity > 25
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_heavy,
        |  bit_and(l_linenumber) AS ln_and,
        |  bit_or(l_linenumber) AS ln_or,
        |  bit_xor(l_orderkey) AS key_xor,
        |  bool_and(l_quantity > 0) AS all_positive,
        |  bool_or(l_discount > 0.09) AS any_deep_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
