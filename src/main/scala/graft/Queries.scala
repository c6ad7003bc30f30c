package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{Vectors => VecF}
import graft.operators.{LatestPerKey, ShareHolders}
import graft.sources.Tables

/** The declared relational query surface (SURVEY.md §2.B, Q1–Q22).
  *
  * Every query here has a DuckDB oracle in [[OracleSql]]; the driver compares
  * row-for-row after a total ORDER BY, so every query ends in one and every
  * computed column is aliased identically on both sides.
  *
  * Float determinism: monetary/quantity doubles carry exactly 2 decimals, so
  * SUMs go through DECIMAL(18, s) (exact integer-scaled arithmetic, identical
  * in Spark and DuckDB) and are cast back to DOUBLE for a stable schema.
  */
object Queries {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def dec2(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  // ---------------------------------------------------------------- Q1
  /** scan + filter + project; predicate and column pruning reach the scan. */
  def q1FilterProject(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1995-07-01").cast("timestamp"))
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  // ---------------------------------------------------------------- Q2
  /** TPC-H Q1-shaped hash aggregate; partial+final agg from Catalyst. */
  def q2Agg(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 6))).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .withColumn("avg_price", col("sum_base_price") / col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  // ---------------------------------------------------------------- Q3
  /** inner equi-join + agg (orders ⋈ customer). */
  def q3Join(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        sum(dec2(col("o_totalprice"))).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")

  // ---------------------------------------------------------------- Q4
  /** broadcast join: part is a small dim — ship it to every executor. */
  def q4BroadcastJoin(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .join(broadcast(T(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")

  // ---------------------------------------------------------------- Q5
  /** left outer join keeping customers with zero orders. */
  def q5LeftJoin(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "customer")
      .join(T(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("order_count"))
      .orderBy("c_custkey")

  // ---------------------------------------------------------------- Q6/Q7
  def q6SemiJoin(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "customer")
      .join(T(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Anti join whose anti side is non-empty by construction: every fixture
    * customer has SOME order, so the build side is restricted to urgent
    * orders — customers who never placed one survive the anti join
    * (203 of 1500 at sf0.01). */
  def q7AntiJoin(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "customer")
      .join(T(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  // ---------------------------------------------------------------- Q8
  /** multi-way join region ⋈ nation ⋈ customer ⋈ orders; small dims broadcast. */
  def q8MultiJoin(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(T(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(T(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(dec2(col("o_totalprice"))).cast("double").as("total"),
        count(lit(1)).as("n"))
      .orderBy("r_name", "n_name")

  // ---------------------------------------------------------------- Q9
  /** exact distinct aggregation. */
  def q9Distinct(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"))
      .orderBy("o_orderpriority")

  // ---------------------------------------------------------------- Q10
  /** rollup with grouping indicators; NULL group cells coalesced to 'ALL' so
    * ordering is identical across engines (Spark: NULLS FIRST, DuckDB: LAST).
    */
  def q10Rollup(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "customer")
      .join(broadcast(T(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_cust"),
        sum(dec2(col("c_acctbal"))).cast("double").as("sum_bal"),
        grouping(col("n_name")).cast("int").as("g_nation"),
        grouping(col("c_mktsegment")).cast("int").as("g_segment"))
      .select(
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
        col("g_nation"), col("g_segment"), col("n_cust"), col("sum_bal"))
      .orderBy("nation", "segment")

  // ---------------------------------------------------------------- Q11
  /** ranking window functions (row_number fully tie-broken for determinism). */
  def q11RankWindow(s: SparkSession, dir: String): DataFrame = {
    val wRn = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val wRk = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
    T(s, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(wRn).as("rn"),
        rank().over(wRk).as("rnk"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  // ---------------------------------------------------------------- Q12
  /** frame window: running total (exact via decimal accumulation). */
  def q12FrameWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    T(s, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        sum(dec2(col("o_totalprice"))).over(w).cast("double").as("running_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  // ---------------------------------------------------------------- Q13
  /** top-k: Catalyst plans TakeOrderedAndProject — no full sort at scale. */
  def q13TopK(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  // ---------------------------------------------------------------- Q14
  /** set ops: UNION / INTERSECT / EXCEPT (distinct semantics), tagged. */
  def q14SetOps(s: SparkSession, dir: String): DataFrame = {
    val a = T(s, dir, "orders").filter(col("o_totalprice") > 150000)
      .select(col("o_custkey").as("custkey"))
    val b = T(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val u = a.union(b).distinct().withColumn("op", lit("union"))
    val i = a.intersect(b).withColumn("op", lit("intersect"))
    val e = a.except(b).withColumn("op", lit("except"))
    u.union(i).union(e).select("op", "custkey").orderBy("op", "custkey")
  }

  // ---------------------------------------------------------------- Q15
  /** scalar function sweep: string / date / math. */
  def q15Scalars(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .select(
        col("o_orderkey"),
        upper(col("o_orderpriority")).as("pri_upper"),
        lower(col("o_orderstatus")).as("status_lower"),
        substring(col("o_orderpriority"), 1, 1).as("pri_code"),
        concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("status_pri"),
        col("o_orderpriority").like("%URGENT%").as("is_urgent"),
        length(col("o_orderpriority")).as("pri_len"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mon"),
        datediff(col("o_orderdate"), lit("1994-01-01").cast("date")).as("days_since"),
        floor(col("o_totalprice")).cast("double").as("price_floor"),
        ceil(col("o_totalprice")).cast("double").as("price_ceil"),
        abs(col("o_totalprice") - lit(100000.0)).as("price_dev"),
        round(col("o_totalprice") / lit(7.0), 2).as("price_div"))
      .orderBy("o_orderkey")

  // ---------------------------------------------------------------- Q16
  /** array explode (split p_type) + JSON extraction (events.props), tagged. */
  def q16ArrayJson(s: SparkSession, dir: String): DataFrame = {
    val tok = T(s, dir, "part").select(
      lit("tok").as("op"),
      col("p_partkey").as("id"),
      explode(split(col("p_type"), " ")).as("val"))
    val js = T(s, dir, "events").select(
      lit("json").as("op"),
      col("event_id").as("id"),
      get_json_object(col("props"), "$.k").as("val"))
    tok.union(js).orderBy("op", "id", "val")
  }

  // ---------------------------------------------------------------- Q17
  /** latest-per-key (batch upsert view; operator #1's batch analog). */
  def q17LatestPerKey(s: SparkSession, dir: String): DataFrame =
    LatestPerKey(
      // project before the aggregate: unused payload (props) would otherwise
      // ride through the max_by struct buffer and the shuffle
      T(s, dir, "events").select("user_id", "event_id", "ts", "event_type", "value"),
      keys = Seq("user_id"), ordering = Seq("ts", "event_id"))
      .select("user_id", "event_id", "ts", "event_type", "value")
      .orderBy("user_id")

  // ---------------------------------------------------------------- Q18
  /** THE reference query (kafka_streams.clj:60-81), batch analog over the
    * synthetic changelog derived from `events` (Tables.shareHoldersChangelog).
    */
  def q18ReferenceQuery(s: SparkSession, dir: String): DataFrame =
    ShareHolders.nasdaqPositionsByClient(Tables.shareHoldersChangelog(s, dir))
      // declared-surface encoding: the driver's comparator needs scalar cells,
      // so the position-id set is emitted '|'-joined (already sorted+distinct)
      .withColumn("nasdaq_position_ids", array_join(col("nasdaq_position_ids"), "|"))

  // ---------------------------------------------------------------- Q19
  /** tumbling 1-hour time-window aggregation (batch form of window()). */
  def q19TimeWindow(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast("double").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("hour_start", "event_type")

  // ---------------------------------------------------------------- Q20
  /** deterministic dedup: keep min event_id per (user_id, event_type). */
  def q20Dedup(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("event_id")).as("first_event_id"))
      .orderBy("user_id", "event_type")

  // ---------------------------------------------------------------- Q21
  /** brute-force cosine top-k vs the probe vector (vec_id = 0). */
  def q21CosineTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = T(s, dir, "embeddings")
    val probe = broadcast(emb.filter(col("vec_id") === 0).select(col("embedding").as("probe")))
    emb.filter(col("vec_id") =!= 0)
      .crossJoin(probe)
      .withColumn("sim", round(VecF.cosine(col("embedding"), col("probe")), 6))
      .select("vec_id", "sim")
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(5)
  }

  // ---------------------------------------------------------------- Q22
  /** text analysis: lowercase-tokenize, top-20 token counts. */
  def q22TopTokens(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .select(explode(split(lower(col("text")), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(20)

  // ---------------------------------------------------------------- Q23
  /** full outer join (both unmatched sides preserved). */
  def q23FullJoin(s: SparkSession, dir: String): DataFrame = {
    val c = T(s, dir, "customer").filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey"), col("c_name"))
    val o = T(s, dir, "orders").groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_name"), col("n_orders"),
        col("c_custkey").isNull.as("only_right"),
        col("o_custkey").isNull.as("only_left"))
      .orderBy("custkey")
  }

  // ---------------------------------------------------------------- Q24
  /** right outer join (dimension side preserved). */
  def q24RightJoin(s: SparkSession, dir: String): DataFrame = {
    val l = T(s, dir, "lineitem").groupBy(col("l_partkey")).agg(count(lit(1)).as("n_items"))
    l.join(T(s, dir, "part"), col("l_partkey") === col("p_partkey"), "right")
      .select(col("p_partkey"), col("p_brand"), col("n_items"))
      .orderBy("p_partkey")
  }

  // ---------------------------------------------------------------- Q25
  /** range (theta) join against a broadcast band dimension. */
  def q25RangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = Seq((0, 100000, "low"), (100000, 200000, "mid"), (200000, 100000000, "high"))
      .toDF("lo", "hi", "band")
    T(s, dir, "orders")
      .join(broadcast(bands), col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("band"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec2(col("o_totalprice"))).cast("double").as("total"))
      .orderBy("band")
  }

  // ---------------------------------------------------------------- Q26
  /** dense_rank / ntile / lag / lead window sweep. */
  def q26RankFuncs(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val wDate = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
    T(s, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("rn"),
        dense_rank().over(wDate).as("drk"),
        ntile(4).over(w).as("quartile"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"))
      .filter(col("rn") <= 5)
      .orderBy("o_custkey", "rn")
  }

  // ---------------------------------------------------------------- Q27
  /** cube with grouping indicators (q10 is rollup). */
  def q27Cube(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec2(col("o_totalprice"))).cast("double").as("total"),
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("o_orderpriority")).cast("int").as("g_pri"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("g_status"), col("g_pri"), col("n"), col("total"))
      .orderBy("status", "priority")

  // ---------------------------------------------------------------- Q28
  /** multiset set ops: UNION ALL / INTERSECT ALL / EXCEPT ALL, tagged. */
  def q28SetOpsAll(s: SparkSession, dir: String): DataFrame = {
    val o = T(s, dir, "orders")
    val a = o.filter(col("o_totalprice") > 150000).select(col("o_custkey").as("custkey"))
    val b = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("custkey"))
    a.union(b).withColumn("op", lit("union_all"))
      .union(a.intersectAll(b).withColumn("op", lit("intersect_all")))
      .union(a.exceptAll(b).withColumn("op", lit("except_all")))
      .select("op", "custkey")
      .orderBy("op", "custkey")
  }

  // ---------------------------------------------------------------- Q29
  /** session windows (30-minute gap), batch form of session_window(). */
  def q29SessionWindow(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"), col("user_id"), col("n"))
      .orderBy("user_id", "session_start")

  // ---------------------------------------------------------------- Q30
  /** map-typed column functions: build, extract, keys, size. */
  def q30MapFuncs(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "events")
      .select(
        col("event_id"),
        map(lit("k"), get_json_object(col("props"), "$.k")).as("m"))
      .select(
        col("event_id"),
        element_at(col("m"), "k").cast("int").as("k_val"),
        size(col("m")).as("m_size"),
        element_at(map_keys(col("m")), 1).as("first_key"))
      .orderBy("event_id")

  // ---------------------------------------------------------------- Q31
  /** approx_count_distinct (HLL++). The sketch value is engine-specific so
    * it can never hash-match another engine; instead the query emits the
    * EXACT distinct count plus a `within_10pct` bound computed Spark-side
    * (|approx − exact| ≤ 10% · exact, the suite-gated HLL tolerance). The
    * DuckDB oracle recomputes the exact count and asserts the bound holds
    * (`TRUE AS within_10pct`), so a sketch drifting out of tolerance now
    * fails the driver's hash compare instead of hiding behind a rows-only
    * check.
    */
  def q31ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        approx_count_distinct(col("o_custkey")).as("approx_cust"),
        countDistinct(col("o_custkey")).as("exact_cust"))
      .select(
        col("o_orderpriority"), col("exact_cust"),
        (abs(col("approx_cust") - col("exact_cust"))
          <= col("exact_cust") * lit(0.10)).as("within_10pct"))
      .orderBy("o_orderpriority")

  // ---------------------------------------------------------------- Q32
  /** explicit GROUPING SETS (beyond rollup/cube) via SQL. */
  def q32GroupingSets(s: SparkSession, dir: String): DataFrame = {
    T(s, dir, "orders").createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin)
  }

  // ---------------------------------------------------------------- Q33
  /** range-based window frame + first/last value over an explicit frame. */
  def q33RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val byPrice = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"))
    val near = byPrice.rangeBetween(-1000L, 0L)
    val wholePartition = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    T(s, dir, "orders")
      .select(
        col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        count(lit(1)).over(near).as("n_within_1000"),
        first(col("o_orderkey")).over(wholePartition).as("cheapest_key"),
        last(col("o_orderkey")).over(wholePartition).as("dearest_key"))
      .orderBy("o_orderkey")
  }

  // ---------------------------------------------------------------- Q34
  /** array function sweep: union/except/contains/slice over token arrays.
    * Array results are '|'-joined at the declared surface (sorted first, so
    * the encoding is deterministic) — the driver comparator needs scalar cells.
    */
  def q34ArrayFuncs(s: SparkSession, dir: String): DataFrame = {
    val words = split(col("p_type"), " ")
    val brandWords = split(col("p_brand"), "#")
    T(s, dir, "part")
      .select(
        col("p_partkey"),
        array_join(sort_array(array_union(words, brandWords)), "|").as("union_w"),
        array_join(sort_array(array_except(words, array(lit("PROMO"), lit("STANDARD")))), "|").as("minus_w"),
        array_contains(words, "BRUSHED").as("has_brushed"),
        array_join(slice(sort_array(words), 1, 2), "|").as("first_two"),
        size(words).as("n_words"))
      .orderBy("p_partkey")
  }

  // ---------------------------------------------------------------- Q35
  /** exact interpolated percentiles + median (order statistics; both engines
    * use the (1-g)*lo + g*hi interpolation, so values are bit-comparable
    * after rounding).
    */
  def q35Percentiles(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(o_totalprice, 0.25)"), 6).as("p25"),
        round(expr("percentile(o_totalprice, 0.5)"), 6).as("p50"),
        round(expr("percentile(o_totalprice, 0.75)"), 6).as("p75"),
        round(expr("median(o_totalprice)"), 6).as("med"))
      .orderBy("o_orderpriority")

  // ---------------------------------------------------------------- Q36
  /** pivot: order counts and totals per priority, pivoted by status (explicit
    * value list => static schema, identical column names in the oracle).
    */
  def q36Pivot(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec2(col("o_totalprice"))).cast("double").as("total"))
      .na.fill(0L, Seq("F_n", "O_n", "P_n"))
      .orderBy("o_orderpriority")

  // ---------------------------------------------------------------- Q37
  /** correlated scalar subquery: each order vs its customer's average
    * (Catalyst rewrites the subquery to an aggregate + join — no per-row
    * re-execution).
    */
  def q37ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    T(s, dir, "orders").createOrReplaceTempView("orders_ssq")
    s.sql(
      """SELECT o_orderkey, o_custkey,
        |  CAST(o_totalprice AS DOUBLE) AS o_totalprice,
        |  round((SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |         FROM orders_ssq o2 WHERE o2.o_custkey = orders_ssq.o_custkey), 6) AS cust_avg
        |FROM orders_ssq
        |WHERE o_totalprice > 300000
        |ORDER BY o_orderkey""".stripMargin)
  }

  // ---------------------------------------------------------------- Q38
  /** EXISTS / NOT EXISTS subqueries (rewritten to semi/anti joins), tagged. */
  def q38ExistsSubquery(s: SparkSession, dir: String): DataFrame = {
    T(s, dir, "customer").createOrReplaceTempView("customer_esq")
    T(s, dir, "orders").createOrReplaceTempView("orders_esq")
    s.sql(
      """SELECT 'has_urgent' AS op, c_custkey FROM customer_esq
        |WHERE EXISTS (SELECT 1 FROM orders_esq
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |UNION ALL
        |SELECT 'no_orders' AS op, c_custkey FROM customer_esq
        |WHERE NOT EXISTS (SELECT 1 FROM orders_esq WHERE o_custkey = c_custkey)
        |ORDER BY op, c_custkey""".stripMargin)
  }

  // ---------------------------------------------------------------- Q39
  /** recursive CTE (Spark 4.x WITH RECURSIVE): generate price buckets
    * recursively, left-join order totals per bucket (empty buckets kept).
    */
  def q39RecursiveCte(s: SparkSession, dir: String): DataFrame = {
    T(s, dir, "orders").createOrReplaceTempView("orders_rec")
    s.sql(
      """WITH RECURSIVE b(bucket) AS (
        |  SELECT 0
        |  UNION ALL SELECT bucket + 1 FROM b WHERE bucket < 9)
        |SELECT bucket, COUNT(o_orderkey) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM b LEFT JOIN orders_rec
        |  ON CAST(floor(o_totalprice / 60000) AS INT) = bucket
        |GROUP BY bucket ORDER BY bucket""".stripMargin)
  }

  // ---------------------------------------------------------------- Q40
  /** time-bucket resample with gap-fill: hourly counts/sums over a sparse
    * event subset, with EVERY hour between the corpus min and max present
    * (missing hours as zero rows) — the sequence + left-join spine idiom.
    * The spine explodes from a one-row bounds aggregate (broadcast side),
    * so no driver-side range materialization; the fact side keeps its
    * partial+final hash aggregation.
    */
  def q40Gapfill(s: SparkSession, dir: String): DataFrame = {
    val ev = T(s, dir, "events")
    val hours = ev
      .agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour_start"))
    val agg = ev.filter(col("event_type") === "purchase")
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"))
      .agg(count(lit(1)).as("n"), sum(dec2(col("value"))).cast("double").as("sum_value"))
    hours.join(agg, Seq("hour_start"), "left")
      .select(col("hour_start"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .orderBy("hour_start")
  }

  // ---------------------------------------------------------------- Q41
  /** hopping (sliding) time windows in batch form: 2-hour windows sliding by
    * 1 hour — every event lands in exactly two windows. Spark's `window()`
    * explodes the assignment; the aggregation stays partial+final.
    */
  def q41SlidingWindow(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "events")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast("double").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("win_start", "event_type")

  // ---------------------------------------------------------------- Q42
  /** approx percentiles (GK sketch): the scale path for Q35 — exact
    * percentiles sort every group; the sketch is one pass, merges map-side,
    * and holds O(accuracy) memory per group regardless of group size. Sketch
    * internals are engine-specific, so (like Q31's HLL) the oracle check is
    * bounded-tolerance: exact percentiles + a within_2pct boolean asserted
    * TRUE by DuckDB; `OperatorSpec` also gates against Q35's exact values.
    */
  def q42ApproxPercentile(s: SparkSession, dir: String): DataFrame = {
    // GK-sketch quantiles vs the exact interpolated percentiles. Like Q31,
    // the sketch output is engine-specific: the emitted columns are the
    // EXACT percentiles (hash-comparable against DuckDB quantile_cont)
    // plus `within_2pct` — every GK estimate within 2% of exact, computed
    // Spark-side and asserted TRUE by the oracle.
    val within = (i: Int, exact: Column) =>
      abs(col("aps")(i) - exact) <= abs(exact) * lit(0.02)
    T(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("approx_percentile(o_totalprice, array(0.25, 0.5, 0.75), 10000)").as("aps"),
        expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))").as("eps"))
      .select(col("o_orderpriority"),
        round(col("eps")(0), 6).as("p25"),
        round(col("eps")(1), 6).as("p50"),
        round(col("eps")(2), 6).as("p75"),
        (within(0, col("eps")(0)) && within(1, col("eps")(1))
          && within(2, col("eps")(2))).as("within_2pct"))
      .orderBy("o_orderpriority")
  }

  // ---------------------------------------------------------------- Q43
  /** LATERAL join: per-customer top-2 orders via a correlated lateral
    * subquery with ORDER BY + LIMIT. Catalyst decorrelates this to a
    * window/limit over the joined side — no per-outer-row re-execution —
    * which is what makes the construct usable at scale (the naive
    * interpretation is a nested loop over every customer).
    */
  def q43LateralJoin(s: SparkSession, dir: String): DataFrame = {
    T(s, dir, "orders").createOrReplaceTempView("orders_lat")
    s.sql(
      """SELECT c.o_custkey, t.o_orderkey, t.o_totalprice
        |FROM (SELECT DISTINCT o_custkey FROM orders_lat WHERE o_custkey < 20) c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders_lat o
        |         WHERE o.o_custkey = c.o_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c.o_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin)
  }

  // ---------------------------------------------------------------- Q44
  /** UNPIVOT (wide → long): a wide per-flag aggregate melted into
    * (flag, metric, value) rows. The unpivot itself is a narrow generator —
    * no shuffle beyond the aggregation that produced the wide frame.
    */
  def q44Unpivot(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_price"),
        count(lit(1)).cast("double").as("n_rows"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("n_rows")),
        "metric", "value")
      .orderBy("l_returnflag", "metric")

  // ---------------------------------------------------------------- Q45
  /** LISTAGG (ordered string aggregation): distinct part types per brand,
    * '|'-joined in lexical order. Duplicate elimination plus the WITHIN
    * GROUP order make the result deterministic across engines.
    */
  def q45Listagg(s: SparkSession, dir: String): DataFrame = {
    // SQL form: WITHIN GROUP only parses as part of a SQL aggregate call
    // (the expr()-inside-agg() form miscasts the sort key in Spark 4.1).
    // Dedup happens in a subquery, NOT via listagg(DISTINCT ...): Spark
    // 4.1's DISTINCT-listagg codepath throws ClassCastException
    // (AttributeReference -> SortOrder) when the aggregate is executed
    // through an Exchange (exactly the parquet-write path the driver
    // runs) — the plain listagg over pre-distinct rows is equivalent.
    T(s, dir, "part").createOrReplaceTempView("part_la")
    s.sql(
      """SELECT p_brand,
        |  listagg(p_type, '|') WITHIN GROUP (ORDER BY p_type) AS types,
        |  COUNT(p_type) AS n_types
        |FROM (SELECT DISTINCT p_brand, p_type FROM part_la)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin)
  }

  // ---------------------------------------------------------------- Q46
  /** Statistical aggregates (corr / covariance / stddev) per group, computed
    * from EXACT integer moments: both inputs are quantized to integer
    * hundredths (exact for the fixture's 2-dp money values), the five sums
    * accumulate as DECIMAL(38,0) (order-independent, overflow-proof), and
    * the moments formula runs in double on those exact components — so the
    * result is bit-identical across engines, which `corr()`/`stddev()`
    * built-ins (order-dependent float accumulation) can't promise.
    */
  def q46StatAggs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val li = T(s, dir, "lineitem")
    val d380 = DecimalType(38, 0)
    val qx = round(col("l_quantity") * 100).cast("long")
    val ey = round(col("l_extendedprice") * 100).cast("long")
    val g = li
      .select(col("l_returnflag"), qx.as("qx"), ey.as("ey"))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(col("qx").cast(d380)).as("sx"),
        sum(col("ey").cast(d380)).as("sy"),
        sum((col("qx") * col("qx")).cast(d380)).as("sxx"),
        sum((col("ey") * col("ey")).cast(d380)).as("syy"),
        sum((col("qx") * col("ey")).cast(d380)).as("sxy"))
    val (n, sx, sy, sxx, syy, sxy) = (
      col("n").cast("double"), col("sx").cast("double"), col("sy").cast("double"),
      col("sxx").cast("double"), col("syy").cast("double"), col("sxy").cast("double"))
    g.select(
      col("l_returnflag"),
      col("n").as("n_rows"),
      round((n * sxy - sx * sy) /
        (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6).as("corr_qty_price"),
      round((n * sxy - sx * sy) / (n * n) / 10000.0, 4).as("covar_pop_qty_price"),
      round(sqrt(n * sxx - sx * sx) / n / 100.0, 6).as("stddev_pop_qty"),
      round(sqrt(n * syy - sy * sy) / n / 100.0, 4).as("stddev_pop_price"))
      .orderBy("l_returnflag")
  }

  // ---------------------------------------------------------------- Q47
  /** Calendar arithmetic: month truncation, part extraction, interval
    * shifts, and day differences — the time-dimension toolkit, aggregated
    * per order month.
    */
  def q47Datetime(s: SparkSession, dir: String): DataFrame = {
    val o = T(s, dir, "orders")
    o.select(
      date_trunc("month", col("o_orderdate")).cast("date").as("mon"),
      col("o_orderdate").cast("date").as("d"),
      year(col("o_orderdate")).as("yr"),
      quarter(col("o_orderdate")).as("qtr"))
      .groupBy("mon")
      .agg(
        first(col("yr")).as("yr"),
        first(col("qtr")).as("qtr"),
        count(lit(1)).as("n_orders"),
        countDistinct(col("d")).as("n_active_days"),
        datediff(max(col("d")), min(col("d"))).as("span_days"),
        max(date_add(col("d"), 30)).as("max_plus_30"),
        min(last_day(col("d"))).as("month_end"))
      .orderBy("mon")
  }

  // ---------------------------------------------------------------- Q48
  /** String toolkit over part names/types: edit distance, split_part,
    * translate, padding, search position — per-row, fully codegen'd.
    */
  def q48Strings(s: SparkSession, dir: String): DataFrame = {
    val p = T(s, dir, "part")
    p.select(
      col("p_partkey"),
      length(col("p_name")).as("name_len"),
      levenshtein(col("p_type"), lit("STANDARD BRUSHED STEEL")).as("type_dist"),
      split(col("p_type"), " ").getItem(0).as("type_head"),
      reverse(col("p_brand")).as("brand_rev"),
      lpad(col("p_partkey").cast("string"), 8, "0").as("key_padded"),
      instr(col("p_name"), "s").as("first_s"),
      translate(col("p_brand"), "#", "-").as("brand_clean"),
      upper(substring(col("p_name"), 1, 5)).as("name_head"))
      .orderBy("p_partkey")
  }

  // ---------------------------------------------------------------- Q49
  /** Conditional + bitwise aggregation: FILTER-style conditional counts/
    * sums, bit_and/or/xor aggregates (order-independent by construction),
    * and boolean aggregates, per return flag.
    */
  def q49CondBitwise(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val li = T(s, dir, "lineitem")
    li.groupBy("l_returnflag")
      .agg(
        count(when(col("l_discount") > 0.05, 1)).as("n_disc"),
        count(when(col("l_tax") === 0, 1)).as("n_notax"),
        sum(when(col("l_quantity") > 25,
          col("l_quantity").cast(DecimalType(18, 2)))).cast("double").as("qty_heavy"),
        bit_and(col("l_linenumber")).as("ln_and"),
        bit_or(col("l_linenumber")).as("ln_or"),
        bit_xor(col("l_orderkey")).as("key_xor"),
        bool_and(col("l_quantity") > 0).as("all_positive"),
        bool_or(col("l_discount") > 0.09).as("any_deep_disc"))
      .orderBy("l_returnflag")
  }

  /** Core relational surface, keyed by SURVEY.md §2.B query id. */
  val core: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_filter_project" -> (q1FilterProject _),
    "q2_agg" -> (q2Agg _),
    "q3_join_agg" -> (q3Join _),
    "q4_broadcast_join" -> (q4BroadcastJoin _),
    "q5_left_join" -> (q5LeftJoin _),
    "q6_semi_join" -> (q6SemiJoin _),
    "q7_anti_join" -> (q7AntiJoin _),
    "q8_multi_join" -> (q8MultiJoin _),
    "q9_count_distinct" -> (q9Distinct _),
    "q10_rollup" -> (q10Rollup _),
    "q11_rank_window" -> (q11RankWindow _),
    "q12_frame_window" -> (q12FrameWindow _),
    "q13_topk" -> (q13TopK _),
    "q14_set_ops" -> (q14SetOps _),
    "q15_scalars" -> (q15Scalars _),
    "q16_array_json" -> (q16ArrayJson _),
    "q17_latest_per_key" -> (q17LatestPerKey _),
    "q18_reference_query" -> (q18ReferenceQuery _),
    "q19_time_window" -> (q19TimeWindow _),
    "q20_dedup" -> (q20Dedup _),
    "q21_cosine_topk" -> (q21CosineTopK _),
    "q22_top_tokens" -> (q22TopTokens _),
    "q23_full_join" -> (q23FullJoin _),
    "q24_right_join" -> (q24RightJoin _),
    "q25_range_join" -> (q25RangeJoin _),
    "q26_rank_funcs" -> (q26RankFuncs _),
    "q27_cube" -> (q27Cube _),
    "q28_setops_all" -> (q28SetOpsAll _),
    "q29_session_window" -> (q29SessionWindow _),
    "q30_map_funcs" -> (q30MapFuncs _),
    "q31_approx_distinct" -> (q31ApproxDistinct _),
    "q32_grouping_sets" -> (q32GroupingSets _),
    "q33_range_frame" -> (q33RangeFrame _),
    "q34_array_funcs" -> (q34ArrayFuncs _),
    "q35_percentiles" -> (q35Percentiles _),
    "q36_pivot" -> (q36Pivot _),
    "q37_scalar_subquery" -> (q37ScalarSubquery _),
    "q38_exists_subquery" -> (q38ExistsSubquery _),
    "q39_recursive_cte" -> (q39RecursiveCte _),
    "q40_gapfill" -> (q40Gapfill _),
    "q41_sliding_window" -> (q41SlidingWindow _),
    "q42_approx_percentile" -> (q42ApproxPercentile _),
    "q43_lateral_join" -> (q43LateralJoin _),
    "q44_unpivot" -> (q44Unpivot _),
    "q45_listagg" -> (q45Listagg _),
    "q46_stat_aggs" -> (q46StatAggs _),
    "q47_datetime" -> (q47Datetime _),
    "q48_strings" -> (q48Strings _),
    "q49_cond_bitwise" -> (q49CondBitwise _)
  )
}
