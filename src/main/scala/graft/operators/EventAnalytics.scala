package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-stream analytics over the changelog/event surface — the classic
  * product-analytics operators (ordered funnels, cohort retention) that sit
  * beside the reference's keyed-state semantics (`kafka_streams.clj:60-81`
  * models per-key latest state; these model per-user event SEQUENCE
  * structure). Both are deterministic integer reports with exact DuckDB
  * oracles.
  */
object EventAnalytics {

  /** Ordered k-step FUNNEL: how many users perform `steps` in order, each
    * step STRICTLY after the previous one and within `maxGapMicros` of it
    * (the classic conversion funnel; the gap bound keeps a January view
    * from "converting" via a December purchase). A user's step-i time is
    * the EARLIEST qualifying occurrence — the standard first-touch
    * attribution rule, and the choice that makes the walk one aggregate per
    * step instead of a per-user sequence scan.
    *
    * Shape at scale: per step, one filtered scan slice + one user-keyed
    * hash aggregation (map-side combined) + one user-keyed join onto the
    * previous step's (user, time) table — k bounded small, so the plan is
    * k narrow passes; no window over the full event stream, no per-user
    * sort. Counts are one-row aggregates; conversion is exact integer
    * per-mille against step 1.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String],
             maxGapMicros: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
    val reached: Seq[DataFrame] = steps.tail.scanLeft(first) { (prev, st) =>
      events.filter(col(typeCol) === st)
        .join(prev.select(col(userCol), col("__t").as("__pt")), userCol)
        .filter(col(tsCol) > col("__pt") &&
          unix_micros(col(tsCol)) - unix_micros(col("__pt")) <= maxGapMicros)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
    }
    val n1 = broadcast(first.agg(count(lit(1)).as("__n1")))
    reached.zip(steps).zipWithIndex.map { case ((df, st), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(st).as("event_type"), col("n_users"))
    }.reduce(_ union _)
      .crossJoin(n1)
      .select(col("step"), col("event_type"), col("n_users"),
        expr("CASE WHEN __n1 > 0 THEN n_users * 1000 DIV __n1 ELSE 0 END")
          .as("conv_permille"))
      .orderBy("step")
  }

  /** LAST-TOUCH revenue ATTRIBUTION: every conversion event is credited to
    * the most recent preceding touch event (any type in `touchTypes`) of
    * the same user within `maxGapMicros` — the classic marketing
    * attribution rule, and a direct composition of the sort-based
    * [[AsOfJoin]] (conversions probe backward into the touch stream; the
    * tolerance IS the attribution window). Conversions with no qualifying
    * touch report under 'unattributed', so the value column always sums to
    * the total conversion revenue (conservation is the audit).
    *
    * Value sums run in DECIMAL(18,2) (the fixture's values are exact
    * cents), so totals are exact cross-engine. Shape at scale: one as-of
    * sweep (one key exchange + per-key sort — no range join), one hash
    * aggregation over |touchTypes|+1 groups, a one-row totals aggregate.
    */
  def attribution(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, valueCol: String, conversionType: String,
                  touchTypes: Seq[String], maxGapMicros: Long): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val conversions = events.filter(col(typeCol) === conversionType)
      .select(col(userCol), col(tsCol), col(valueCol))
    val touches = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol), col(tsCol).as("__touch_ts"),
        col(typeCol).as("touch_type"))
    val attributed = AsOfJoin.asOf(conversions, touches, userCol,
        tsCol, "__touch_ts", toleranceMicros = Some(maxGapMicros))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col(valueCol).cast(DecimalType(18, 2))).as("__v"))
    val totals = conversions.agg(count(lit(1)).as("__nt"),
      sum(col(valueCol).cast(DecimalType(18, 2))).as("__vt"))
    val unattributed = attributed
      .agg(sum(col("n_conversions")).as("__na"), sum(col("__v")).as("__va"))
      .crossJoin(broadcast(totals))
      .select(
        lit("unattributed").as("touch_type"),
        (col("__nt") - coalesce(col("__na"), lit(0L))).as("n_conversions"),
        (coalesce(col("__vt"), lit(0).cast(DecimalType(18, 2))) -
          coalesce(col("__va"), lit(0).cast(DecimalType(18, 2)))).as("__v"))
    attributed.select(col("touch_type"), col("n_conversions"),
        col("__v").cast(DecimalType(28, 2)).as("__v"))
      .union(unattributed.select(col("touch_type"), col("n_conversions"),
        col("__v").cast(DecimalType(28, 2)).as("__v")))
      .select(col("touch_type"), col("n_conversions"),
        col("__v").cast("double").as("value_total"))
      .orderBy("touch_type")
  }

  /** Weekly COHORT-RETENTION matrix: users cohorted by the week of their
    * first `cohortType` event; a cohort member is retained in week-offset w
    * when ANY event of theirs falls in cohort_week + w. Weeks are
    * `date_trunc('week', …)` (Monday-aligned in both engines), offsets are
    * exact integer week counts, retention is integer per-mille of the
    * cohort size.
    *
    * Shape at scale: one filtered per-user min (the cohort assignment), a
    * distinct (user, week) activity projection, one user-keyed join, two
    * hash aggregations — the distinct and the (cohort, offset) user count
    * are both map-side combined; output is
    * (#cohort weeks × #offsets) rows at any event volume.
    */
  def retention(events: DataFrame, userCol: String, typeCol: String,
                tsCol: String, cohortType: String): DataFrame = {
    val cohorts = events.filter(col(typeCol) === cohortType)
      .groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).cast("date").as("cohort_week"))
    val sizes = cohorts.groupBy("cohort_week").agg(count(lit(1)).as("cohort_size"))
    val activity = events
      .select(col(userCol), date_trunc("week", col(tsCol)).cast("date").as("week"))
      .distinct()
    cohorts.join(activity, userCol)
      .filter(col("week") >= col("cohort_week"))
      .withColumn("week_offset",
        expr("CAST(datediff(week, cohort_week) DIV 7 AS INT)"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active")) // (user, week) pairs are distinct
      .join(sizes, "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        expr("n_active * 1000 DIV cohort_size").as("retention_permille"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Markov TRANSITION matrix: per user, events ordered by (ts, tiebreaker);
    * every consecutive (prev_type → next_type) step is counted, and each
    * row reports the transition's share of all steps leaving `prev_type`
    * (exact integer per-mille). The classic behavioral-sequence summary —
    * what users do NEXT after each action.
    *
    * Shape at scale: ONE user-keyed exchange feeding a per-user sort (the
    * lag window — per-user event counts are the bounded dimension, never
    * the corpus), then a hash aggregation over ≤ |types|² groups and a
    * bounded broadcast of the per-prev totals. No global sort, no
    * self-join of the event stream.
    */
  def transitionMatrix(events: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val steps = events
      .select(col(userCol), col(typeCol), col(tsCol), col(tieCol))
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n_steps"))
    val outTotals = steps.groupBy("prev_type")
      .agg(sum(col("n_steps")).as("__out"))
    steps.join(broadcast(outTotals), "prev_type") // ≤ |types| rows — bounded
      .select(col("prev_type"), col("next_type"), col("n_steps"),
        expr("n_steps * 1000 DIV __out").as("prob_permille"))
      .orderBy("prev_type", "next_type")
  }

  /** Rolling ACTIVE-USER report: per calendar day, the exact count of
    * distinct users active that day (DAU) and in the trailing `windowDays`
    * days (WAU with windowDays=7). Exact rolling COUNT DISTINCT without a
    * per-day rescan: dedup to (user, day) once, then each activity day
    * contributes itself to the next `windowDays` report days (a bounded
    * `windowDays`-way explode of the ALREADY-DEDUPED pairs — never of the
    * raw stream), and the per-(report day, user) dedup + count is one hash
    * aggregation. Report days are restricted to days with any activity.
    *
    * Shape at scale: distinct (user, day) is map-side combined; the explode
    * multiplies |user-days| by windowDays (a constant); the final distinct
    * count is again map-side combined. No day×stream range join, no state
    * kept per user.
    */
  def rollingActive(events: DataFrame, userCol: String, tsCol: String,
                    windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val userDays = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("day"))
      .distinct()
    val dau = userDays.groupBy("day").agg(count(lit(1)).as("dau"))
    val contrib = userDays
      .select(col("u"), explode(expr(
        s"sequence(day, date_add(day, ${windowDays - 1}))")).as("day"))
      .distinct()
    val rolling = contrib.join(dau.select("day"), "day") // only real report days
      .groupBy("day").agg(count(lit(1)).as(s"active_${windowDays}d"))
    dau.join(rolling, "day").orderBy("day")
  }

  /** CHURN profile: users bucketed by the week of their LAST event, with
    * integer per-mille of the user base — the "when did we lose them"
    * distribution (the complement of [[retention]]'s cohort view: retention
    * asks who comes back, churn asks when activity ends). Weeks are
    * Monday-aligned `date_trunc` like retention's cohorts.
    *
    * Shape at scale: one per-user max (map-side combined), one
    * ≤|weeks|-group count, a one-row totals broadcast.
    */
  def churnProfile(events: DataFrame, userCol: String,
                   tsCol: String): DataFrame = {
    val lastWeek = events.groupBy(col(userCol))
      .agg(date_trunc("week", max(col(tsCol))).cast("date").as("last_week"))
    val totals = broadcast(lastWeek.agg(count(lit(1)).as("n_users"))) // 1 row
    lastWeek.groupBy("last_week").agg(count(lit(1)).as("n_last_active"))
      .crossJoin(totals)
      .select(col("last_week"), col("n_last_active"),
        expr("n_last_active * 1000 DIV n_users").as("share_permille"))
      .orderBy("last_week")
  }

  /** Event-type CO-OCCURRENCE LIFT: for every unordered type pair (a < b),
    * how much more often users do BOTH than independence predicts —
    * lift = P(a∧b) / (P(a)·P(b)) over user sets, reported as exact floor'd
    * ppm via pure integer arithmetic (n_both·N·10⁶ ÷ (n_a·n_b), N = users
    * with any event). The set-level sibling of [[transitionMatrix]]
    * (which captures sequence; this captures portfolio — "users who do X
    * also do Y").
    *
    * Shape at scale: one distinct (user, type) projection (map-side
    * combined), a per-user self-join bounded by |types| per user (≤
    * |types|² pairs per user, never corpus×corpus), two bounded
    * aggregations, a one-row totals broadcast. Output ≤ |types|² rows.
    *
    * Numeric width: the multiply-divide runs in DECIMAL(38,0) (the
    * [[valueAnomalies]] discipline — int64 would wrap silently once
    * n_both·n_users·10⁶ exceeds ~9.2×10¹⁸, i.e. a few million users with
    * common co-occurring types). DECIMAL(38,0) is exact up to ~3×10¹⁵
    * users (N²·10⁶ < 10³⁸); the DuckDB oracle's HUGEINT has the same
    * headroom. The emitted lift_ppm is back in BIGINT: it is bounded by
    * N·10⁶/max(n_a,n_b) ≤ N·10⁶, far inside int64 at any N that fits the
    * intermediate.
    */
  def cooccurrenceLift(events: DataFrame, userCol: String,
                       typeCol: String): DataFrame = {
    val ut = events.select(col(userCol).as("u"), col(typeCol).as("t")).distinct()
    val perType = ut.groupBy("t").agg(count(lit(1)).as("n"))
    val nUsers = broadcast(ut.select("u").distinct()
      .agg(count(lit(1)).as("n_users"))) // 1 row
    val both = ut.as("a").join(ut.as("b"),
        col("a.u") === col("b.u") && col("a.t") < col("b.t"))
      .groupBy(col("a.t").as("type_a"), col("b.t").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    both
      .join(broadcast(perType.select(col("t").as("type_a"), col("n").as("n_a"))), "type_a")
      .join(broadcast(perType.select(col("t").as("type_b"), col("n").as("n_b"))), "type_b")
      .crossJoin(nUsers)
      .select(col("type_a"), col("type_b"), col("n_both"),
        expr("CAST(CAST(n_both AS DECIMAL(38,0)) * n_users * 1000000" +
          " DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)").as("lift_ppm"))
      .orderBy("type_a", "type_b")
  }

  /** Per-type VALUE HISTOGRAM by order of magnitude: events bucketed by the
    * decimal-digit count of their exact centi-unit value (bucket k ⇔ value
    * in [10^k, 10^(k+1)) cents; 0-valued events land in bucket 0) — the
    * skew/outlier profile read before choosing aggregation precision. The
    * bucket is `length(CAST(q AS VARCHAR)) - 1`: a pure integer/string
    * operation, bit-identical cross-engine (a float log10 would tie at
    * exact powers of ten).
    *
    * Shape at scale: one narrow projection + one ≤ |types|·20-group
    * map-side-combined aggregation + a |types|-row broadcast for shares.
    */
  def valueHistogram(events: DataFrame, typeCol: String,
                     valueCol: String): DataFrame = {
    val q = round(col(valueCol) * 100).cast("long")
    val bucketed = events
      .select(col(typeCol).as("event_type"),
        (length(q.cast("string")) - 1).as("bucket"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n_events"))
    val totals = bucketed.groupBy("event_type").agg(sum(col("n_events")).as("__t"))
    bucketed.join(broadcast(totals), "event_type") // |types| rows — bounded
      .select(col("event_type"), col("bucket"), col("n_events"),
        expr("n_events * 1000 DIV __t").as("share_permille"))
      .orderBy("event_type", "bucket")
  }

  /** Per-type VALUE-ANOMALY report: events whose value sits more than
    * `zTimes10/10` population standard deviations from their type's mean.
    * The z-test is evaluated in EXACT integer arithmetic on centi-units
    * (values are exact 2-dp): with q=round(100·value), n, S=Σq, Q=Σq²,
    * the flag is (q·n − S)² > z²·(n·Q − S²) — both sides exact
    * DECIMAL(38,0), so the report is bit-identical cross-engine with no
    * float variance epsilon. (At petabyte row counts the decimal widths
    * still hold: 38 digits cover n·Q for n up to ~10¹² events per type.)
    *
    * Shape at scale: one map-side-combined per-type moment aggregation
    * (|types| rows, broadcast back), one filtered re-scan, one final
    * |types|-group count. Two narrow passes over the stream, zero windows.
    */
  def valueAnomalies(events: DataFrame, typeCol: String, valueCol: String,
                     zTimes10: Int = 20): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val q = round(col(valueCol) * 100).cast(dec)
    val ev = events.select(col(typeCol).as("event_type"), q.as("q"))
    val moments = ev.groupBy("event_type").agg(
      count(lit(1)).cast(dec).as("n"),
      sum(col("q")).as("s"),
      sum(col("q") * col("q")).as("qq"))
    ev.join(broadcast(moments), "event_type") // |types| rows — bounded
      .withColumn("dev", col("q") * col("n") - col("s"))
      .withColumn("is_outlier",
        col("dev") * col("dev") * lit(100).cast(dec) >
          lit(zTimes10.toLong * zTimes10).cast(dec) *
            (col("n") * col("qq") - col("s") * col("s")))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("is_outlier"), 1L).otherwise(0L)).as("n_outliers"))
      .withColumn("outlier_permille",
        expr("n_outliers * 1000 DIV n_events"))
      .orderBy("event_type")
  }
}
