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
}
