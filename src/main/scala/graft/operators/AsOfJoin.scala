package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every probe row, the single build row with
  * the greatest build-time <= probe-time for the same key — the classic
  * operator Spark lacks natively (training pipelines need it for
  * point-in-time-correct feature lookups). Also supports the `forward`
  * direction (smallest build-time >= probe-time) and a match tolerance,
  * mirroring the pandas merge_asof / kdb aj surface.
  *
  * Implementation is the scalable sort-based form, NOT a range BNLJ:
  * tag both sides, union, and per key take the running "last build payload"
  * over event-time order. One shuffle + sort per side, no quadratic range
  * expansion, and skew only concentrates on genuinely hot keys (where AQE's
  * skewed-sort handling applies). Build rows are pre-deduplicated to the
  * latest per (key, time) so ties are deterministic.
  */
object AsOfJoin {

  /** probe ⋈asof build. Output: all probe columns + the matched build payload
    * columns (null-free: probes with no qualifying build row are dropped,
    * i.e. inner as-of semantics).
    *
    * @param probe     probe side, contains `key` and `probeTs`
    * @param build     build side, contains `key` and `buildTs`
    * @param key       equi-join key column name (same name both sides)
    * @param probeTs   probe event-time column
    * @param buildTs   build event-time column
    * @param direction "backward" (greatest build <= probe, the default) or
    *                  "forward" (smallest build >= probe)
    * @param toleranceMicros max |probe - build| gap in MICROSECONDS.
    *                  Filtering the nearest match by the gap is exactly
    *                  "best match within tolerance": any other candidate is
    *                  farther away. Integer microseconds keep the boundary
    *                  comparison bit-identical across engines (fractional
    *                  seconds truncate differently).
    */
  def asOf(probe: DataFrame, build: DataFrame, key: String,
           probeTs: String, buildTs: String,
           direction: String = "backward",
           toleranceMicros: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val buildPayloadCols = build.columns.filterNot(c => c == key || c == buildTs).toIndexedSeq
    val probeCols = probe.columns.toIndexedSeq

    // deterministic ties: one build row per (key, t) — the lexicographically
    // greatest payload (matches the oracle's dedup rule)
    val buildDedup = LatestPerKey(build, Seq(key, buildTs), buildPayloadCols)

    // the build struct carries its own event time (µs) so tolerance can be
    // applied AFTER the match without re-joining
    val taggedBuild = buildDedup.select(
      col(key).as("__k") +:
        col(buildTs).as("__t") +:
        lit(0).as("__side") +:
        struct((buildPayloadCols.map(col) :+
          unix_micros(col(buildTs).cast("timestamp")).as("__bt")): _*).as("__build") +:
        probeCols.map(c => lit(null).cast(probe.schema(c).dataType).as(s"__p_$c")): _*)
    val taggedProbe = probe.select(
      col(key).as("__k") +:
        col(probeTs).as("__t") +:
        lit(1).as("__side") +:
        lit(null).cast(taggedBuild.schema("__build").dataType).as("__build") +:
        probeCols.map(c => col(c).as(s"__p_$c")): _*)

    // per key, in (time, side) order, the most recent build payload at or
    // before each row; builds sort before probes at equal time (side 0 < 1),
    // so an equal-time build is visible to the probe. Forward = the same
    // sweep over DESCENDING time: "last build seen" is then the smallest
    // build-time >= the probe.
    val timeOrder = if (direction == "backward") col("__t").asc else col("__t").desc
    val w = Window.partitionBy(col("__k"))
      .orderBy(timeOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = taggedBuild.unionByName(taggedProbe)
      .withColumn("__matched", last(col("__build"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__matched").isNotNull)
    val gapFiltered = toleranceMicros match {
      case None => matched
      case Some(tol) =>
        val probeMicros = unix_micros(col("__t").cast("timestamp"))
        val gap =
          if (direction == "backward") probeMicros - col("__matched.__bt")
          else col("__matched.__bt") - probeMicros
        matched.filter(gap <= tol)
    }
    gapFiltered.select(probeCols.map(c => col(s"__p_$c").as(c)) ++
      buildPayloadCols.map(c => col(s"__matched.$c").as(c)): _*)
  }
}
