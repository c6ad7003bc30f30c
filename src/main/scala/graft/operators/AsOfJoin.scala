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
    val (unioned, probeCols, buildPayloadCols) =
      taggedUnion(probe, build, key, probeTs, buildTs)

    // per key, in (time, side) order, the most recent build payload at or
    // before each row; builds sort before probes at equal time (side 0 < 1),
    // so an equal-time build is visible to the probe. Forward = the same
    // sweep over DESCENDING time: "last build seen" is then the smallest
    // build-time >= the probe.
    val timeOrder = if (direction == "backward") col("__t").asc else col("__t").desc
    val w = Window.partitionBy(col("__k"))
      .orderBy(timeOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
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

  /** The tagged union both sweeps run over: build rows deduplicated to one
    * per (key, t) (lexicographically greatest payload — the oracle's dedup
    * rule), each side tagged with `__side` (build 0 < probe 1, so an
    * equal-time build is visible to the probe in EITHER sort direction),
    * the build payload riding a struct that carries its own event time in
    * µs so gaps can be computed after the match without re-joining.
    */
  private def taggedUnion(probe: DataFrame, build: DataFrame, key: String,
                          probeTs: String, buildTs: String)
      : (DataFrame, IndexedSeq[String], IndexedSeq[String]) = {
    val buildPayloadCols = build.columns.filterNot(c => c == key || c == buildTs).toIndexedSeq
    val probeCols = probe.columns.toIndexedSeq
    val buildDedup = LatestPerKey(build, Seq(key, buildTs), buildPayloadCols)
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
    (taggedBuild.unionByName(taggedProbe), probeCols, buildPayloadCols)
  }

  /** NEAREST-match as-of: for every probe, the build row minimizing the
    * absolute time gap — pandas `merge_asof(direction="nearest")`, the form
    * sensor/feature alignment actually wants when the lookup may sit on
    * either side of the event. Ties (equidistant build rows) break to the
    * BACKWARD match, so an equal-time build always wins with gap 0.
    *
    * Output: all probe columns + the matched build payload + `matched_dir`
    * ("backward"/"forward") + `gap_us` (integer µs — the report columns an
    * alignment audit reads); probes with no build row on either side drop
    * (inner semantics, like [[asOf]]). `toleranceMicros` bounds the CHOSEN
    * gap: "nearest within tolerance" ≡ "best match within tolerance",
    * because every other candidate is farther.
    *
    * Shape at scale: ONE union and ONE key exchange feed BOTH directional
    * sweeps — the backward and forward windows share the partitioning, so
    * Spark plans one shuffle and two per-partition sorts (asc/desc), never
    * a range join or per-probe scan. Same skew story as [[asOf]].
    */
  def asOfNearest(probe: DataFrame, build: DataFrame, key: String,
                  probeTs: String, buildTs: String,
                  toleranceMicros: Option[Long] = None): DataFrame = {
    val (unioned, probeCols, buildPayloadCols) =
      taggedUnion(probe, build, key, probeTs, buildTs)
    val wb = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("__k"))
      .orderBy(col("__t").desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val probeMicros = unix_micros(col("__t").cast("timestamp"))
    val bgap = probeMicros - col("__back.__bt")
    val fgap = col("__fwd.__bt") - probeMicros
    val useBack = col("__back").isNotNull &&
      (col("__fwd").isNull || bgap <= fgap)
    val chosen = unioned
      .withColumn("__back", last(col("__build"), ignoreNulls = true).over(wb))
      .withColumn("__fwd", last(col("__build"), ignoreNulls = true).over(wf))
      .filter(col("__side") === 1)
      .filter(col("__back").isNotNull || col("__fwd").isNotNull)
      .withColumn("__matched", when(useBack, col("__back")).otherwise(col("__fwd")))
      .withColumn("matched_dir", when(useBack, lit("backward")).otherwise(lit("forward")))
      .withColumn("gap_us", when(useBack, bgap).otherwise(fgap))
    val gapFiltered = toleranceMicros match {
      case None => chosen
      case Some(tol) => chosen.filter(col("gap_us") <= tol)
    }
    gapFiltered.select(probeCols.map(c => col(s"__p_$c").as(c)) ++
      buildPayloadCols.map(c => col(s"__matched.$c").as(c)) ++
      Seq(col("matched_dir"), col("gap_us")): _*)
  }
}
