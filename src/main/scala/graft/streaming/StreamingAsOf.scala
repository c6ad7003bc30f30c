package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Streaming as-of enrichment — the point-in-time sibling of
  * [[graft.operators.AsOfJoin]], completing the reference's KTable model
  * (a stream continuously enriched against the latest state of another
  * stream, `kafka_streams.clj:61-80`) with TIME-correct semantics: a probe
  * event is matched to the build row with the greatest build-time <= its
  * own event-time for the same key, incrementally, as both streams arrive.
  *
  * Formulation: the batch operator's tag-union-sweep, made incremental.
  * Both inputs union into one stream keyed by the join key; per key,
  * `flatMapGroupsWithState` keeps the running "latest build payload"
  * (timestamp + row) in the state store and emits an enriched row for every
  * probe whose event-time is >= that build's. Each micro-batch's rows are
  * processed in (event-time, side) order — builds before probes at equal
  * time, exactly the batch sweep's tie rule — so the result matches the
  * batch operator whenever builds reach the operator no later than the
  * probes they should enrich (the KTable contract; a build arriving AFTER a
  * probe already emitted cannot retroactively re-enrich it in append mode).
  * Backward direction only: forward as-of needs probes buffered until the
  * watermark proves no earlier build can still arrive — a different
  * operator, deliberately not hidden behind the same API.
  *
  * Scale shape: state is ONE (timestamp, payload) entry per key — bounded
  * by key cardinality, not stream length; each micro-batch shuffles once on
  * the key (the same exchange a stream-stream join would pay) and the
  * per-key sort is bounded by that key's rows IN THE BATCH, never history.
  * Payloads cross the state store as JSON (schema-stable, no custom
  * encoders); output columns are restored to their native types via
  * `from_json` against the input schemas.
  */
object StreamingAsOf {

  /** One tagged event: side 0 = build, 1 = probe; `pl` is the JSON payload. */
  case class Event(k: String, t: Long, side: Int, pl: String)
  /** Running latest-build state per key. */
  case class BuildState(t: Long, pl: String)
  /** Enriched output before column restoration. */
  case class Enriched(probePl: String, buildT: Long, buildPl: String)

  /** probe ⋈asof build on `key`, backward direction.
    *
    * @param probe   streaming DataFrame with `key` + `probeTs` (+ payload)
    * @param build   streaming DataFrame with `key` + `buildTs` (+ payload)
    * @param toleranceMicros optional max probe-build gap in microseconds
    * @return streaming DataFrame: all probe columns + build payload columns
    *         (inner as-of: unmatched probes are dropped)
    */
  def asOfStream(probe: DataFrame, build: DataFrame, key: String,
                 probeTs: String, buildTs: String,
                 toleranceMicros: Option[Long] = None): DataFrame = {
    val spark = probe.sparkSession
    import spark.implicits._
    val probeSchema: StructType = probe.schema
    val buildPayloadCols = build.columns.filterNot(c => c == key || c == buildTs).toIndexedSeq
    val buildPayloadSchema = StructType(build.schema.fields
      .filter(f => buildPayloadCols.contains(f.name)))

    val taggedBuild = build.select(
      col(key).cast("string").as("k"),
      unix_micros(col(buildTs).cast("timestamp")).as("t"),
      lit(0).as("side"),
      to_json(struct(buildPayloadCols.map(col): _*)).as("pl"))
    val taggedProbe = probe.select(
      col(key).cast("string").as("k"),
      unix_micros(col(probeTs).cast("timestamp")).as("t"),
      lit(1).as("side"),
      to_json(struct(probe.columns.map(col): _*)).as("pl"))

    val enriched: Dataset[Enriched] = taggedBuild.unionByName(taggedProbe)
      .as[Event]
      .groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(matchGroup)

    val restored = enriched
      .select(
        from_json(col("probePl"), probeSchema).as("__p"),
        col("buildT"),
        from_json(col("buildPl"), buildPayloadSchema).as("__b"))
    val gapFiltered = toleranceMicros match {
      case None => restored
      case Some(tol) => restored.filter(
        unix_micros(col(s"__p.$probeTs").cast("timestamp")) - col("buildT") <= tol)
    }
    gapFiltered.select(
      probe.columns.map(c => col(s"__p.$c").as(c)) ++
        buildPayloadCols.map(c => col(s"__b.$c").as(c)): _*)
  }

  /** Per key and micro-batch: replay this batch's rows in (t, side) order,
    * carry the latest build across batches in the state store, emit matches
    * for probes. The build state only moves FORWARD in event time — a
    * late, older build never regresses the running state (running-last
    * semantics, identical to the batch window sweep).
    */
  private[streaming] def matchGroup(
      k: String, rows: Iterator[Event],
      state: GroupState[BuildState]): Iterator[Enriched] = {
    var st: Option[BuildState] = state.getOption
    val out = Seq.newBuilder[Enriched]
    rows.toSeq.sortBy(e => (e.t, e.side)).foreach { e =>
      if (e.side == 0) {
        if (st.forall(_.t <= e.t)) st = Some(BuildState(e.t, e.pl))
      } else {
        st.filter(_.t <= e.t).foreach(s => out += Enriched(e.pl, s.t, s.pl))
      }
    }
    st.foreach(state.update)
    out.result().iterator
  }
}
