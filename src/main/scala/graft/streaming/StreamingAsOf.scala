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
  /** Enriched output before column restoration. `probeT` is the EXACT probe
    * event-time in microseconds, carried through so the tolerance filter
    * never re-derives it from the JSON payload (whose default timestamp
    * rendering is millisecond-truncated).
    */
  case class Enriched(probeT: Long, probePl: String, buildT: Long, buildPl: String)

  /** JSON options for payload transit through the state store: default
    * to_json/from_json render timestamps at MILLISECOND precision, silently
    * truncating microsecond-resolution payload columns — force a µs format.
    */
  private[streaming] val JsonOpts: Map[String, String] =
    Map("timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")

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
      to_json(struct(buildPayloadCols.map(col): _*), JsonOpts).as("pl"))
    val taggedProbe = probe.select(
      col(key).cast("string").as("k"),
      unix_micros(col(probeTs).cast("timestamp")).as("t"),
      lit(1).as("side"),
      to_json(struct(probe.columns.toIndexedSeq.map(col): _*), JsonOpts).as("pl"))

    val enriched: Dataset[Enriched] = taggedBuild.unionByName(taggedProbe)
      .as[Event]
      .groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(matchGroup)

    // tolerance compares the EXACT probe/build micros carried through the
    // operator — never timestamps re-parsed from JSON payloads
    val gapFiltered = toleranceMicros match {
      case None => enriched.toDF()
      case Some(tol) => enriched.filter(col("probeT") - col("buildT") <= tol).toDF()
    }
    gapFiltered
      .select(
        from_json(col("probePl"), probeSchema, JsonOpts).as("__p"),
        from_json(col("buildPl"), buildPayloadSchema, JsonOpts).as("__b"))
      .select(
      probe.columns.toIndexedSeq.map(c => col(s"__p.$c").as(c)) ++
        buildPayloadCols.map(c => col(s"__b.$c").as(c)): _*)
  }

  // ------------------------------------------------------------ forward

  /** Event for the forward direction: carries the event-time column the
    * watermark is defined on (`tsEvent`) alongside the µs integer `t`.
    */
  case class FEvent(k: String, t: Long, side: Int, pl: String,
                    tsEvent: java.sql.Timestamp)
  /** Forward-matcher state: arrived builds (by time, deduped) and pending
    * probes awaiting a finalizable match.
    */
  case class FState(builds: Seq[(Long, String)], probes: Seq[(Long, String)])

  /** probe ⋈asof-FORWARD build: each probe matches the SMALLEST build-time
    * in `[probe-time, probe-time + tolerance]` for its key. Forward as-of
    * cannot emit eagerly — the right build may not have arrived yet — so
    * this operator is WATERMARK-DRIVEN: probes buffer in state and emit
    * only once the watermark proves no earlier qualifying build can still
    * arrive (watermark ≥ the candidate's build-time); a probe whose whole
    * tolerance window passes the watermark unmatched is dropped for good.
    * `tolerance` is therefore REQUIRED here — it is what bounds both the
    * result's latency and the probe buffer (without it an unmatched probe
    * would pend forever).
    *
    * State per key: pending probes (bounded by tolerance × probe rate) and
    * arrived builds pruned to `build-time ≥ min(watermark, oldest pending
    * probe)` — everything older can only serve probes the watermark
    * already classifies as late. Event-time timers re-examine a key when
    * its next decision boundary passes the watermark even if no new rows
    * arrive. Rows older than the watermark never reach the operator — the
    * engine's watermark filter drops them at admission (verified against
    * Spark 4.1: a below-watermark row in a later batch is simply absent
    * from the group iterator) — so `watermarkDelay` is the disorder budget
    * BETWEEN the two streams: size it to cover how far probe arrivals may
    * trail the build high-water mark.
    *
    * Matches the batch `AsOfJoin.asOf(direction = "forward",
    * toleranceMicros = Some(tol))` whenever no event is late; the
    * equivalence is asserted on the shared fixture in StreamingAsOfSpec.
    */
  def asOfStreamForward(probe: DataFrame, build: DataFrame, key: String,
                        probeTs: String, buildTs: String,
                        toleranceMicros: Long,
                        watermarkDelay: String = "0 seconds"): DataFrame = {
    require(toleranceMicros >= 0, "forward as-of needs a finite tolerance")
    val spark = probe.sparkSession
    import spark.implicits._
    val probeSchema: StructType = probe.schema
    val buildPayloadCols = build.columns.filterNot(c => c == key || c == buildTs).toIndexedSeq
    val buildPayloadSchema = StructType(build.schema.fields
      .filter(f => buildPayloadCols.contains(f.name)))

    def tagged(df: DataFrame, ts: String, side: Int, payload: Seq[String]) = df.select(
      col(key).cast("string").as("k"),
      unix_micros(col(ts).cast("timestamp")).as("t"),
      lit(side).as("side"),
      to_json(struct(payload.map(col): _*), JsonOpts).as("pl"),
      col(ts).cast("timestamp").as("tsEvent"))
    val unioned = tagged(build, buildTs, 0, buildPayloadCols)
      .unionByName(tagged(probe, probeTs, 1, probe.columns.toIndexedSeq))
      .withWatermark("tsEvent", watermarkDelay)
      .as[FEvent]

    val enriched: Dataset[Enriched] = unioned
      .groupByKey(_.k)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k: String, rows: Iterator[FEvent], state: GroupState[FState]) =>
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          val st = state.getOption.getOrElse(FState(Nil, Nil))
          val (next, out) = forwardStep(st, rows.toSeq, wmMicros, toleranceMicros)
          if (next.builds.isEmpty && next.probes.isEmpty) state.remove()
          else {
            state.update(next)
            val wakeMicros =
              if (next.probes.nonEmpty) {
                // wake this key when its earliest decision boundary passes
                // the watermark: either a pending probe's candidate
                // build-time (to finalize) or its window end (to expire)
                next.probes.map { case (pt, _) =>
                  next.builds.collectFirst {
                    case (bt, _) if bt >= pt && bt <= pt + toleranceMicros => bt
                  }.getOrElse(pt + toleranceMicros)
                }.min
              } else {
                // builds-only state: no probe can ever match a build below
                // the watermark (forward needs build-time >= probe-time >=
                // watermark), so wake once the watermark passes the newest
                // retained build and let the prune empty + remove the state —
                // without this timer a quiescent key would hold its builds
                // forever and the store would grow with dead-key cardinality
                next.builds.map(_._1).max
              }
            state.setTimeoutTimestamp(math.max(wakeMicros / 1000L + 1, state.getCurrentWatermarkMs() + 1))
          }
          out.iterator
      }

    enriched
      .select(
        from_json(col("probePl"), probeSchema, JsonOpts).as("__p"),
        from_json(col("buildPl"), buildPayloadSchema, JsonOpts).as("__b"))
      .select(
        probe.columns.toIndexedSeq.map(c => col(s"__p.$c").as(c)) ++
          buildPayloadCols.map(c => col(s"__b.$c").as(c)): _*)
  }

  /** One forward-matcher step — PURE (unit-tested directly): merge the
    * invocation's events into the state, emit every pending probe whose
    * match is finalizable under the watermark, expire probes whose
    * tolerance window has wholly passed it, prune unusable builds.
    */
  private[graft] def forwardStep(
      st: FState, events: Seq[FEvent], wmMicros: Long,
      tol: Long): (FState, Seq[Enriched]) = {
    // every event that reaches this function is processed — the engine's
    // watermark filter already dropped late rows at admission, and here the
    // watermark gates EMISSION certainty and expiry only. Builds dedupe per
    // time to the lexicographically greatest SERIALIZED payload (see the
    // matchGroup note: deterministic; equals batch LatestPerKey order for
    // string payloads).
    val fresh = events
    val builds = (st.builds ++ fresh.collect { case e if e.side == 0 => (e.t, e.pl) })
      .groupBy(_._1).map { case (t, ps) => (t, ps.map(_._2).max) }
      .toSeq.sortBy(_._1)
    val probes = st.probes ++ fresh.collect { case e if e.side == 1 => (e.t, e.pl) }

    val out = Seq.newBuilder[Enriched]
    val pending = Seq.newBuilder[(Long, String)]
    probes.sortBy(p => (p._1, p._2)).foreach { case (pt, pl) =>
      builds.find { case (bt, _) => bt >= pt && bt <= pt + tol } match {
        // STRICT bt < wm: an event AT the watermark is not late, so a
        // same-time build (which per-time dedup could prefer) may still
        // arrive — certainty begins strictly below the watermark
        case Some((bt, bpl)) if bt < wmMicros => out += Enriched(pt, pl, bt, bpl)
        case None if pt + tol < wmMicros      => () // window closed: drop
        case _                                => pending += ((pt, pl))
      }
    }
    val pend = pending.result()
    val keepFrom = (pend.map(_._1) :+ wmMicros).min
    (FState(builds.filter(_._1 >= keepFrom), pend), out.result())
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
    // sort includes the payload so equal-time builds replay in a
    // DETERMINISTIC order; the replacement rule below then makes the
    // lexicographically greatest payload win an equal-time tie — the same
    // rule as forwardStep, both within a batch and against the stored
    // BuildState from prior batches. NOTE the comparison is over the
    // SERIALIZED JSON payload (the operator's transit form): it equals the
    // batch LatestPerKey tie order for string payloads (the KTable model's
    // case) but can differ from native-type ordering for numeric payloads
    // at EXACTLY equal timestamps — determinism, not cross-form ordering,
    // is the guarantee here.
    rows.toSeq.sortBy(e => (e.t, e.side, e.pl)).foreach { e =>
      if (e.side == 0) {
        if (st.forall(s => s.t < e.t || (s.t == e.t && s.pl <= e.pl)))
          st = Some(BuildState(e.t, e.pl))
      } else {
        st.filter(_.t <= e.t).foreach(s => out += Enriched(e.t, e.pl, s.t, s.pl))
      }
    }
    st.foreach(state.update)
    out.result().iterator
  }
}
