package graft.sources

import graft.SparkSpec

/** Regression: `Tables.events` must deliver `ts` as a session-tz TIMESTAMP
  * regardless of which fixture generation is on disk — TIMESTAMP(NANOS)
  * (rounds 1-8, readable only as long via the legacy conf) or
  * TIMESTAMP(MICROS)/NTZ (round 9+). The legacy conf is scoped to the load
  * and restored before returning, so the returned frame is LAZY and only
  * executes after the session conf is back to default (ADVICE r2). This pins
  * both the restore and the type normalization.
  */
class TablesSpec extends SparkSpec {

  test("events executes after the session conf is restored") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key) // registered default: Some("false")
    val ev = Tables.table(spark, sf0001, "events") // load + conf restore done
    assert(spark.conf.getOption(key) == before, "legacy conf must not leak")
    assert(!spark.conf.getOption(key).contains("true"))
    // execution happens HERE, post-restore — the load must not depend on
    // session state that is already gone
    assert(ev.count() > 0)
    val r = ev.selectExpr("min(ts)", "max(ts)").head()
    assert(!r.isNullAt(0) && !r.isNullAt(1))
    // normalized type: session-tz TIMESTAMP, never NTZ or long — streaming
    // watermarks and every downstream window/date_trunc depend on this
    assert(ev.schema("ts").dataType.typeName == "timestamp")
  }

  test("a plain parquet read after events does not inherit nanos semantics") {
    Tables.table(spark, sf0001, "events").count()
    // orders has normal µs timestamps; if nanosAsLong leaked into the
    // session, o_orderdate would come back as LONG
    val o = Tables.table(spark, sf0001, "orders")
    assert(o.schema("o_orderdate").dataType.typeName != "long")
    assert(o.count() > 0)
  }
}
