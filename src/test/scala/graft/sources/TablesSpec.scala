package graft.sources

import graft.SparkSpec

/** Regression: `Tables.events` scopes the `nanosAsLong` legacy conf to the
  * load and restores it before returning, so the returned frame is LAZY and
  * only executes after the session conf is back to default. Correctness
  * depends on the per-relation read option carrying nanos-as-long semantics
  * into scan planning — a Spark upgrade that re-derived the flag from the
  * session conf at scan time would break every events query with no
  * unit-level signal (ADVICE r2). This pins it.
  */
class TablesSpec extends SparkSpec {

  test("events executes after the session conf is restored") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key) // registered default: Some("false")
    val ev = Tables.table(spark, sf0001, "events") // load + conf restore done
    assert(spark.conf.getOption(key) == before, "legacy conf must not leak")
    assert(!spark.conf.getOption(key).contains("true"))
    // execution happens HERE, post-restore: the relation's captured read
    // option must still deliver nanos-as-long at scan time
    assert(ev.count() > 0)
    val r = ev.selectExpr("min(ts)", "max(ts)").head()
    assert(!r.isNullAt(0) && !r.isNullAt(1))
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
