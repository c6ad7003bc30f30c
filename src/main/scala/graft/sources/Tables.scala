package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md) and for the
  * synthetic `share-holders` changelog derived from the `events` table.
  *
  * All loads are plain `spark.read.parquet` so Catalyst handles predicate
  * pushdown / column pruning into the scan; no caching here — callers decide.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped in two fixture generations: parquet
    * TIMESTAMP(NANOS) (rounds 1-8, which Spark only reads as long via the
    * legacy conf) and TIMESTAMP(MICROS) without a timezone annotation
    * (round 9+, which Spark reads as TIMESTAMP_NTZ). Branch on the resolved
    * type so either fixture yields the same column: a session-tz TIMESTAMP
    * with microsecond values identical to DuckDB's view of the file (the
    * session tz is UTC everywhere, so NTZ -> TIMESTAMP is value-preserving,
    * and nanos are floor-truncated exactly like DuckDB's TIMESTAMP_NS cast).
    */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    // The NTZ->TIMESTAMP cast below is value-preserving ONLY under a UTC
    // session timezone (every in-repo session builder pins it). A caller's
    // own non-UTC session would silently shift timestamps relative to the
    // DuckDB oracle's view of the file — fail loudly instead.
    val tz = spark.conf.get("spark.sql.session.timeZone",
      java.util.TimeZone.getDefault.getID)
    require(tz == "UTC",
      s"Tables.events requires spark.sql.session.timeZone=UTC (got '$tz'): " +
        "the events.ts NTZ cast is only value-preserving under UTC")
    // Scope the legacy conf to this load: save and restore around the read so
    // later parquet reads in the same session don't silently inherit
    // nanos-as-long semantics. The conf is a no-op for micros fixtures.
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      // Pass the conf as a read option too: per-relation options are merged
      // into the Hadoop conf each time the scan is planned, keeping lazy
      // executions correct after the session conf is restored.
      val raw = spark.read.option(key, "true").parquet(s"$dir/events.parquet")
      val ts = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          timestamp_micros(expr("ts div 1000")) // nanos-as-long fixture
        case _ =>
          col("ts").cast("timestamp") // µs fixture (NTZ under a UTC session)
      }
      raw.withColumn("ts", ts)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  /** Synthetic changelog modeling the reference's compacted `share-holders`
    * topic (reference: our-service/src/our_service/kafka_streams.clj:64,
    * docker-compose.yml:13), derived deterministically from `events`:
    *
    *   - `seq`     : arrival order (Kafka offset analog) = event_id
    *   - `key`     : "client:::ticker" (fake_producer.clj:25)
    *   - tombstone : value IS NULL semantics, here a boolean flag
    *                 (amount=0 => tombstone, fake_producer.clj:26-29)
    *
    * Integer-only derivations so the DuckDB oracle reproduces them bit-exactly.
    */
  def shareHoldersChangelog(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    ev.select(
      col("event_id").as("seq"),
      concat(lit("client"), (col("user_id") % 50).cast("string")).as("client"),
      upper(col("event_type")).as("ticker"),
      when(col("event_id") % 3 === 0, "NASDAQ")
        .when(col("event_id") % 3 === 1, "LON")
        .otherwise("NYSE").as("exchange"),
      (col("event_id") % 7 === 0).as("tombstone"))
      .withColumn("key", concat(col("client"), lit(":::"), col("ticker")))
  }

  /** The DuckDB-side equivalent of [[shareHoldersChangelog]], used as a CTE
    * prefix in oracle SQL. Must stay in lock-step with the Spark derivation.
    */
  val shareHoldersChangelogSql: String =
    """SELECT event_id AS seq,
      |       'client' || CAST(user_id % 50 AS VARCHAR) AS client,
      |       upper(event_type) AS ticker,
      |       CASE CAST(event_id % 3 AS INT) WHEN 0 THEN 'NASDAQ' WHEN 1 THEN 'LON' ELSE 'NYSE' END AS exchange,
      |       (event_id % 7 = 0) AS tombstone,
      |       'client' || CAST(user_id % 50 AS VARCHAR) || ':::' || upper(event_type) AS key
      |FROM events""".stripMargin
}
