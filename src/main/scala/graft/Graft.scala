package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Local-mode defaults are tuned for the test harness (`local[32]`, 32 shuffle
  * partitions); on a real cluster the same settings scale via spark-submit conf.
  * AQE stays on everywhere: it re-plans shuffle partition counts, converts
  * sort-merge joins to broadcast at runtime, and splits skewed partitions —
  * all critical at the 100 TB design point.
  */
object Graft {
  def session(appName: String = "graft", cpus: String = defaultCpus): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      // graft_dot / graft_cosine / graft_hash60 / graft_normalize in SQL
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // RocksDB state store: required by transformWithState (column
      // families) and the right provider for large state regardless
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Defaults to all cores (the driver environment is local[32]). */
  def defaultCpus: String =
    sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
}
