package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Data-layout utilities for the 100 TB design point.
  *
  * The reference's layout story is Kafka's: a compacted topic hash-partitioned
  * by key (`/root/reference/docker-compose.yml:13` — 4 partitions), so every
  * stateful operator reads co-partitioned input for free. At rest in a lake the
  * same property has to be *written into the files*; these helpers do that with
  * Spark built-ins, and `LayoutSpec` locks the payoff in the physical plan:
  *
  *  - [[writeBucketed]]: hash-bucketed + per-bucket-sorted table. Two tables
  *    bucketed the same way join with NO shuffle exchange on either side —
  *    at 100 TB that turns the nightly fact⋈fact join from a full network
  *    shuffle into a local merge.
  *  - [[writeClustered]]: range-partition + sort-within-partition parquet.
  *    Each file covers a disjoint key range, so parquet row-group min/max
  *    statistics let a key-predicate scan skip all but one file ("poor man's
  *    z-order" for a single key; for multi-key clustering compose the sort).
  *  - [[writePartitioned]]: hive-style directory partitioning for
  *    low-cardinality columns; predicate scans prune whole directories at
  *    planning time (`PartitionFilters` in the scan node, no file I/O at all
  *    for pruned partitions).
  *
  * Pick by cardinality: directory-partition low-cardinality columns (date,
  * language), bucket high-cardinality join keys, range-cluster high-cardinality
  * filter keys.
  */
object Layout {

  /** Write `df` as a bucketed, per-bucket-sorted managed table.
    *
    * Both sides of a co-located join must use the same `numBuckets` and the
    * same bucket keys. At scale, pick `numBuckets` so one bucket's rows fit an
    * executor's memory (buckets are the unit of read parallelism).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      numBuckets: Int,
      keys: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key column")
    df.write
      .mode(mode)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Shuffle-free equi-join of two tables bucketed on the same keys.
    *
    * This is just `spark.table(a).join(spark.table(b), keys)` — the point of
    * the helper is the contract: with matching bucket specs Catalyst plans a
    * sort-merge join whose children are the bucketed scans directly, with no
    * `Exchange` on either side (locked by `LayoutSpec`).
    */
  def bucketedJoin(
      spark: SparkSession,
      left: String,
      right: String,
      keys: Seq[String]): DataFrame =
    spark.table(left).join(spark.table(right), keys)

  /** Range-cluster `df` into `numFiles` parquet files sorted by `cols`.
    *
    * `repartitionByRange` samples the key distribution, so files get disjoint,
    * volume-balanced key ranges; the within-partition sort tightens every
    * row-group's min/max envelope. A reader filtering on the leading cluster
    * key then skips whole files/row-groups via parquet statistics — the same
    * plan, but I/O proportional to selectivity instead of table size.
    */
  def writeClustered(
      df: DataFrame,
      path: String,
      numFiles: Int,
      cols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(cols.nonEmpty, "clustering needs at least one column")
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(numFiles, cols.map(col): _*)
      .sortWithinPartitions(cols.head, cols.tail: _*)
      .write
      .mode(mode)
      .parquet(path)
  }

  /** Hive-style directory partitioning for low-cardinality columns.
    *
    * Directory count = product of distinct values — keep it to columns with at
    * most a few thousand values (date, language, source) or the file listing
    * itself becomes the bottleneck.
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    df.write
      .mode(mode)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
