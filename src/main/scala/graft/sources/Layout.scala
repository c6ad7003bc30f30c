package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

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
      mode: SaveMode = SaveMode.Overwrite,
      format: String = "parquet"): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key column")
    df.write
      .mode(mode)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format(format)
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

  /** Interleaved-bit z-value of two quantized columns (integers in
    * `[0, 2^bits)`). Bit i of x lands at position 2i, bit i of y at 2i+1, so
    * sorting by the z-value clusters BOTH dimensions at once — the
    * multi-column analog of [[writeClustered]]'s single-key ordering. The
    * fold builds a flat OR tree of shift/mask terms: pure codegen
    * arithmetic, no UDF.
    */
  def zValue(qx: Column, qy: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    import org.apache.spark.sql.functions._
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(qx, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(qy, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Z-order-cluster `df` into `numFiles` parquet files over two columns.
    *
    * Single-key clustering gives the second column a full-table min/max
    * envelope in every file — predicates on it skip nothing. Z-ordering
    * trades a little envelope tightness on the first column for bounded
    * envelopes on both, so scans filtering either column (or both) skip
    * files. `LayoutSpec` asserts both per-file envelopes shrink vs the
    * single-key layout.
    *
    * Quantization bounds come from one partial+final min/max aggregate whose
    * single row is broadcast back onto the data — no extra shuffle of the
    * data itself. At 100 TB, substitute precomputed bounds from a stats
    * table for the aggregate; the z-expression is unchanged.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      numFiles: Int,
      colX: String,
      colY: String,
      bits: Int = 16,
      saveMode: SaveMode = SaveMode.Overwrite): Unit = {
    import org.apache.spark.sql.functions._
    val reserved = Seq("__z", "__xlo", "__xhi", "__ylo", "__yhi")
    require(!df.columns.exists(reserved.contains),
      s"${reserved.mkString("/")} are reserved by writeZOrdered")
    val bounds = df.agg(
      min(colX).cast("double").as("__xlo"), max(colX).cast("double").as("__xhi"),
      min(colY).cast("double").as("__ylo"), max(colY).cast("double").as("__yhi"))
    val top = (1L << bits) - 1
    def quantize(c: Column, lo: Column, hi: Column) =
      when(hi === lo, lit(0L))
        .otherwise(floor((c.cast("double") - lo) / (hi - lo) * top))
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", zValue(
        quantize(col(colX), col("__xlo"), col("__xhi")),
        quantize(col(colY), col("__ylo"), col("__yhi")), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "__xlo", "__xhi", "__ylo", "__yhi")
      .write
      .mode(saveMode)
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
