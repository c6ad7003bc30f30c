package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval join — the shuffle-partitionable scale path
  * for range joins.
  *
  * `q25_range_join` broadcasts the interval table and lets a nested-loop
  * join evaluate the range predicate; right up until the interval side stops
  * being tiny, at which point BNLJ is O(points × intervals). The standard
  * fix is to discretize: points map to bucket `floor(p / width)`, each
  * interval replicates to every bucket it overlaps, the join becomes an
  * equi-join on bucket id, and the exact range predicate filters the
  * residue. Both sides shuffle-partition by bucket, so the join scales like
  * any equi-join (AQE can split skewed buckets).
  *
  * Pick `width` near the median interval length: replication factor is
  * ≈ 1 + len/width per interval, while bucket fan-in grows as width shrinks
  * relative to point density. Results are identical to the BNLJ form
  * (oracle-checked via `interval_bucket_join`, overlapping intervals
  * included so multi-match semantics are exercised).
  */
object IntervalJoin {

  /** Inner join of `points` to `intervals` on `lo <= p < hi`.
    *
    * `maxBucketsPerInterval` bounds replication: an interval spanning more
    * buckets than that (a sentinel `hi`, or a `width` far below the longest
    * interval) fails the job with a clear message instead of materializing a
    * billion-element sequence per row.
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      width: Double,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(width > 0, "bucket width must be positive")
    require(!points.columns.contains("__bucket") && !intervals.columns.contains("__bucket"),
      "__bucket is reserved by pointInInterval")
    val p = points.withColumn("__bucket", floor(col(pointCol) / width))
    val loB = floor(col(loCol) / width)
    // hi is exclusive, but replicating to its bucket anyway is harmless —
    // the exact predicate drops the spurious pairs
    val hiB = when(
      floor(col(hiCol) / width) - loB < maxBucketsPerInterval,
      floor(col(hiCol) / width))
      .otherwise(raise_error(concat(
        lit(s"interval spans >= $maxBucketsPerInterval buckets (increase width): lo="),
        col(loCol).cast("string"), lit(" hi="), col(hiCol).cast("string"))))
    val iv = intervals.withColumn("__bucket", explode(sequence(loB, hiB)))
    p.join(iv, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
