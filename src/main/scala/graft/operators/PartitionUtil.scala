package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Partitioning helpers shared by the CPU-heavy operators. */
object PartitionUtil {

  /** Ensure at least `defaultParallelism` partitions before CPU-heavy
    * per-row work. A small parquet source (single file, single row group —
    * exactly what the local fixtures are) arrives as ONE partition and
    * serializes everything downstream; one cheap shuffle of the raw rows
    * buys full parallelism. Inputs that are already wide (the 100 TB case:
    * thousands of input splits) pass through untouched — never shrink.
    */
  def spread(df: DataFrame, byCol: String): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= parallelism) df
    else df.repartition(parallelism, col(byCol))
  }
}
