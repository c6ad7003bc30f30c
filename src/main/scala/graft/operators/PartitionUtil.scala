package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.col

/** Partitioning helpers shared by the CPU-heavy operators. */
object PartitionUtil {

  /** Estimated scan partition count from file-source statistics alone — no
    * physical planning, no RDD materialization (`df.rdd` would force a second
    * full plan of the input per invocation and throws on streaming frames).
    * `None` when any leaf is not a file relation (in-memory test data, Kafka,
    * streaming sources), in which case the caller buys parallelism explicitly.
    */
  private def estimatedScanPartitions(df: DataFrame): Option[Long] = {
    val maxSplit = math.max(1L, df.sparkSession.sessionState.conf.filesMaxPartitionBytes)
    val perLeaf = df.queryExecution.analyzed.collectLeaves().map {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation =>
          Some(math.max(1L, (fs.location.sizeInBytes + maxSplit - 1) / maxSplit))
        case _ => None
      }
      case _ => None
    }
    if (perLeaf.nonEmpty && perLeaf.forall(_.isDefined)) Some(perLeaf.flatten.sum)
    else None
  }

  /** Ensure at least `defaultParallelism` partitions before CPU-heavy
    * per-row work. A small parquet source (single file, single row group —
    * exactly what the local fixtures are) arrives as ONE partition and
    * serializes everything downstream; one cheap shuffle of the raw rows
    * buys full parallelism. Inputs that are already wide (the 100 TB case:
    * thousands of input splits) pass through untouched — never shrink.
    *
    * Width detection is tiered by cost: file-backed plans use the statistics
    * estimate (free); other batch plans fall back to the physical partition
    * count (one extra planning pass — only the rare in-memory case pays it);
    * streaming frames can't be inspected and always buy parallelism.
    */
  def spread(df: DataFrame, byCol: String): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    val width = estimatedScanPartitions(df).orElse(
      if (df.isStreaming) None else Some(df.rdd.getNumPartitions.toLong))
    width match {
      case Some(n) if n >= parallelism => df
      case _ => df.repartition(parallelism, col(byCol))
    }
  }
}
