package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Optimization-round plan artifact dumper: writes `.explain("formatted")`
  * output for the named queries to `<outDir>/<query>_<tag>.txt` so plan
  * claims in OPTIMIZATION_r*.md are checkable without running Spark.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <tag> <query>[,query...]
  *
  * The dump is the PRE-execution plan (AdaptiveSparkPlan isFinalPlan=false):
  * deterministic, runnable without executing the query, and sufficient for
  * the shape claims the optimization notes make (Exchange count, join
  * strategy, PushedFilters/ReadSchema, codegen spans). Queries whose
  * operators take internal eager barriers (localCheckpoint brackets) execute
  * those stages as a side effect of planning the final frame — unavoidable,
  * and harmless here (this main is never timed).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: runMain graft.PlanDump <sfDir> <outDir> <tag> <query>[,query...]")
    val Array(sfDir, outDir, tag, names) = args.take(4)
    val cpus = Graft.defaultCpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val queries = names.split(",").toSeq
    val unknown = queries.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    queries.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), plan)
      println(s"wrote $outDir/${name}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
