package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Locks the physical payoff of each layout helper: bucketed joins run with no
  * shuffle exchange, range-clustered files cover disjoint key ranges (the
  * property parquet min/max skipping needs), and directory partitioning shows
  * up as partition filters in the scan. Results always cross-checked against
  * the unclustered plain plan.
  */
class LayoutSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Temp dir deleted when the body finishes (each holds a parquet copy of a
    * fixture — repeated runs must not accumulate disk).
    */
  private def withTempDir(prefix: String)(body: String => Unit): Unit = {
    val dir = Files.createTempDirectory(prefix)
    try body(dir.toString)
    finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("bucketed tables join with no shuffle exchange and match the plain join") {
    val orders = Tables.table(spark, sf0001, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.table(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")

    Layout.writeBucketed(orders, "layout_orders_b", 8, Seq("o_orderkey"))
    Layout.writeBucketed(lineitem, "layout_lineitem_b", 8, Seq("o_orderkey"))
    // disable auto-broadcast so the test sees the merge-join path a 100 TB
    // fact-to-fact join would take, not a small-table broadcast
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Layout.bucketedJoin(spark, "layout_orders_b", "layout_lineitem_b",
        Seq("o_orderkey"))
      val p = planOf(joined)
      assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")
      assert(p.contains("SelectedBucketsCount"), s"expected bucketed scans:\n$p")

      val expected = orders.join(lineitem, "o_orderkey").count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS layout_orders_b")
      spark.sql("DROP TABLE IF EXISTS layout_lineitem_b")
    }
  }

  test("bucketed zero-exchange join holds for ORC tables too (format breadth)") {
    val orders = Tables.table(spark, sf0001, "orders")
      .select("o_orderkey", "o_totalprice")
    val lineitem = Tables.table(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")

    Layout.writeBucketed(orders, "layout_orders_orc", 8, Seq("o_orderkey"), format = "orc")
    Layout.writeBucketed(lineitem, "layout_lineitem_orc", 8, Seq("o_orderkey"), format = "orc")
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Layout.bucketedJoin(spark, "layout_orders_orc", "layout_lineitem_orc",
        Seq("o_orderkey"))
      val p = planOf(joined)
      assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
      assert(!p.contains("Exchange"), s"ORC bucketed join must not shuffle:\n$p")
      assert(joined.count() === orders.join(lineitem, "o_orderkey").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS layout_orders_orc")
      spark.sql("DROP TABLE IF EXISTS layout_lineitem_orc")
    }
  }

  test("range-clustered files cover disjoint key ranges and push the filter") {
    withTempDir("layout_clustered") { dir =>
    val orders = Tables.table(spark, sf0001, "orders")
    Layout.writeClustered(orders, dir, numFiles = 4, cols = Seq("o_custkey"))

    // the physical property row-group skipping relies on: every file owns a
    // key range no other file overlaps
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("o_custkey").as("lo"), max("o_custkey").as("hi"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(ranges.length > 1, "expected multiple files")
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"file ranges overlap: ${ranges.mkString(", ")}")
      case _ =>
    }

    val probe = ranges.head._1
    val q = spark.read.parquet(dir).filter(col("o_custkey") === probe)
    val p = planOf(q)
    assert(p.contains("PushedFilters") && p.contains("EqualTo(o_custkey"),
      s"filter must reach the parquet scan:\n$p")
    assert(q.count() === orders.filter(col("o_custkey") === probe).count())
    }
  }

  test("z-order clusters both dimensions; single-key clustering only one") {
    val orders = Tables.table(spark, sf0001, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")

    // mean fraction of the global [min,max] span a file's envelope covers,
    // per dimension — the quantity parquet min/max skipping cares about
    def meanSpans(dir: String): (Double, Double) = {
      val g = orders.agg(
        max("o_custkey").cast("double").minus(min("o_custkey")).as("ck"),
        max("o_totalprice").minus(min("o_totalprice")).as("tp")).head()
      val perFile = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(
          (max("o_custkey") - min("o_custkey")).cast("double").as("ck"),
          (max("o_totalprice") - min("o_totalprice")).as("tp"))
        .agg(avg("ck"), avg("tp")).head()
      (perFile.getDouble(0) / g.getDouble(0), perFile.getDouble(1) / g.getDouble(1))
    }

    withTempDir("layout_zorder") { zDir =>
      withTempDir("layout_singlekey") { kDir =>
        Layout.writeZOrdered(orders, zDir, numFiles = 8, "o_custkey", "o_totalprice")
        Layout.writeClustered(orders, kDir, numFiles = 8, Seq("o_custkey"))

        assert(spark.read.parquet(zDir).count() === orders.count())
        val (zCk, zTp) = meanSpans(zDir)
        val (kCk, kTp) = meanSpans(kDir)
        // single-key layout: custkey tight, totalprice envelope ≈ full span
        assert(kCk < 0.5, s"single-key layout should cluster custkey (got $kCk)")
        assert(kTp > 0.8, s"single-key layout leaves totalprice unclustered (got $kTp)")
        // z-order: BOTH envelopes strictly bounded, and totalprice far better
        assert(zCk < 0.8 && zTp < 0.8, s"z-order must bound both dims (got $zCk, $zTp)")
        assert(zTp < kTp / 2,
          s"z-order should at least halve the second-dim envelope ($zTp vs $kTp)")
      }
    }
  }

  test("directory-partitioned write prunes partitions at planning time") {
    withTempDir("layout_partitioned") { dir =>
      val orders = Tables.table(spark, sf0001, "orders")
      Layout.writePartitioned(orders, dir, Seq("o_orderstatus"))

      val q = spark.read.parquet(dir).filter(col("o_orderstatus") === "F")
      val p = planOf(q)
      assert(p.contains("PartitionFilters") && p.contains("o_orderstatus"),
        s"expected a partition filter in the scan:\n$p")
      assert(q.count() === orders.filter(col("o_orderstatus") === "F").count())
    }
  }
}
