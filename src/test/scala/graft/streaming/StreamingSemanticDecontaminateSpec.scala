package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

class StreamingSemanticDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val near = Array(1.0f, 2.0f, 3.0f, 4.0f, 0.3f, 1.5f, 2.5f, 0.7f)
  private val hold = { val h = near.clone(); h(4) = 0.0f; h } // cos ~ 0.997
  private val ortho = Array(-4.0f, 3.0f, -2.0f, 1.0f, -1.0f, 0.5f, -0.5f, 2.0f)

  test("semantic gate: near-holdout vectors dropped per batch, others pass; foreachBatch drive") {
    val dir = Files.createTempDirectory("sem-decontam-index").toString
    val gate = new StreamingSemanticDecontaminate(dir, threshold = 0.9)
    gate.buildIndex(Seq((1000L, hold.toSeq)).toDF("vec_id", "embedding"))

    // batch path: the paraphrase-embedding drops, the orthogonal one passes,
    // and extra columns survive the gate untouched
    val admitted = gate.processBatch(spark,
      Seq((1L, near.toSeq, "a"), (2L, ortho.toSeq, "b"))
        .toDF("vec_id", "embedding", "label"))
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(admitted == Set((2L, "b")), s"semantic gate admitted $admitted")

    // streaming == batch: drive the same rows through a real foreachBatch query
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val out = scala.collection.mutable.Set.empty[Long]
    val q = input.toDS().toDF("vec_id", "embedding").writeStream
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("sem-decontam-ckpt").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        out ++= gate.processBatch(spark, b).collect().map(_.getLong(0))
        ()
      }
      .start()
    input.addData((20L, near.toSeq), (21L, ortho.toSeq))
    q.processAllAvailable()
    q.stop()
    assert(out.toSet == Set(21L), s"streaming admitted $out")

    // parity with the batch operator on the same fixture
    val batchSurvivors = graft.operators.Similarity.applySemanticDecontamination(
        Seq((20L, near.toSeq), (21L, ortho.toSeq)).toDF("vec_id", "embedding"),
        Seq((1000L, hold.toSeq)).toDF("vec_id", "embedding"), threshold = 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(batchSurvivors == out.toSet, "streaming gate must equal the batch apply")
    gate.close()
  }

  test("semantic gate: incompatible index schema fails loudly with a rebuild instruction") {
    val dir = Files.createTempDirectory("sem-decontam-bad").toString
    Seq((1L, "x")).toDF("vec_id", "not_embedding")
      .write.mode("overwrite").parquet(dir)
    val gate = new StreamingSemanticDecontaminate(dir)
    val e = intercept[IllegalStateException] {
      gate.processBatch(spark, Seq((1L, near.toSeq)).toDF("vec_id", "embedding")).collect()
    }
    assert(e.getMessage.contains("buildIndex"))
  }
}
