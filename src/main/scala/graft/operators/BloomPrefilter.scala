package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semi-join reduction via a Bloom filter — the explicit form of the
  * "runtime filter" pattern.
  *
  * For `fact ⋈ dim` where most fact rows have no dim partner, the shuffle
  * moves 100 TB of fact rows only to drop them at the join. Building a Bloom
  * filter over the dim keys and applying it *before* the exchange cuts
  * shuffle volume to (match fraction + fpp) of the fact. Bloom filters have
  * no false negatives, and the exact join afterwards removes the false
  * positives, so the result is identical to the plain join (oracle-checked
  * via `bloom_prefilter_join`).
  *
  * Spark's optimizer injects the same filter automatically when
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` fires (creation-side
  * size thresholds apply); this operator is the manual form for when the
  * heuristics don't trigger, or to reuse one dim-side filter across several
  * fact scans (e.g. pre-screening a 100 TB corpus against a contamination
  * key set before any join).
  *
  * The membership probe is the codegen'd [[graft.plans.BloomMightContain]]
  * expression — it stays inside the scan stage's whole-stage-codegen loop
  * (a Scala UDF here would break the span and box every key).
  * `expectedItems`/`fpp` size the sketch — 1 M keys at 1% fpp ≈ 1.2 MB,
  * broadcast like any small-dim plan. The broadcast sketch lives until the
  * context cleaner collects it; a long-lived service should build the
  * filter once and reuse it across fact scans rather than calling this per
  * query.
  */
object BloomPrefilter {

  def prefilteredInnerJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types._
    val keyType = fact.schema(key).dataType
    keyType match {
      case ByteType | ShortType | IntegerType | LongType | StringType | BinaryType => ()
      case dt => throw new IllegalArgumentException(
        s"bloom prefilter supports integral/string/binary keys, got $dt for '$key'")
    }
    // treeAggregate on the dim side; the driver holds one sketch, not rows
    val bc = fact.sparkSession.sparkContext
      .broadcast(dim.stat.bloomFilter(key, expectedItems, fpp))
    // probe representation matches the builder's put per key type (see
    // BloomMightContain scaladoc) — false negatives would lose rows
    fact.filter(graft.plans.BloomMightContain.expr(col(key), bc))
      .join(dim, Seq(key), "inner")
  }
}
