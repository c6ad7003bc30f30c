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
  * The membership probe is a Scala UDF (off-codegen): ~100 ns/row against
  * the I/O and network it saves. `expectedItems`/`fpp` size the sketch —
  * 1 M keys at 1% fpp ≈ 1.2 MB, broadcast like any small-dim plan.
  */
object BloomPrefilter {

  def prefilteredInnerJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    // treeAggregate on the dim side; the driver holds one sketch, not rows
    val bloom = dim.stat.bloomFilter(key, expectedItems, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((k: Long) => bc.value.mightContainLong(k))
    fact.filter(mightContain(col(key))).join(dim, Seq(key), "inner")
  }
}
