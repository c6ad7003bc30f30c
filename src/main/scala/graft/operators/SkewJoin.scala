package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join handling splits oversized *sort-merge* partitions at
  * runtime, which covers most cases; explicit salting remains the tool when
  * a handful of hot keys dominate (e.g. a null-ish default key owning 1% of
  * 100 TB) or when the join is not SMJ. Standard construction:
  *
  *  - fact side: salt = deterministic hash of the whole row modulo
  *    `saltFactor`, appended to the join key
  *  - dim side: replicated `saltFactor` times (explode), so every
  *    (key, salt) bucket finds its match
  *
  * The shuffle then spreads each hot key over `saltFactor` reducers. Results
  * are identical to the unsalted join (verified in OperatorSpec).
  */
object SkewJoin {

  def saltedInnerJoin(fact: DataFrame, dim: DataFrame, key: String, saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.toIndexedSeq.map(col): _*)), lit(saltFactor)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
