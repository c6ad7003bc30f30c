package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT>` embedding columns.
  *
  * v1 composes Spark higher-order functions (`zip_with` + `aggregate`), which
  * evaluate as a strict left-to-right fold — deterministic summation order,
  * which is what lets the DuckDB oracle reproduce results bit-for-bit before
  * rounding. A codegen'd Catalyst Expression variant is the planned fast path
  * for the 100 TB bench (higher-order functions don't participate in
  * whole-stage codegen); semantics are pinned here first.
  */
object Vectors {

  /** Σ a_i * b_i, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm, accumulated in double. */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity in [-1, 1]; null-safe only insofar as inputs are. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
