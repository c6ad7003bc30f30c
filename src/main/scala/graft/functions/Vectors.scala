package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.plans.VectorExpressions

/** Vector math over `ARRAY<FLOAT>` / `ARRAY<DOUBLE>` embedding columns.
  *
  * [[dot]]/[[norm]]/[[cosine]] use the codegen'd Catalyst expression
  * (graft.plans.DotProduct) — a primitive loop inside whole-stage codegen.
  * [[foldDot]] is the higher-order-function formulation kept as the semantic
  * reference: both are strict left-to-right double summations, so they are
  * bit-identical (a property the DuckDB oracle relies on).
  */
object Vectors {

  /** Σ a_i * b_i, accumulated in double (codegen'd). */
  def dot(a: Column, b: Column): Column = VectorExpressions.dot(a, b)

  /** L2 norm, accumulated in double. */
  def norm(a: Column): Column = sqrt(VectorExpressions.dot(a, a))

  /** Cosine similarity in [-1, 1]; null-safe only insofar as inputs are. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Reference implementation via zip_with + aggregate (interpreted). */
  def foldDot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)
}
