package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, composed from
  * higher-order functions (`zip_with`/`aggregate`) so it stays inside
  * Catalyst codegen — no UDF boxing per element. Inputs are upcast to
  * `array<double>` once so accumulation is double-precision and matches
  * the oracle bit-for-bit (left-to-right summation).
  */
object VectorFunctions {

  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product: sum of elementwise products, left-to-right. Native
    * codegen'd loop (graft.plans.DotProduct) — the `zip_with`+`aggregate`
    * formulation allocates a products array per call and evaluates the
    * lambda interpreted, which dominated the all-pairs bench. */
  def dot(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. Where one side is reused
    * across many pairs, precompute `norm` once per vector and divide —
    * see Similarity.v2/v3. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
