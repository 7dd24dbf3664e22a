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

  /** Dot product: sum of elementwise products, left-to-right. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))
}
