package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` columns, built from Catalyst
  * higher-order functions (`transform`/`zip_with`/`aggregate`) so the whole
  * computation stays inside codegen — no UDF serialization, no Python.
  *
  * Elements are cast to double BEFORE any arithmetic (FIXTURES.md hazard 3:
  * the corpus stores float32; fold order + widening must match the oracle's
  * `CAST(embedding AS DOUBLE[])`).
  */
object VectorFunctions {

  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Σ aᵢ·bᵢ — inputs must already be array<double>. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0d), (acc, x) => acc + x)

  /** Σ aᵢ² (squared L2 norm). */
  def normSq(a: Column): Column =
    aggregate(transform(a, x => x * x), lit(0d), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity dot(a,b)/(|a||b|) over array<double> inputs.
    * Zero-norm operands yield 0.0, matching the native
    * [[graft.functions.expressions.CosineSimilarity]] — NaN would
    * satisfy every `>= tau` filter under Spark's NaN-is-largest
    * ordering. */
  def cosine(a: Column, b: Column): Column = {
    val denom = sqrt(normSq(a)) * sqrt(normSq(b))
    when(denom === 0d, lit(0d)).otherwise(dot(a, b) / denom)
  }
}
