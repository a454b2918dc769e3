package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns. The multiply-
  * accumulate core is the native [[VectorDot]] Catalyst expression
  * (`doGenCode`, zero allocation) — the HOF formulation
  * (`aggregate(zip_with(...))`) evaluates 2·dim interpreted lambdas per
  * pair and is kept only as [[hofDot]] for the parity spec. Callers must
  * precompute norms once per row (see `Similarity`), never per pair.
  *
  * All arithmetic is promoted to double BEFORE multiply/accumulate so
  * results are reproducible against engines that compute in float64
  * (the DuckDB oracle casts element-wise the same way); the native
  * expression accumulates in the same element order, so scores are
  * bit-identical to the HOF version.
  */
object VectorOps {

  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column = VectorDot.dot(a, b)

  def norm(v: Column): Column = sqrt(VectorDot.dot(v, v))

  /** Reference HOF rendition — interpreted; parity-tested vs [[dot]]. */
  private[graft] def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), _ * _), lit(0.0), _ + _)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** 1-bit sign quantization of the first `bits` dimensions — an
    * axis-aligned random-hyperplane LSH; used as the coarse bucket for
    * ANN search (IVF-style: probe only the query's bucket). */
  def signBucket(v: Column, bits: Int): Column =
    (0 until bits).map { i =>
      when(element_at(v, i + 1) >= 0f, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
}
