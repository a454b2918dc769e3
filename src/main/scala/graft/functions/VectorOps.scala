package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * higher-order functions (`transform`/`zip_with`/`aggregate`) — no UDFs,
  * so columns prune/push down normally. NOTE: HOF lambdas do NOT enter
  * WholeStageCodegen (they evaluate interpreted; see the measurements in
  * `MinHashSig`'s scaladoc) — adequate for the scored-candidate volumes
  * the blocked ANN paths produce, but a hot full-scan loop should use a
  * native `Expression` with `doGenCode` like `MinHashSig`. Callers must
  * precompute norms once per row (see `Similarity`), never per pair.
  *
  * All arithmetic is promoted to double BEFORE multiply/accumulate so
  * results are reproducible against engines that compute in float64
  * (the DuckDB oracle casts element-wise the same way).
  */
object VectorOps {

  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), _ * _), lit(0.0), _ + _)

  def norm(v: Column): Column =
    sqrt(aggregate(toDouble(v), lit(0.0), (acc, x) => acc + x * x))

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
