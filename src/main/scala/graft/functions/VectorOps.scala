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

  /** Deterministic Rademacher (±1-component) hyperplanes from a SplitMix64
    * bit stream — the random-hyperplane cosine-LSH family (public:
    * SimHash-for-vectors). ±1 components keep the projection expressible
    * as a literal-list dot product in the DuckDB oracle. */
  private[graft] def hyperplane(i: Int, dim: Int): Seq[Double] = {
    var x = 0xD1B54A32D192ED03L + i.toLong * 0x9E3779B97F4A7C15L
    def next(): Long = {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    Seq.tabulate(dim) { j =>
      if (((next() >>> (j % 64)) & 1L) == 1L) 1.0 else -1.0
    }
  }

  /** 1-bit sign quantization against `bits` random hyperplanes — the
    * coarse cell for ANN search. Random projections mix ALL dimensions,
    * so they beat axis-aligned sign bits wherever a raw component sits
    * near zero (measured 2× the recall, 0.10 → 0.20, on the sf0.1
    * corpus). A SINGLE table is inherently recall-capped at wide
    * neighbor angles (~60° here): collision probability per hyperplane
    * is 1−θ/π ≈ 0.66, so 8 bits retain ~20% at hamming ≤ 1 —
    * `Similarity.annTopK` OR-amplifies across `tableOffset`-separated
    * independent tables (1−(1−p₁)^L) to buy recall back; clustered
    * corpora can instead take the IVF path (`Similarity.ivfTopK`,
    * measured recall 1.0 on the same corpus). Projections use the native
    * [[VectorDot]]; `tableOffset` selects a disjoint hyperplane range so
    * each table's bits are independent draws of the same family. */
  def signBucket(v: Column, bits: Int, dim: Int = 64, tableOffset: Int = 0): Column =
    (0 until bits).map { i =>
      when(VectorDot.dot(v, typedLit(hyperplane(tableOffset + i, dim))) >= 0d,
        lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
}
