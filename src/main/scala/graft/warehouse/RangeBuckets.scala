package graft.warehouse

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Row}

/** Deterministic range bucketing with DRIVER-PINNED bounds — the shared
  * machinery behind [[Ffill.forwardFill]] and the fact key/SK exchange
  * ([[graft.ibrd.IbrdWarehouse]]).
  *
  * `repartitionByRange` + `spark_partition_id()` gives globally-ordered
  * partitions, but the sampled bounds and the pid are execution-dependent:
  * any SECOND evaluation (or task retry) may disagree, so every consumer
  * beyond the first forces a full-width materialization purely as a
  * determinism guard. Pinning the bounds once on the driver turns the
  * bucket id into a PURE FUNCTION of the key: every evaluation — and every
  * retry — agrees with nothing cached, so the narrow side-aggregates
  * (carry values, per-bucket counts) can run straight off the unmaterialized
  * input with full column pruning.
  *
  * Bucket balance depends on the key sample like any range exchange; a
  * skewed sample degrades parallelism, never correctness (equal keys can
  * never straddle a strict `>` bound). */
object RangeBuckets {

  /** Bucket id for the order key: sample the keys once (column-pruned
    * pass), pin ≤ n−1 distinct bounds as literals, and fold strict tuple
    * comparisons — pid = #bounds below the row's key. Returns
    * (pid expression, bucket count). The trailing `pmod(xxhash64(key), 1)`
    * term is constant 0 but non-foldable, keeping a window partition spec
    * alive even when the sample yields zero bounds (single-bucket
    * degenerate case). */
  def pidExpr(df: DataFrame, orderCols: Seq[String], n: Int): (Column, Int) = {
    val keys = orderCols.map(col)
    val bounds: Seq[Row] =
      if (n <= 1) Nil
      else {
        // ~40 samples per target bucket; fraction from a cheap pruned count
        val cnt = math.max(df.select(keys: _*).count(), 1L)
        val fraction = math.min(1.0, (n * 40.0) / cnt.toDouble)
        val sampled = df.select(keys: _*).sample(withReplacement = false,
          fraction, seed = 42L).collect()
        implicit val ord: Ordering[Row] = rowOrdering(orderCols.length)
        val sorted = sampled.sorted.distinct
        if (sorted.length < 2) Nil
        else (1 until n).map(i => sorted((i * sorted.length) / n))
          .distinct.filterNot(_ == sorted.head)
      }
    val zero = pmod(xxhash64(keys.head), lit(1L)).cast("int")
    val pid = bounds.foldLeft(zero) { (acc, b) =>
      acc + when(gtTuple(orderCols, b), 1).otherwise(0)
    }
    (pid, bounds.length + 1)
  }

  /** Strict lexicographic `key > bound` over the order columns with the
    * bound's values inlined as literals; null key components compare as
    * smallest (when() treats a null comparison as false), matching
    * nulls-first ascending sort order. */
  private def gtTuple(orderCols: Seq[String], bound: Row): Column =
    orderCols.zipWithIndex.foldRight(lit(false): Column) {
      case ((c, i), rest) =>
        val b = bound.get(i)
        if (b == null) col(c).isNotNull || (col(c).isNull && rest)
        else col(c) > lit(b) || (col(c) === lit(b) && rest)
    }

  /** Driver-side ordering matching Spark's nulls-first ascending sort. */
  private def rowOrdering(width: Int): Ordering[Row] = new Ordering[Row] {
    def compare(a: Row, b: Row): Int = {
      var i = 0
      while (i < width) {
        val (x, y) = (a.get(i), b.get(i))
        val c =
          if (x == null && y == null) 0
          else if (x == null) -1
          else if (y == null) 1
          else (x, y) match {
            case (p: String, q: String) => p.compareTo(q)
            case (p: java.lang.Number, q: java.lang.Number) =>
              java.lang.Double.compare(p.doubleValue(), q.doubleValue())
            case (p: Comparable[Any] @unchecked, q) => p.compareTo(q)
          }
        if (c != 0) return c
        i += 1
      }
      0
    }
  }
}
