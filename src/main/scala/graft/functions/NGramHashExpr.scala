package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: the SORTED DISTINCT 64-bit hashes of an
  * `array<string>`'s n-gram windows, in one pass — one xxHash64 per word,
  * then one n-long mix per window, sort, in-place dedup.
  *
  * This replaces the `array_sort(array_distinct(transform(shingles(...),
  * xxhash64)))` pipeline that materialized every shingle STRING through
  * interpreted higher-order functions (HOFs never enter codegen, and each
  * `element_at` on the split result re-evaluated its child) — measured
  * ~10s of the q46 runtime at sf0.1 against <1s for this expression.
  * The hash domain is internal to the similarity pipeline (blocking keys
  * and verify sets both live in it), so no string-parity with
  * `xxhash64(concat_ws(' ', ...))` is required — only determinism.
  * Spark-first preference order (b): custom `Expression` with codegen,
  * not a UDF.
  */
case class NGramHash64(child: Expression, n: Int, distinct: Boolean = true,
                       positional: Boolean = false)
    extends UnaryExpression {
  require(n >= 1, s"n-gram width must be >= 1, got $n")
  // positional keeps window order (index = window start), so sorting or
  // deduplicating would destroy exactly what the caller asked for
  require(!(distinct && positional),
    "positional n-gram hashes cannot be distinct (order is the payload)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hash64"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    NGramHash64.compute(input.asInstanceOf[ArrayData], n, distinct, positional)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.NGramHash64$$.MODULE$$.compute($arr, $n, $distinct, $positional);")

  override protected def withNewChildInternal(newChild: Expression): NGramHash64 =
    copy(child = newChild)
}

object NGramHash64 {

  /** Deterministic stand-in hash for a null array element (arbitrary
    * odd 64-bit constant, distinct from any real xxhash64 output with
    * probability 1 − 2⁻⁶⁴). */
  final val NullElementHash = 0x9E3779B97F4A7C15L

  /** Shared by interpreted eval and generated code. Word hashes use the
    * same xxHash64/seed-42 as Spark's `xxhash64`; windows mix word hashes
    * with a SplitMix64-style avalanche so "a b"/"b a" differ. With
    * `distinct = false` every window's hash is kept (sorted, duplicates
    * preserved) — the counting form for repetition metrics. With
    * `positional = true` the array is NOT sorted: element i is the hash
    * of the window STARTING at word i — the (position, window) form span
    * rewriting needs (posexplode recovers the start offsets). */
  def compute(arr: ArrayData, n: Int, distinct: Boolean = true,
              positional: Boolean = false): GenericArrayData = {
    val m = arr.numElements()
    val cnt = m - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.emptyLongArray)
    val wh = new Array[Long](m)
    var i = 0
    while (i < m) {
      val u = arr.getUTF8String(i)
      // null elements hash to a fixed sentinel: the declared input type
      // admits containsNull=true, and XxHash64Function.hash NPEs on null —
      // a caller feeding a nullable array must get a deterministic hash,
      // not a crash inside generated code
      wh(i) = if (u == null) NullElementHash
              else XxHash64Function.hash(u, StringType, 42L)
      i += 1
    }
    val out = new Array[Long](cnt)
    var s = 0
    while (s < cnt) {
      if (n == 1) out(s) = wh(s)
      else {
        var c = 0x9E3779B97F4A7C15L
        var k = 0
        while (k < n) {
          c = java.lang.Long.rotateLeft(c ^ wh(s + k), 27) * 0x9E3779B97F4A7C15L
          k += 1
        }
        // final avalanche (SplitMix64 tail)
        c = (c ^ (c >>> 30)) * 0xBF58476D1CE4E5B9L
        c = (c ^ (c >>> 27)) * 0x94D049BB133111EBL
        out(s) = c ^ (c >>> 31)
      }
      s += 1
    }
    if (positional) return new GenericArrayData(out)
    java.util.Arrays.sort(out)
    if (!distinct) return new GenericArrayData(out)
    var w = 1
    var r = 1
    while (r < cnt) {
      if (out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  def ngramHashes(words: Column, n: Int, distinct: Boolean = true,
                  positional: Boolean = false): Column =
    org.apache.spark.sql.graft.Bridge.column(
      NGramHash64(org.apache.spark.sql.graft.Bridge.expression(words), n,
        distinct, positional))
}
