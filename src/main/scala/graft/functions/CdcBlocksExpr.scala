package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: a document's CONTENT-DEFINED blocks in one
  * projection over its word array.
  *
  * Boundary rule (shared byte-for-byte with the DuckDB oracle): a block
  * ends AFTER any word whose md5 hex digest starts with '0' or '1'
  * (first digest byte < 0x20, p = 1/8 → ~8-word expected blocks), so
  * boundaries are a function of content alone and re-align immediately
  * after an insertion/deletion — the content-defined-chunking idea from
  * dedup storage, applied at word granularity.
  *
  * This replaces the `posexplode` → per-doc running-sum window →
  * (doc, seg) assembly-aggregate chain that segmentation previously ran:
  * that chain shuffled the corpus WORD-BY-WORD (14.5–17.9 MiB at sf0.1 vs
  * the fixed-width family's 1.7 MiB for the same 10k docs — SHUFFLES.md),
  * ~10× overhead carried by every CDC variant. Here segmentation never
  * leaves the scan-stage projection: one md5 per word, one pass, blocks
  * emitted as an `array<string>` that stays inside whole-stage codegen.
  * The pure-HOF formulation was tried earlier and measured 10–25× SLOWER
  * (interpreted lambdas outside codegen — SCALE.md); a native expression
  * is the only formulation that is both shuffle-free and codegen'd.
  */
case class CdcBlocks(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_blocks"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    CdcBlocks.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.CdcBlocks$$.MODULE$$.compute($arr);")

  override protected def withNewChildInternal(newChild: Expression): CdcBlocks =
    copy(child = newChild)
}

/** `cdc_select(ws, segs)`: re-derive the word array's CDC blocks locally
  * and join the blocks at the given (sorted) segment ordinals with a
  * single space — the reassembly step of the hash-keyed CDC dedup
  * variants. Taking the WORD ARRAY (not a pre-computed blocks column)
  * matters: a projected `blocks` alias referenced inside a higher-order
  * `transform` lambda gets inlined by `CollapseProject` and re-evaluated
  * per element — the exact re-evaluation trap [[NGramHash64]] documents.
  * One native call per document avoids both the HOF and the inlining.
  * Out-of-range or null ordinals are skipped (like `array_join` skips
  * null elements); an empty ordinal array yields "".
  */
case class CdcSelect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "cdc_select"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<int>), got ($l, $r)")
    }

  override protected def nullSafeEval(ws: Any, segs: Any): Any =
    CdcBlocks.select(ws.asInstanceOf[ArrayData], segs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ws, segs) =>
      s"${ev.value} = graft.functions.CdcBlocks$$.MODULE$$.select($ws, $segs);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CdcSelect =
    copy(left = newLeft, right = newRight)
}

object CdcBlocks {

  private val Sep = UTF8String.fromString(" ")

  /** MD5 is not thread-safe and costs an allocation per `getInstance`;
    * executor task threads each keep one. */
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First hex char of md5(word) is '0' or '1' ⇔ first digest byte
    * < 0x20. Null words (can't come from `split`, but the declared input
    * type admits them) are never boundaries. */
  private def isBoundary(w: UTF8String): Boolean = {
    val d = md5.get()
    d.reset()
    (d.digest(w.getBytes)(0) & 0xFF) < 0x20
  }

  /** Shared by interpreted eval and generated code: one md5 per word,
    * one pass, blocks joined with " ". A trailing flagged word closes
    * its block and opens nothing — no empty trailing block (matching the
    * window formulation, where segments exist only if a word lands in
    * them). An empty array yields an empty block array. */
  def compute(arr: ArrayData): GenericArrayData = {
    val m = arr.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    var i = 0
    while (i < m) {
      val w = arr.getUTF8String(i)
      if (w != null && isBoundary(w)) {
        out += joinRange(arr, start, i + 1)
        start = i + 1
      }
      i += 1
    }
    if (start < m) out += joinRange(arr, start, m)
    new GenericArrayData(out.toArray)
  }

  /** [[CdcSelect]]'s kernel: blocks at `segs` ordinals joined with " ". */
  def select(ws: ArrayData, segs: ArrayData): UTF8String = {
    val blocks = compute(ws)
    val nb = blocks.numElements()
    val n = segs.numElements()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      if (!segs.isNullAt(i)) {
        val s = segs.getInt(i)
        if (s >= 0 && s < nb) parts(i) = blocks.getUTF8String(s)
      }
      i += 1
    }
    UTF8String.concatWs(Sep, parts: _*)
  }

  private def joinRange(arr: ArrayData, from: Int, until: Int): UTF8String = {
    val parts = new Array[UTF8String](until - from)
    var j = from
    while (j < until) {
      parts(j - from) = arr.getUTF8String(j)
      j += 1
    }
    UTF8String.concatWs(Sep, parts: _*)
  }

  def cdcBlocks(words: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      CdcBlocks(org.apache.spark.sql.graft.Bridge.expression(words)))

  def cdcSelect(words: Column, segs: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      CdcSelect(org.apache.spark.sql.graft.Bridge.expression(words),
        org.apache.spark.sql.graft.Bridge.expression(segs)))
}
