package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the space-joined n-gram window STRINGS of
  * an `array<string>`, in one pass — `NGramHash64`'s sibling for
  * operators whose OUTPUT is the gram text (collocation mining, gram
  * frequency tables) rather than an internal hash key.
  *
  * Replaces `TextOps.shingles` (a `transform(sequence, concat_ws(
  * element_at ...))` pipeline) on hot paths: higher-order functions never
  * enter whole-stage codegen and each `element_at` re-walks the array —
  * measured ~2.5s of q81's ~3s at sf0.1 for the HOF form; this
  * expression's single generated call removes the codegen break.
  * Identical output: windows in document order, duplicates preserved,
  * `m < n` → empty array, null elements rendered as empty string
  * (`concat_ws` semantics).
  */
case class NGramStrings(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_strings"

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
    NGramStrings.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.NGramStrings$$.MODULE$$.compute($arr, $n);")

  override protected def withNewChildInternal(newChild: Expression): NGramStrings =
    copy(child = newChild)
}

object NGramStrings {

  private val Space = UTF8String.fromString(" ")
  private val Empty = UTF8String.fromString("")

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, n: Int): GenericArrayData = {
    val m = arr.numElements()
    val cnt = m - n + 1
    if (cnt <= 0) return new GenericArrayData(new Array[AnyRef](0))
    // fetch each word once (element_at in the HOF form re-walked the
    // array per access); null elements render as "" like concat_ws
    val ws = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      val u = arr.getUTF8String(i)
      ws(i) = if (u == null) Empty else u
      i += 1
    }
    val out = new Array[AnyRef](cnt)
    var s = 0
    while (s < cnt) {
      out(s) =
        if (n == 1) ws(s)
        else UTF8String.concatWs(Space, java.util.Arrays.copyOfRange(ws, s, s + n): _*)
      s += 1
    }
    new GenericArrayData(out)
  }

  def ngramStrings(words: Column, n: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      NGramStrings(org.apache.spark.sql.graft.Bridge.expression(words), n))
}
