package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: numericalize a token array against a fixed
  * vocabulary — `["the","cat"] → [1, 0]` (id per token, 0 = OOV) — in one
  * codegen'd projection.
  *
  * The vocabulary is a plan-carried lookup table (driver-built, capped by
  * the vocab-size parameter, shipped once per executor via the expression's
  * reference array), NOT a join: the straightforward
  * posexplode→join-vocab→re-group-ordered pipeline shuffles the entire
  * token stream keyed by doc to restore order — at 100 TB that's the
  * corpus, twice. The HOF alternative (`transform(ws,
  * element_at(map_literal, _))`) stays shuffle-free but
  * `ArrayBasedMapData` lookups are LINEAR in the vocab (O(V) per token,
  * interpreted) — a 50k-entry vocab makes that ~10⁴ slower than this
  * expression's per-token hash probe. Same preference-order-(b) reasoning
  * as [[NGramHash64]]/[[CdcBlocks]].
  */
case class VocabEncode(child: Expression, vocab: Seq[(String, Int)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "vocab_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got $other")
    }

  /** Executor-side probe table; rebuilt once per deserialized expression
    * (UTF8String keys so probes never re-decode the scanned bytes). */
  @transient private lazy val lookup: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](vocab.size * 2)
    vocab.foreach { case (w, id) => m.put(UTF8String.fromString(w), id) }
    m
  }

  override protected def nullSafeEval(input: Any): Any =
    VocabEncode.compute(input.asInstanceOf[ArrayData], lookup)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the probe table rides the generated class's references array —
    // built driver-side, serialized once with the plan, shared by all
    // rows of the task (the standard literal-side-data codegen pattern)
    val mapRef = ctx.addReferenceObj("vocabLookup", lookup,
      "java.util.HashMap<org.apache.spark.unsafe.types.UTF8String, Integer>")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.VocabEncode$$.MODULE$$.compute($arr, $mapRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): VocabEncode =
    copy(child = newChild)
}

object VocabEncode {

  /** Shared by interpreted eval and generated code: one hash probe per
    * token; unknown and null tokens encode as 0 (OOV). */
  def compute(arr: ArrayData,
      lookup: java.util.HashMap[UTF8String, Integer]): GenericArrayData = {
    val m = arr.numElements()
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val w = arr.getUTF8String(i)
      val id = if (w == null) null else lookup.get(w)
      out(i) = if (id == null) 0 else id.intValue()
      i += 1
    }
    new GenericArrayData(out)
  }

  def vocabEncode(words: Column, vocab: Seq[(String, Int)]): Column =
    org.apache.spark.sql.graft.Bridge.column(
      VocabEncode(org.apache.spark.sql.graft.Bridge.expression(words), vocab))
}
