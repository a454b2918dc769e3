package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash over an `array<string>` token column: per token
  * one md5 digest, ±1 vote per bit position weighted by term frequency
  * (tokens arrive non-distinct), sign of each vote sets the output bit.
  *
  * Bit sources are the md5 hex prefix split into two 60-bit ints
  * ([[PortableHash.hi60]]/[[PortableHash.lo60]]): bits 0–59 of the
  * signature come from hi60, bits 60–63 from the low 4 bits of lo60 —
  * a fixed convention chosen because a DuckDB oracle can replay it
  * exactly (md5 hex → positional polynomial → `>>`/`&`), which is what
  * upgraded q57/q65 from golden-pinned to hash-compared.
  *
  * Same rationale as [[MinHashSig]] for being a native expression: the
  * higher-order-function rendition (64 interpreted lambda folds per row)
  * is orders of magnitude slower and capped the practical width at 16
  * bits; this does O(|tokens|·64) long ops per row in one JVM loop.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHash64.compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.SimHash64$$.MODULE$$.compute($arr);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** Term-frequency-weighted bit votes over the portable md5-derived bit
    * sources; shared by the interpreted and generated paths. */
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val d = PortableHash.md5Of(arr.getUTF8String(i))
      val h1 = PortableHash.hi60(d)
      val h2 = PortableHash.lo60(d)
      var b = 0
      while (b < 60) {
        if (((h1 >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      while (b < 64) {
        if (((h2 >>> (b - 60)) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def simhash64(tokens: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      SimHash64(org.apache.spark.sql.graft.Bridge.expression(tokens)))
}
