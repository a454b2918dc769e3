package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression returning the value at the FIRST position
  * where two long arrays agree (`a[i] == b[i]`, smallest `i`), or
  * `Long.MinValue` if no position agrees — one linear walk, zero
  * allocation, stays inside WholeStageCodegen.
  *
  * This is the exactly-once emission rule for LSH pair generation
  * (`Dedup.minhashCandidates`): two docs sharing several band keys would
  * otherwise be emitted as a candidate pair once per shared band and need
  * a corpus-pair-sized `dropDuplicates` shuffle; instead each bucket
  * emits a pair only when its own band key IS the pair's first shared
  * band, so every candidate pair materializes exactly once with NO
  * dedup exchange. Band keys are index-salted xxhash64 values
  * (`TextOps.lshBands`), so positional comparison is the correct
  * same-band test. The sentinel can collide with a real band key only if
  * a band key equals `Long.MinValue` (p = 2⁻⁶⁴ per key) — the affected
  * pair is at worst a duplicate or dropped CANDIDATE, and the exact
  * verify stage keeps results correct.
  */
case class FirstSharedBand(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "first_shared_band"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint>, got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      val v = x.getLong(i)
      if (v == y.getLong(i)) return v
      i += 1
    }
    Long.MinValue
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val r = ctx.freshName("r")
      val v = ctx.freshName("v")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $r = java.lang.Long.MIN_VALUE;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $v = $x.getLong($i);
         |  if ($v == $y.getLong($i)) { $r = $v; break; }
         |}
         |${ev.value} = $r;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstSharedBand =
    copy(left = newLeft, right = newRight)
}

object FirstSharedBand {
  def first(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      FirstSharedBand(org.apache.spark.sql.graft.Bridge.expression(a),
        org.apache.spark.sql.graft.Bridge.expression(b)))
}
