package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression computing Σ aᵢ·bᵢ over two numeric arrays
  * (float or double elements), accumulating in double — the hot primitive
  * under every cosine score in the similarity family.
  *
  * Why not higher-order functions: `aggregate(zip_with(a, b, _*_), 0, +)`
  * allocates an intermediate array and evaluates 2·dim interpreted
  * lambdas per pair (HOF lambdas never enter codegen — see
  * [[MinHashSig]]'s measurements); this expression is a tight generated
  * fused multiply-add loop, zero allocation. Element order and
  * float→double promotion match the HOF formulation exactly, so scores
  * are bit-identical and the DuckDB oracles are unaffected.
  *
  * Elements must be non-null (embedding vectors are dense); length
  * mismatch truncates to the shorter side.
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  private def elemOf(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemOf(left.dataType), elemOf(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double>, got " +
          s"${left.dataType} / ${right.dataType}")
    }

  private def isFloat(e: Expression): Boolean =
    elemOf(e.dataType).contains(FloatType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = isFloat(left)
    val rf = isFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      def getter(arr: String, idx: String, e: Expression): String =
        if (isFloat(e)) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${getter(x, i, left)} * ${getter(y, i, right)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorDot {
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      VectorDot(org.apache.spark.sql.graft.Bridge.expression(a),
        org.apache.spark.sql.graft.Bridge.expression(b)))
}
