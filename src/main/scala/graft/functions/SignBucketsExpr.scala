package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression computing ALL `tables` sign-LSH cell ids of
  * a vector in one pass: table t's bucket is the `bits`-wide sign pattern
  * of the vector against hyperplanes `t*bits .. t*bits+bits-1`
  * ([[VectorOps.hyperplane]], the same constants the SQL oracles inline).
  *
  * Why an expression and not `bits × tables` `when(dot ≥ 0)` columns: the
  * column formulation inlines one generated dot-product loop per
  * hyperplane — at 8 tables × 8 bits × 64-dim literals the surrounding
  * explode's `doConsume` method passes Janino's 64 KB limit and the whole
  * stage silently falls back to interpreted mode (observed on q59). Here
  * codegen emits ONE static call; the hyperplane family is materialized
  * once per (bits, tables, dim) shape on each executor.
  */
case class SignBuckets(child: Expression, bits: Int, tables: Int, dim: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 30, s"bits=$bits")
  require(tables >= 1, s"tables=$tables")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "sign_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got $other")
  }

  private def isFloat: Boolean =
    child.dataType == ArrayType(FloatType, containsNull = false) ||
      child.dataType == ArrayType(FloatType, containsNull = true)

  override protected def nullSafeEval(input: Any): Any =
    SignBuckets.compute(input.asInstanceOf[ArrayData], bits, tables, dim, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.SignBuckets$$.MODULE$$" +
        s".compute($arr, $bits, $tables, $dim, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): SignBuckets =
    copy(child = newChild)
}

object SignBuckets {

  /** Hyperplane family for a (bits, tables, dim) shape, materialized once
    * per executor JVM and shared across rows. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]()

  private def planes(bits: Int, tables: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((bits, tables, dim), { case (b, t, d) =>
      Array.tabulate(t * b)(i => VectorOps.hyperplane(i, d).toArray)
    })

  /** Shared by interpreted eval and generated code. */
  def compute(arr: ArrayData, bits: Int, tables: Int, dim: Int,
              isFloat: Boolean): GenericArrayData = {
    val hs = planes(bits, tables, dim)
    val n = math.min(arr.numElements(), dim)
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var b = 0
      while (b < bits) {
        val h = hs(t * bits + b)
        var s = 0.0
        var i = 0
        while (i < n) {
          val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          s += v * h(i)
          i += 1
        }
        if (s >= 0d) bucket |= 1 << b
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  def buckets(v: Column, bits: Int, tables: Int, dim: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      SignBuckets(org.apache.spark.sql.graft.Bridge.expression(v),
        bits, tables, dim))
}
