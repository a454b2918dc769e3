package graft.plans

import graft.functions.{MinHashSig, VectorDot}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.SparkSessionExtensions

/** Session extensions for the engine — the standard deployment hook
  * (`--conf spark.sql.extensions=graft.plans.GraftExtensions`):
  *
  *  - [[WhenChainToMap]] optimizer rule (CASE-ladder → map lookup);
  *  - SQL registration of the native `minhash_sig(arr, k)` and
  *    `vector_dot(a, b)` expressions so `spark.sql` users get the
  *    codegen'd versions too.
  *
  * For an already-running session the rule can also be attached via
  * `spark.experimental.extraOptimizations` (what the specs use).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => WhenChainToMap)
    ext.injectFunction(GraftExtensions.minhashSigDescriptor)
    ext.injectFunction(GraftExtensions.vectorDotDescriptor)
  }
}

object GraftExtensions {

  val minhashSigDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
    (args: Seq[Expression]) => args match {
      case Seq(arr, Literal(k: Int, _)) => MinHashSig(arr, k)
      case Seq(arr) => MinHashSig(arr, 16)
      case _ => throw new IllegalArgumentException(
        "minhash_sig(array<string>[, k: int literal])")
    })

  val vectorDotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vector_dot"),
    new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
    (args: Seq[Expression]) => args match {
      case Seq(a, b) => VectorDot(a, b)
      case _ => throw new IllegalArgumentException(
        "vector_dot(a: array<float|double>, b: array<float|double>)")
    })

  /** Register into an existing session's function registry. */
  def registerFunctions(registry: FunctionRegistry): Unit =
    Seq(minhashSigDescriptor, vectorDotDescriptor).foreach {
      case (id, info, builder) => registry.registerFunction(id, info, builder)
    }
}
