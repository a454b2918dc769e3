package graft.plans

import graft.functions.{CdcBlocks, CdcSelect, FirstSharedBand, MinHashSig,
  NGramHash64, NGramStrings, SimHash64, SortedIntersectCount, VectorDot}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.SparkSessionExtensions

/** Session extensions for the engine — the standard deployment hook
  * (`--conf spark.sql.extensions=graft.plans.GraftExtensions`):
  *
  *  - [[WhenChainToMap]] optimizer rule (CASE-ladder → map lookup);
  *  - [[RangeJoinBinning]] optimizer rule (inequality-only interval
  *    join → binned equi-join, opt-in via its bin-width conf);
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
    ext.injectOptimizerRule(_ => RangeJoinBinning)
    GraftExtensions.descriptors.foreach(ext.injectFunction)
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

  private def descriptor(name: String, clazz: Class[_])(
      builder: PartialFunction[Seq[Expression], Expression])(usage: String):
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(clazz.getName, name),
    (args: Seq[Expression]) => builder.applyOrElse(args,
      (_: Seq[Expression]) => throw new IllegalArgumentException(usage)))

  /** The full native-function surface for `spark.sql` users — every
    * config-free codegen'd expression the DataFrame API exposes through
    * TextOps/Dedup. (Expressions needing non-literal state — a CMS
    * sketch blob, a vocabulary — stay DataFrame-only: SQL literals can't
    * carry them.) */
  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    minhashSigDescriptor,
    vectorDotDescriptor,
    descriptor("simhash64", classOf[SimHash64]) {
      case Seq(arr) => SimHash64(arr)
    }("simhash64(tokens: array<string>)"),
    descriptor("ngram_hash64", classOf[NGramHash64]) {
      case Seq(arr, Literal(n: Int, _)) => NGramHash64(arr, n)
      case Seq(arr, Literal(n: Int, _), Literal(d: Boolean, _)) =>
        NGramHash64(arr, n, distinct = d)
    }("ngram_hash64(words: array<string>, n: int literal[, distinct: bool literal])"),
    descriptor("ngram_strings", classOf[NGramStrings]) {
      case Seq(arr, Literal(n: Int, _)) => NGramStrings(arr, n)
    }("ngram_strings(words: array<string>, n: int literal)"),
    descriptor("sorted_intersect_count", classOf[SortedIntersectCount]) {
      case Seq(a, b) => SortedIntersectCount(a, b)
    }("sorted_intersect_count(a: array<bigint> sorted, b: array<bigint> sorted)"),
    descriptor("first_shared_band", classOf[FirstSharedBand]) {
      case Seq(a, b) => FirstSharedBand(a, b)
    }("first_shared_band(a: array<bigint>, b: array<bigint>)"),
    descriptor("cdc_blocks", classOf[CdcBlocks]) {
      case Seq(arr) => CdcBlocks(arr)
    }("cdc_blocks(words: array<string>)"),
    descriptor("cdc_select", classOf[CdcSelect]) {
      case Seq(a, b) => CdcSelect(a, b)
    }("cdc_select(words: array<string>, kept_segs: array<int>)"))

  /** Register into an existing session's function registry. */
  def registerFunctions(registry: FunctionRegistry): Unit =
    descriptors.foreach {
      case (id, info, builder) => registry.registerFunction(id, info, builder)
    }
}
