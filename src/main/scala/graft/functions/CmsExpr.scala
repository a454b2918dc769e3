package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Native Catalyst expression: per-row Count-Min-Sketch frequency estimate
  * of a 64-bit key.
  *
  * The serialized sketch rides in the expression as a constructor constant
  * — the same plan-shipped-constant shape as Spark's own
  * `BloomFilterMightContain` uses for its filter — and each executor
  * deserializes it once (lazily) and probes it from generated code. CMS
  * estimates can only OVERcount (depth-wise min of hashed counters), so an
  * `estimate >= t` prefilter keeps every key whose true count reaches `t`;
  * an exact downstream aggregate drops the overcounted impostors. That
  * prune-then-confirm pair is q97's heavy-hitter contract (same structure
  * as the q96 Bloom decontamination path).
  *
  * The probe boxes the key (`estimateCount(Object)` is the sketch's public
  * API); the box does not escape and the probe sits beside an explode that
  * already allocates per row, so it does not change the hot path's
  * allocation class.
  */
case class CmsEstimate(child: Expression, sketchBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires bigint, got $other")
    }

  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(sketchBytes)

  override protected def nullSafeEval(input: Any): Any =
    sketch.estimateCount(input.asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", sketch,
      classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $ref.estimateCount(java.lang.Long.valueOf($v));")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}

object CmsEstimate {

  /** Build a serialized Count-Min Sketch over a Long column with Spark's
    * own sketch aggregate (`CountMinSketchAgg` — merge-able partials, one
    * constant-size result row). `eps` is the overcount bound as a fraction
    * of the stream length (estimate ≤ true + eps·N with the given
    * confidence); width = ⌈2/eps⌉ counters × depth rows. */
  def buildLongCms(rel: org.apache.spark.sql.DataFrame, colName: String,
                   eps: Double = 1e-4, confidence: Double = 0.99,
                   seed: Int = 42): Array[Byte] = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.CountMinSketchAgg
    require(eps > 0 && eps < 1, s"eps=$eps")
    require(confidence > 0 && confidence < 1, s"confidence=$confidence")
    val agg = new CountMinSketchAgg(
      org.apache.spark.sql.graft.Bridge.expression(
        org.apache.spark.sql.functions.col(colName)),
      Literal(eps), Literal(confidence), Literal(seed)).toAggregateExpression()
    rel.select(org.apache.spark.sql.graft.Bridge.column(agg).as("cms"))
      .head().getAs[Array[Byte]](0)
  }

  def cmsEstimate(key: Column, sketchBytes: Array[Byte]): Column =
    org.apache.spark.sql.graft.Bridge.column(
      CmsEstimate(org.apache.spark.sql.graft.Bridge.expression(key), sketchBytes))
}
