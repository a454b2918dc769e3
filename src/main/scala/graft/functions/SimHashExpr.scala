package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash over an `array<string>` token column: per token
  * one xxHash64, ±1 vote per bit position weighted by term frequency
  * (tokens arrive non-distinct), sign of each vote sets the output bit.
  *
  * Same rationale as [[MinHashSig]]: the higher-order-function rendition
  * (64 interpreted lambda folds per row) is orders of magnitude slower
  * and capped the practical width at 16 bits; this expression does
  * O(|tokens|·64) long ops inside WholeStageCodegen at full width.
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

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      // null elements hash to the shared sentinel (NGramHash64's rule):
      // the declared input admits containsNull=true and
      // XxHash64Function.hash NPEs on null
      val u = arr.getUTF8String(i)
      val h = if (u == null) NGramHash64.NullElementHash
              else XxHash64Function.hash(u, StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      val u = ctx.freshName("u")
      s"""
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $arr.numElements(); $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $u = $arr.getUTF8String($i);
         |  long $h = ($u == null)
         |    ? ${NGramHash64.NullElementHash}L
         |    : org.apache.spark.sql.catalyst.expressions.XxHash64Function$$.MODULE$$
         |    .hash($u,
         |      org.apache.spark.sql.types.StringType$$.MODULE$$, 42L);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def simhash64(tokens: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      SimHash64(org.apache.spark.sql.graft.Bridge.expression(tokens)))
}
