package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{DataType, MapType, StringType}

/** Optimizer rule: collapse long CASE WHEN ladders of the form
  * `CASE WHEN c = k1 THEN v1 WHEN c = k2 THEN v2 ... ELSE e END`
  * (same column, distinct string-literal keys, literal values) into a
  * single hash-map lookup `coalesce(element_at(map, c), e)`.
  *
  * This is the authoring anti-pattern the reference exhibits — a 52-branch
  * per-country `when/otherwise` chain (`pyspark_dag2.py:307-311`;
  * SURVEY.md §2.3 E3/§4): evaluated as written it is O(branches)
  * comparisons per row; the lookup is O(1) and keeps codegen small. Our
  * own operators author map lookups directly (`Exprs.recode`); this rule
  * gives user-authored ladders the same plan.
  *
  * Semantics preserved: first-match-wins on duplicate keys (map keeps the
  * first), null input falls through to ELSE on both forms, and the rule
  * bails out if any branch value is a null literal (coalesce could not
  * distinguish "matched null" from "no match").
  */
object WhenChainToMap extends Rule[LogicalPlan] {

  val MinBranches = 8

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case cw: CaseWhen =>
        val (branches, elseValue) = flatten(cw)
        if (branches.size >= MinBranches)
          rewrite(branches, elseValue).getOrElse(cw)
        else cw
    }

  /** Ladders authored as `when(...).otherwise(when(...)...)` folds arrive
    * as a chain of single-branch CaseWhens nested in each other's ELSE —
    * flatten before matching. */
  private def flatten(cw: CaseWhen): (Seq[(Expression, Expression)], Option[Expression]) =
    cw.elseValue match {
      case Some(inner: CaseWhen) =>
        val (b, e) = flatten(inner)
        (cw.branches ++ b, e)
      case other => (cw.branches, other)
    }

  private def rewrite(caseBranches: Seq[(Expression, Expression)],
                      caseElse: Option[Expression]): Option[Expression] = {
    // every branch must be EqualTo(sameExpr, string literal) -> literal
    val parts = caseBranches.map {
      case (EqualTo(e, Literal(k: org.apache.spark.unsafe.types.UTF8String, StringType)), v: Literal)
          if v.value != null => Some((e, k, v))
      case (EqualTo(Literal(k: org.apache.spark.unsafe.types.UTF8String, StringType), e), v: Literal)
          if v.value != null => Some((e, k, v))
      case _ => None
    }
    if (parts.exists(_.isEmpty)) return None
    val flat = parts.flatten
    val keyExpr = flat.head._1
    // rewrite evaluates the key once; a non-deterministic key would change
    // semantics (CASE re-evaluates it per branch)
    if (!keyExpr.deterministic) return None
    if (!flat.forall(_._1.semanticEquals(keyExpr))) return None
    val valueType: DataType = flat.head._3.dataType
    if (!flat.forall(_._3.dataType == valueType)) return None

    // first occurrence wins (CASE evaluates top-down)
    val seen = scala.collection.mutable.LinkedHashMap
      .empty[org.apache.spark.unsafe.types.UTF8String, Any]
    flat.foreach { case (_, k, v) => if (!seen.contains(k)) seen(k) = v.value }
    val mapData = ArrayBasedMapData(
      seen.keys.toArray[Any], seen.values.toArray[Any])
    val mapLit = Literal.create(mapData, MapType(StringType, valueType, valueContainsNull = false))
    // failOnError=false: missing key must yield NULL (→ ELSE via coalesce),
    // matching CASE semantics even under ANSI mode
    val lookup = ElementAt(mapLit, keyExpr, None, failOnError = false)
    Some(caseElse match {
      case None | Some(Literal(null, _)) => lookup
      case Some(e) => Coalesce(Seq(lookup, e))
    })
  }
}
