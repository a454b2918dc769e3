package graft.plans

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Full physical-plan traversal for plan lints (PlanAudit, the CI plan
  * guards). `SparkPlan.children` alone is NOT a full traversal once AQE
  * has executed: `AdaptiveSparkPlanExec` hides the final plan behind
  * `executedPlan`, and materialized `QueryStageExec` nodes report NO
  * children — their subtree hangs off `.plan`. A child-only walk over a
  * finalized plan silently stops at every stage boundary and the lint
  * sees an empty tree.
  */
object PlanWalk {
  def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
    case q: QueryStageExec => p +: walk(q.plan)
    // a persisted relation hides ITS plan (where the interesting window
    // or exchange may live) behind the cached plan
    case im: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
      p +: walk(im.relation.cachedPlan)
    case _ => p +: (p.children ++ p.subqueries).flatMap(walk)
  }
}
