package graft.plans

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Flatten a (possibly adaptive) executed plan INCLUDING query-stage
  * subtrees: `collect` on an AdaptiveSparkPlanExec sees only the wrapper,
  * and materialized stages hide their subtree behind QueryStageExec — node
  * inspection under AQE needs this walk. One shared definition so a future
  * Spark wrapper node is handled in one place (engine flags and spec
  * assertions both read plans through it).
  */
object PlanWalk {
  def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case q: QueryStageExec => flatten(q.plan)
    case other => other.children.flatMap(flatten)
  })
}
