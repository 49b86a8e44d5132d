package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Size}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectSet, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: `size(collect_set(x))` → `count(DISTINCT x)` in BATCH
  * aggregates.
  *
  * The engine counts exact distincts with collect_set+size everywhere
  * (graft.util.Det.setCount) because Spark bans COUNT(DISTINCT) in
  * streaming aggregations — the set buffer IS the streaming state. In
  * batch replays of the same pipelines that buffer is pure overhead:
  * Catalyst plans COUNT(DISTINCT) as a two-stage expand/partial-count
  * without materializing per-group arrays. Both forms ignore nulls and
  * return 0 for empty groups, so the rewrite is exact.
  *
  * Streaming plans (`plan.isStreaming`) are left untouched.
  */
object RewriteSetCount extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate if !agg.isStreaming =>
      agg.transformExpressions {
        case s @ Size(ae: AggregateExpression, _) if isCompleteCollectSet(ae) =>
          val child = ae.aggregateFunction.asInstanceOf[CollectSet].child
          val cnt = ae.copy(
            aggregateFunction = Count(child :: Nil),
            isDistinct = true)
          // size() returns int; count returns long — keep the original
          // int type so downstream casts/schemas are unchanged
          org.apache.spark.sql.catalyst.expressions.Cast(cnt,
            org.apache.spark.sql.types.IntegerType)
      }
  }

  private def isCompleteCollectSet(ae: AggregateExpression): Boolean =
    ae.mode == Complete && !ae.isDistinct &&
      ae.aggregateFunction.isInstanceOf[CollectSet] &&
      ae.filter.isEmpty
}
