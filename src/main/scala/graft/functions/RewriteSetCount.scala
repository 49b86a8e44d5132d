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
          // fresh AggregateExpression (new resultId): reusing ae's id via
          // copy() could collide with a surviving bare reference to the
          // original collect_set in the same Aggregate
          val cnt = AggregateExpression(
            Count(child :: Nil), Complete, isDistinct = true)
          // size() returns int; count returns long — keep the original
          // int type so downstream casts/schemas are unchanged
          org.apache.spark.sql.catalyst.expressions.Cast(cnt,
            org.apache.spark.sql.types.IntegerType)
      }
  }

  private def isCompleteCollectSet(ae: AggregateExpression): Boolean =
    ae.mode == Complete && !ae.isDistinct &&
      ae.aggregateFunction.isInstanceOf[CollectSet] &&
      ae.filter.isEmpty &&
      // NaN-bearing types disagree between the two forms: collect_set
      // keeps every NaN bit-pattern distinct-by-equality-rules while
      // COUNT(DISTINCT) normalizes NaN to one value — skip them
      !containsFloatingPoint(ae.aggregateFunction.asInstanceOf[CollectSet].child.dataType)

  private def containsFloatingPoint(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case FloatType | DoubleType => true
      case ArrayType(et, _) => containsFloatingPoint(et)
      case MapType(k, v, _) => containsFloatingPoint(k) || containsFloatingPoint(v)
      case StructType(fields) => fields.exists(f => containsFloatingPoint(f.dataType))
      case _ => false
    }
  }
}
