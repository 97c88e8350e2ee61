package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule mirroring the Blink planner's distinct-agg split that
  * the reference's Table examples enable
  * (`table.optimizer.distinct-agg.split.enabled`,
  * flink-table-planner-blink SplitAggregateRule.scala:108; SURVEY §4):
  * rewrite
  *
  *   Aggregate(g, COUNT(DISTINCT x))            -- one Expand-based pass
  * into
  *   Aggregate(g, COUNT(x))
  *     <- Aggregate(g ++ x, g ++ x)             -- dedup pre-aggregation
  *
  * The inner dedup aggregate gets map-side partial aggregation on the
  * HIGH-cardinality (g, x) key — the skew-robust shape when g alone is
  * low-cardinality and hot (the reference's day-keyed COUNT DISTINCT).
  * Exact rewrite: COUNT over the deduplicated pairs ≡ COUNT(DISTINCT),
  * including NULL semantics (COUNT skips null x in both forms).
  *
  * Deliberately narrow: exactly one aggregate function, a single-column
  * COUNT(DISTINCT) without FILTER, non-empty grouping on plain
  * attributes, and grouping keys emitted as plain attributes.
  */
object DistinctAggSplitRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(grouping, aggExprs, child, _)
        if grouping.nonEmpty && grouping.forall(_.isInstanceOf[Attribute]) =>
      val aggFns = aggExprs.flatMap(_.collect { case ae: AggregateExpression => ae })
      aggFns match {
        case Seq(ae @ AggregateExpression(Count(Seq(x: Attribute)), Complete, true, None, _)) =>
          // Output columns must be: grouping attributes and the single
          // count alias, nothing computed.
          val ok = aggExprs.forall {
            case a: Attribute => grouping.exists(_.semanticEquals(a))
            // Grouping keys often surface as aliases of the grouping attr.
            case Alias(a: Attribute, _) => grouping.exists(_.semanticEquals(a))
            case Alias(e: AggregateExpression, _) => e eq ae
            case _ => false
          }
          if (!ok) agg
          else {
            val gAttrs = grouping.map(_.asInstanceOf[Attribute])
            val dedupKeys: Seq[NamedExpression] = (gAttrs :+ x).distinct
            val inner = Aggregate(dedupKeys, dedupKeys, child)
            val outerExprs = aggExprs.map {
              case a: Attribute => a
              case Alias(_: AggregateExpression, name) =>
                val newAe = ae.copy(
                  aggregateFunction = Count(Seq(x)), isDistinct = false)
                Alias(newAe, name)(exprId = aggExprs.collectFirst {
                  case al @ Alias(_: AggregateExpression, _) => al.exprId
                }.get)
              case other => other
            }
            Aggregate(gAttrs, outerExprs, inner)
          }
        case _ => agg
      }
  }
}
