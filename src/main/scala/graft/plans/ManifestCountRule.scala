package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.sources.GraftFileIndex

/** `SELECT count(*) FROM <versioned scan>` answered from the manifest
  * stats alone — Iceberg's manifest-count optimization as a Catalyst
  * rule: an ungrouped Aggregate whose every output is `count(<non-null
  * literal>)` over a bare GraftFileIndex scan (Projects in between are
  * fine — a projection never changes row count; a Filter is not) folds
  * to a LocalRelation carrying the sum of the groups' sidecar row
  * counts. At 100 TB this is the difference between a metadata lookup
  * and a full-table scan for the most common sanity query there is.
  * Fires only on positive evidence: every file group must carry a stats
  * sidecar (the write path always produces one; pre-stats tables fall
  * back to the scan).
  */
object ManifestCountRule extends Rule[LogicalPlan] {

  /** Exact row count of the scan under `plan`, if `plan` is a bare
    * (projection-only) view of a fully stats-covered GraftFileIndex scan.
    */
  private def scanRows(plan: LogicalPlan): Option[Long] = plan match {
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case idx: GraftFileIndex => idx.totalRowsFromStats
        case _ => None
      }
      case _ => None
    }
    case p: Project => scanRows(p.child) // row-count preserving
    case _ => None // Filter/Join/anything else: the count is not the table's
  }

  private def isCountLiteral(e: NamedExpression): Boolean = e match {
    case Alias(AggregateExpression(Count(Seq(Literal(v, _))), _, false, None, _), _) =>
      v != null // count(null-literal) is 0, not the row count
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, aggExprs, child, _)
        if aggExprs.nonEmpty && aggExprs.forall(isCountLiteral) =>
      scanRows(child) match {
        case Some(rows) =>
          LocalRelation(agg.output, Seq(InternalRow.fromSeq(agg.output.map(_ => rows))))
        case None => agg
      }
  }
}
