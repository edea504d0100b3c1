package graft.plans

import scala.util.Try

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.GraftFileIndex
import graft.sources.VersionedTable.GroupStats

/** Ungrouped `count(*)` / `min(col)` / `max(col)` over a versioned scan
  * answered from the manifest stats alone — Iceberg's manifest-metrics
  * aggregate pushdown as a Catalyst rule: when every output of an
  * ungrouped Aggregate over a bare GraftFileIndex scan is one of those
  * three shapes and every file group's sidecar can answer it, the whole
  * Aggregate folds to a LocalRelation. `SELECT min(ts), max(ts),
  * count(*)` — the watermark/partition-discovery query every incremental
  * pipeline runs first — becomes a metadata lookup instead of a
  * full-table scan.
  *
  * Strictly evidence-based, bails to the scan otherwise:
  *  - count(<non-null literal>) tolerates any Project in between (a
  *    projection never changes row count); min/max require their
  *    attribute to resolve through passthrough projections to a relation
  *    column with stats in EVERY group (a group whose schema lacks the
  *    column contributes all-nulls, i.e. nothing; an all-null or empty
  *    group likewise);
  *  - numeric stats that do not round-trip through BigDecimal (NaN,
  *    Infinity — possible double extremes, and exactly the values whose
  *    min/max ordering differs from the stats writer's) bail;
  *  - Filters, grouping, DISTINCT, and agg-level FILTER clauses bail.
  */
object ManifestAggRule extends Rule[LogicalPlan] {

  // ---- plan shape -----------------------------------------------------

  private def indexOf(plan: LogicalPlan): Option[GraftFileIndex] = plan match {
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case idx: GraftFileIndex => Some(idx)
        case _ => None
      }
      case _ => None
    }
    case p: Project => indexOf(p.child) // row-count preserving
    case _ => None
  }

  /** Resolve an aggregate's attribute through passthrough projections to
    * the relation column name it reads, with its type.
    */
  private def resolveColumn(plan: LogicalPlan, attr: AttributeReference):
      Option[(String, DataType)] = plan match {
    case l: LogicalRelation =>
      l.output.find(_.exprId == attr.exprId).map(a => (a.name, a.dataType))
    case p: Project =>
      p.projectList.find(_.exprId == attr.exprId).flatMap {
        case a: AttributeReference => resolveColumn(p.child, a)
        case Alias(a: AttributeReference, _) => resolveColumn(p.child, a)
        case _ => None // computed projection: not a relation column
      }
    case _ => None
  }

  // ---- stats evaluation -----------------------------------------------

  /** min/max over the groups' stats for `column`, as the INTERNAL value
    * of `dt` (UTF8String / primitives / Decimal), Some(null) for a
    * provably all-null column, None when the stats cannot answer.
    */
  private def boundFromStats(idx: GraftFileIndex, column: String, dt: DataType,
      wantMin: Boolean): Option[Any] = {
    val perGroup: Seq[Option[Option[String]]] = idx.groupStatsSeq.map {
      case None => None // no sidecar: unknown content
      case Some(st) => groupBound(st, column, wantMin)
    }
    if (perGroup.exists(_.isEmpty)) return None
    val bounds = perGroup.flatten.flatten // groups with at least one non-null value
    if (bounds.isEmpty) return Some(null) // empty / all-null table: SQL null
    val isString = dt == StringType
    def better(a: String, b: String): Option[String] = {
      val c: Option[Int] =
        if (isString)
          Some(UTF8String.fromString(a).compareTo(UTF8String.fromString(b)))
        else Try(BigDecimal(a).compare(BigDecimal(b))).toOption
      c.map(v => if ((v <= 0) == wantMin) a else b)
    }
    val winner = bounds.reduceLeft[String] { (a, b) =>
      better(a, b) match {
        case Some(w) => w
        case None => return None // non-ordering numeric (NaN/Infinity)
      }
    }
    toInternal(winner, dt)
  }

  /** One group's min-or-max evidence for `column`:
    * None = cannot answer; Some(None) = contributes nothing (no rows /
    * all null / column absent from the group's schema); Some(Some(v)) =
    * the group's exact bound from its sidecar.
    */
  private def groupBound(st: GroupStats, column: String,
      wantMin: Boolean): Option[Option[String]] =
    st.cols.get(column) match {
      case _ if st.rows == 0 => Some(None)
      case Some(cs) if cs.min.isEmpty || cs.max.isEmpty => Some(None) // all null
      case Some(cs) => Some(Some(if (wantMin) cs.min.get else cs.max.get))
      case None if st.schema.exists(s => !s.fieldNames.contains(column)) =>
        Some(None) // column absent from this group: merged read nulls
      case None => None // non-stats type or pre-stats sidecar
    }

  private def toInternal(s: String, dt: DataType): Option[Any] = dt match {
    case StringType => Some(UTF8String.fromString(s))
    case LongType => Try(s.toLong).toOption
    case IntegerType => Try(s.toInt).toOption
    case ShortType => Try(s.toShort).toOption
    case ByteType => Try(s.toByte).toOption
    case DoubleType => Try(s.toDouble).toOption
    case FloatType => Try(s.toFloat).toOption
    case d: DecimalType =>
      Try(Decimal(new java.math.BigDecimal(s), d.precision, d.scale)).toOption
    // the sidecar stores timestamps as epoch micros and dates as epoch
    // days (writeStats) — exactly the Catalyst internal values, so the
    // watermark query `min(ts), max(ts), count(*)` folds to metadata.
    // NTZ stats exist only when written under UTC (naive == epoch), and
    // naive micros are tz-free to read back.
    case TimestampType | TimestampNTZType => Try(s.toLong).toOption
    case DateType => Try(s.toInt).toOption
    case _ => None
  }

  // ---- aggregate outputs ----------------------------------------------

  /** Fold one aggregate output to its internal value, if the stats can. */
  private def foldOutput(e: NamedExpression, child: LogicalPlan,
      idx: GraftFileIndex): Option[Any] = e match {
    case Alias(AggregateExpression(Count(Seq(Literal(v, _))), _, false, None, _), _)
        if v != null =>
      idx.totalRowsFromStats
    case Alias(AggregateExpression(Min(a: AttributeReference), _, false, None, _), _) =>
      resolveColumn(child, a).flatMap { case (name, dt) =>
        boundFromStats(idx, name, dt, wantMin = true)
      }
    case Alias(AggregateExpression(Max(a: AttributeReference), _, false, None, _), _) =>
      resolveColumn(child, a).flatMap { case (name, dt) =>
        boundFromStats(idx, name, dt, wantMin = false)
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // !agg.isStreaming: a micro-batch plan's ungrouped aggregate is a
    // STATEFUL running total across batches; folding it to this batch's
    // sidecar stats would silently replace the accumulated value with the
    // last batch's count. Stats answering is a batch-only optimization.
    case agg @ Aggregate(Nil, aggExprs, child, _)
        if aggExprs.nonEmpty && !agg.isStreaming =>
      indexOf(child) match {
        case Some(idx) =>
          val folded = aggExprs.map(e => foldOutput(e, child, idx))
          if (folded.exists(_.isEmpty)) agg
          else LocalRelation(agg.output, Seq(InternalRow.fromSeq(folded.map(_.get))))
        case None => agg
      }
  }
}
