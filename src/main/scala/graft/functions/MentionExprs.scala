package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.rules.Rules

/** X3/X4/X5 mention extraction as native expressions (SURVEY §2.6).
  *
  * These were `regexp_extract_all` + `transform`/`filter` Column chains;
  * the per-turn regex scans were the last java.util.regex on the hot path
  * (this host's measured intra-JVM regex thread collapse, BENCH_SCALING.md)
  * — the evaluators below call the Rules char scanners, each pinned to its
  * Pattern twin by CleanScanSpec fuzz, so the whole s3 projection is now
  * regex-free and stays inside one whole-stage-codegen span.
  */
object MentionEvals {
  private def strArray(xs: Seq[String]): ArrayData =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])

  /** X3 gazetteer alternation scan over CLEANED text -> country names. */
  def locations(s: UTF8String): ArrayData = strArray(Rules.scanGazetteer(s.toString))

  /** X4 capitalized-sequence ORG mentions over RAW text (URL/length/
    * country filters inside Rules.extractOrgs).
    */
  def orgs(s: UTF8String): ArrayData = strArray(Rules.extractOrgs(s.toString))

  /** X5 date-like spans over CLEANED text, stoplist-filtered. */
  def dates(s: UTF8String): ArrayData = strArray(Rules.extractDates(s.toString))
}

abstract class MentionExpr extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
}

case class LocationsExtractExpr(child: Expression) extends MentionExpr {
  override def prettyName: String = "extract_locations"
  override def nullSafeEval(input: Any): Any =
    MentionEvals.locations(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MentionEvals.locations($c)")
  override protected def withNewChildInternal(newChild: Expression): LocationsExtractExpr =
    copy(child = newChild)
}

case class OrgsExtractExpr(child: Expression) extends MentionExpr {
  override def prettyName: String = "extract_orgs"
  override def nullSafeEval(input: Any): Any =
    MentionEvals.orgs(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MentionEvals.orgs($c)")
  override protected def withNewChildInternal(newChild: Expression): OrgsExtractExpr =
    copy(child = newChild)
}

case class DatesExtractExpr(child: Expression) extends MentionExpr {
  override def prettyName: String = "extract_dates"
  override def nullSafeEval(input: Any): Any =
    MentionEvals.dates(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MentionEvals.dates($c)")
  override protected def withNewChildInternal(newChild: Expression): DatesExtractExpr =
    copy(child = newChild)
}

object MentionFunctions {
  def extract_locations(c: Column): Column =
    Bridge.column(LocationsExtractExpr(Bridge.expression(c)))
  def extract_orgs(c: Column): Column =
    Bridge.column(OrgsExtractExpr(Bridge.expression(c)))
  def extract_dates(c: Column): Column =
    Bridge.column(DatesExtractExpr(Bridge.expression(c)))
}
