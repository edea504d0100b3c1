package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-class predicates as native expressions. langId runs over the
  * FULL corpus in a training pipeline, and its CJK gate was the last
  * java.util.regex (`rlike`) on a full-scan hot path (this host's measured
  * intra-JVM regex thread collapse, BENCH_SCALING.md). The scan below is a
  * single codepoint-range loop; the `rlike` twin stays as the differential
  * pin and the DuckDB oracle keeps its regexp_matches formulation.
  */
object TextEvals {

  /** Any char in the CJK Unified Ideographs block U+4E00..U+9FFF (all BMP,
    * so a char-level range check is exact — no surrogate pairs in range).
    */
  def hasCjk(s: UTF8String): Boolean = {
    if (s.isFullAscii) return false // skip the String copy on the dominant case
    val str = s.toString
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c >= 0x4e00 && c <= 0x9fff) return true
      i += 1
    }
    false
  }
}

case class HasCjkExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "has_cjk"
  override def nullSafeEval(input: Any): Any =
    TextEvals.hasCjk(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextEvals.hasCjk($c)")
  override protected def withNewChildInternal(newChild: Expression): HasCjkExpr =
    copy(child = newChild)
}

object TextFunctions {
  def has_cjk(c: Column): Column = Bridge.column(HasCjkExpr(Bridge.expression(c)))
}
