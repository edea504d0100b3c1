package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass scanners for the corpus-wide text-analysis kernels that
  * previously ran on java.util.regex: token counting (ws + BPE-ish) and the
  * whitespace/charset normalizers behind document fingerprinting and the
  * reduced normalizer. These are scan-everything operators in a training
  * pipeline — fingerprinting in particular feeds BOTH dedup entry points
  * (Dedup.exactDedup, Dedup.minHashDedup), so at 100 TB it runs over every
  * document — and this host's measured intra-JVM regex thread collapse
  * (BENCH_SCALING.md) is why the rest of the hot path went regex-free in
  * round 2. Beyond the regex removal, the token counters also drop the
  * intermediate token ARRAY that `size(split(...))` / `size(
  * regexp_extract_all(...))` materialized per row just to take its length.
  *
  * Each scanner's Pattern formulation stays in TextAnalysis as a `*Regex`
  * differential twin (fuzz-pinned in TokenScanSpec) and the DuckDB oracles
  * keep their independent RE2 formulations, so semantics remain
  * cross-checked three ways.
  */
object ScanEvals {

  /** java.util.regex `\s` (ASCII-only by default): [ \t\n\x0B\f\r]. */
  @inline private def isJavaWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0b || c == '\f' || c == '\r'

  /** == size(split(s, "\\s+")) with Spark's limit=-1 semantics: the split
    * produces (number of maximal whitespace runs) + 1 fields — a leading
    * run yields a leading empty field and a trailing run a trailing empty
    * field (kept at limit -1), interior runs separate fields. Whitespace
    * chars are all BMP/ASCII, so a char-level scan is exact.
    */
  def wsTokenCount(s: UTF8String): Int = {
    val str = s.toString
    var runs = 0
    var inRun = false
    var i = 0
    while (i < str.length) {
      if (isJavaWs(str.charAt(i))) {
        if (!inRun) { runs += 1; inRun = true }
      } else inRun = false
      i += 1
    }
    runs + 1
  }

  /** == count of matches of `[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]`: letter runs
    * and digit runs count once, every other non-whitespace CODE POINT (the
    * alternation's char classes match code points, so an astral char is one
    * token, not two surrogate tokens) counts by itself.
    */
  def bpeTokenCount(s: UTF8String): Int = {
    val str = s.toString
    var n = 0
    var run = 0 // 0 = none, 1 = letter run, 2 = digit run
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')) {
        if (run != 1) { n += 1; run = 1 }
      } else if (cp >= '0' && cp <= '9') {
        if (run != 2) { n += 1; run = 2 }
      } else if (cp == 0x20 || (cp >= 0x09 && cp <= 0x0d)) { // java \s
        run = 0
      } else {
        n += 1; run = 0
      }
      i += Character.charCount(cp)
    }
    n
  }

  /** == trim(regexp_replace(s, "\\s+", " ")): every maximal whitespace run
    * becomes one space, then the (only possible) leading/trailing space is
    * trimmed — emitted here directly as "space before the next kept char,
    * never at the start, pending run dropped at the end".
    */
  def collapseWs(s: UTF8String): UTF8String = {
    if (s.numBytes == 0) return s
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var pending = false
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (isJavaWs(c)) pending = true
      else {
        if (pending && sb.length > 0) sb.append(' ')
        sb.append(c)
        pending = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** == trim(regexp_replace(regexp_replace(s, "[^a-z0-9 ]", ""), " +", " ")):
    * strip everything outside [a-z0-9 ] FIRST (so a stripped char between
    * two spaces leaves one collapsible run, and tabs/newlines vanish rather
    * than becoming spaces), then collapse space runs and trim. Callers pass
    * lower(c), so uppercase never reaches the scanner.
    */
  def asciiNormalize(s: UTF8String): UTF8String = {
    if (s.numBytes == 0) return s
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var pending = false
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c == ' ') pending = true
      else if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pending && sb.length > 0) sb.append(' ')
        sb.append(c)
        pending = false
      }
      // any other char is stripped by the inner [^a-z0-9 ] pass — it does
      // NOT touch the pending-space state ("a . b" -> "a b")
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

case class WsTokenCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ws_token_count"
  override def nullSafeEval(input: Any): Any =
    ScanEvals.wsTokenCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ScanEvals.wsTokenCount($c)")
  override protected def withNewChildInternal(newChild: Expression): WsTokenCountExpr =
    copy(child = newChild)
}

case class BpeTokenCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_token_count"
  override def nullSafeEval(input: Any): Any =
    ScanEvals.bpeTokenCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ScanEvals.bpeTokenCount($c)")
  override protected def withNewChildInternal(newChild: Expression): BpeTokenCountExpr =
    copy(child = newChild)
}

case class CollapseWsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "collapse_ws"
  override def nullSafeEval(input: Any): Any =
    ScanEvals.collapseWs(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ScanEvals.collapseWs($c)")
  override protected def withNewChildInternal(newChild: Expression): CollapseWsExpr =
    copy(child = newChild)
}

case class AsciiNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "ascii_normalize"
  override def nullSafeEval(input: Any): Any =
    ScanEvals.asciiNormalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ScanEvals.asciiNormalize($c)")
  override protected def withNewChildInternal(newChild: Expression): AsciiNormalizeExpr =
    copy(child = newChild)
}

object ScanFunctions {
  def ws_token_count(c: Column): Column = Bridge.column(WsTokenCountExpr(Bridge.expression(c)))
  def bpe_token_count(c: Column): Column = Bridge.column(BpeTokenCountExpr(Bridge.expression(c)))
  def collapse_ws(c: Column): Column = Bridge.column(CollapseWsExpr(Bridge.expression(c)))
  def ascii_normalize(c: Column): Column = Bridge.column(AsciiNormalizeExpr(Bridge.expression(c)))
}
