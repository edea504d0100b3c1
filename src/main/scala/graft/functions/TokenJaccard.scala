package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Set-Jaccard over two string arrays as ONE first-class expression:
  * `|set(a) ∩ set(b)| / max(|set(a) ∪ set(b)|, 1)` — value-identical to the
  * composed Column form `size(array_intersect(a,b)) /
  * greatest(size(array_union(a,b)), 1)` (Dedup.jaccard, the differential
  * twin in ExtensionsSpec), including null-element handling: like the
  * array_* set ops, a null element counts as one distinct value equal only
  * to itself.
  *
  * Being a single named expression (not a tree of array ops) is what makes
  * the similarity-join optimizer rule possible: plans.SimilarityJoinRule
  * recognizes `token_jaccard(a, b) >= t` in a filter over a cross join and
  * rewrites the O(n²) plan into an inverted-index token join — the Catalyst
  * way to give a declarative predicate a scale-path physical shape.
  */
object TokenJaccardEvals {
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val setA = new java.util.HashSet[UTF8String]()
    var nullA = false
    var i = 0
    while (i < na) {
      val u = a.getUTF8String(i)
      if (u == null) nullA = true else setA.add(u)
      i += 1
    }
    var shared = 0
    val seenB = new java.util.HashSet[UTF8String]()
    var nullB = false
    i = 0
    while (i < nb) {
      val u = b.getUTF8String(i)
      if (u == null) nullB = true
      else if (seenB.add(u) && setA.contains(u)) shared += 1
      i += 1
    }
    if (nullA && nullB) shared += 1
    val distinctA = setA.size + (if (nullA) 1 else 0)
    val distinctB = seenB.size + (if (nullB) 1 else 0)
    val union = distinctA + distinctB - shared
    shared.toDouble / math.max(union, 1).toDouble
  }
}

case class TokenJaccardExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(StringType, _) => true
      case org.apache.spark.sql.types.NullType => true // null literal -> null result
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<string> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "token_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    TokenJaccardEvals.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.TokenJaccardEvals.jaccard($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenJaccardExpr =
    copy(left = newLeft, right = newRight)
}

object TokenJaccardFunctions {
  def token_jaccard(a: Column, b: Column): Column =
    Bridge.column(TokenJaccardExpr(Bridge.expression(a), Bridge.expression(b)))
}
