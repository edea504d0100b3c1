package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

import graft.functions.TokenJaccardExpr

/** Exact set-similarity join rewrite (Vernica/Carey/Li's MapReduce
  * set-similarity join shape, re-expressed as a Catalyst rewrite).
  *
  * A user writes the O(n²) declarative form —
  *
  *   left.crossJoin(right).filter(token_jaccard(la, rb) >= t)   // t > 0
  *
  * — and this rule rewrites the optimized plan into an inverted-index
  * token join that never materializes the cross product:
  *
  *   1. tag each side with a row id (multiplicity + duplicate-row safety);
  *   2. explode each side on its DISTINCT tokens;
  *   3. inner-join on token equality — only pairs sharing ≥ 1 token meet,
  *      which is EXACTLY the candidate set: jaccard ≥ t > 0 requires a
  *      shared token, so no qualifying pair is lost (this is an exact
  *      rewrite, not an LSH approximation);
  *   4. group by the row-id pair, counting met tokens = |set(a) ∩ set(b)|;
  *   5. reconstruct jaccard from the precomputed distinct sizes
  *      (|∩| / (|a|+|b|-|∩|), the inclusion-exclusion identity) and apply
  *      the original threshold, then project back to the original output.
  *
  * At corpus scale the cross product is O(n²) rows while the token join is
  * O(Σ postings²) per token bucket — the same asymptotics that make the
  * banded-minhash path viable, but with zero recall loss. Skewed tokens
  * (stopword-like shingles) are handled by AQE skew-join splitting at
  * runtime; a production refinement would add prefix filtering, which
  * drops candidates that this exact rewrite keeps.
  *
  * The rewrite fires only when it is provably semantics-preserving:
  *  - the predicate is `token_jaccard(a, b) >= t` (or >, or the flipped
  *    literal-first forms) with a foldable double threshold t > 0 — at
  *    t ≤ 0 token-disjoint pairs qualify and the cross product is the
  *    semantics;
  *  - `a` evaluates over one join side only and `b` over the other;
  *  - both array element types are containsNull = false (a null element
  *    would be dropped by the token equi-join but counts as a matchable
  *    value in TokenJaccardExpr — see its scaladoc);
  *  - the join is Inner/Cross with no condition (the pure cross form).
  * Remaining deterministic conjuncts fold into the token-join condition
  * (value-identical: per-pair-constant inputs, null → false both ways),
  * pruning candidates before the aggregate.
  */
object SimilarityJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // the raw shape the DataFrame API produces…
    case f @ Filter(cond, Join(left, right, jt, None, _))
        if jt == Inner || jt == Cross =>
      rewrite(cond, left, right).getOrElse(f)
    // …and the shape after PushPredicateThroughJoin has folded the filter
    // into the join condition (the rules share the fixed-point batch, so
    // push-down usually wins the race within an iteration)
    case j @ Join(left, right, jt, Some(cond), _)
        if jt == Inner || jt == Cross =>
      rewrite(cond, left, right).getOrElse(j)
  }

  /** token_jaccard-vs-literal conjunct → (expr, threshold, strict). */
  private def matchPredicate(e: Expression): Option[(TokenJaccardExpr, Double, Boolean)] =
    e match {
      case GreaterThanOrEqual(tj: TokenJaccardExpr, Literal(t: Double, DoubleType)) =>
        Some((tj, t, false))
      case GreaterThan(tj: TokenJaccardExpr, Literal(t: Double, DoubleType)) =>
        Some((tj, t, true))
      case LessThanOrEqual(Literal(t: Double, DoubleType), tj: TokenJaccardExpr) =>
        Some((tj, t, false))
      case LessThan(Literal(t: Double, DoubleType), tj: TokenJaccardExpr) =>
        Some((tj, t, true))
      case _ => None
    }

  private def elementsNonNull(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(StringType, containsNull) => !containsNull
    case _ => false
  }

  private def rewrite(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // a nondeterministic conjunct (rand() < p, …) is evaluated once per
    // CROSS-JOIN row in the original plan; the rewrite would evaluate it
    // only per candidate pair — observably different draws. Keep the
    // cartesian. (The analyzer's PullOutNondeterministic normally lifts
    // these out before the optimizer ever runs — defense in depth.)
    if (conjuncts.exists(!_.deterministic)) return None
    // a cross-side EQUI conjunct means the alternative plan is a cheap
    // hash/sort-merge join with the jaccard as a residual filter — NOT a
    // cartesian. Rewriting would demote it to a whole-table inverted-index
    // join; the rewrite only pays off when the alternative is quadratic.
    def crossSide(a: Expression, b: Expression): Boolean =
      a.references.nonEmpty && b.references.nonEmpty &&
        ((a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
          (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet)))
    val hasEquiJoinPred = conjuncts.exists {
      case EqualTo(a, b) => crossSide(a, b)
      case EqualNullSafe(a, b) => crossSide(a, b)
      case _ => false
    }
    if (hasEquiJoinPred) return None
    val hit = conjuncts.iterator.flatMap { c =>
      matchPredicate(c).flatMap { case (tj, t, strict) =>
        if (t <= 0 || !elementsNonNull(tj.left) || !elementsNonNull(tj.right)) None
        else if (tj.left.references.subsetOf(left.outputSet) &&
          tj.right.references.subsetOf(right.outputSet))
          Some((c, tj.left, tj.right, t, strict))
        else if (tj.left.references.subsetOf(right.outputSet) &&
          tj.right.references.subsetOf(left.outputSet))
          Some((c, tj.right, tj.left, t, strict)) // jaccard is symmetric
        else None
      }
    }.nextOption()

    hit.map { case (matched, aExpr, bExpr, t, strict) =>
      val rest = conjuncts.filterNot(_ eq matched)

      def side(child: LogicalPlan, arr: Expression, tag: String)
          : (Project, Attribute, Attribute, Attribute) = {
        // row id: uniqueness within one execution is all the grouping
        // needs, and the id is computed in the SAME STAGE as the explode
        // feeding the join's map side, so all of a row's tokens carry one
        // id per task attempt. Across-attempt stability is the standard
        // indeterminate-stage story (SPARK-23207 class): a retried map
        // stage with order-nondeterministic input makes Spark roll back /
        // recompute dependent stages rather than mix attempts, so ids
        // never blend across attempts within a successful job.
        val id = Alias(MonotonicallyIncreasingID(), s"__graft_${tag}id")()
        val sz = Alias(Cast(Size(ArrayDistinct(arr)), LongType), s"__graft_${tag}sz")()
        val proj = Project(child.output ++ Seq(id, sz), child)
        val tok = AttributeReference(s"__graft_${tag}tok", StringType, nullable = false)()
        (proj, id.toAttribute, sz.toAttribute, tok)
      }
      val (lProj, lid, lsz, ltok) = side(left, aExpr, "l")
      val (rProj, rid, rsz, rtok) = side(right, bExpr, "r")
      val lGen = Generate(Explode(ArrayDistinct(aExpr)), Nil, outer = false, None, Seq(ltok), lProj)
      val rGen = Generate(Explode(ArrayDistinct(bExpr)), Nil, outer = false, None, Seq(rtok), rProj)
      // exact length filter: jac >= t requires min(|a|,|b|)/max(|a|,|b|)
      // >= t (∩ <= min, ∪ >= max). Evaluated as the SAME double division
      // the threshold predicate uses: IEEE division is monotone in the
      // numerator and antitone in the denominator, so fl(∩/∪) <=
      // fl(min/max) EXACTLY — a pair passing fl(∩/∪) >= t (or > t) always
      // passes fl(min/max) >= t, and the prune can never drop a qualifying
      // pair. (A t·max multiplication form is NOT safe: fl(0.28·25.0) =
      // 7.000000000000001 > 7 would wrongly prune a containment pair with
      // jac = 7/25 = fl(0.28).)
      val tLit = Literal(t)
      val lenFilter = GreaterThanOrEqual(
        Divide(Cast(Least(Seq(lsz, rsz)), DoubleType),
          Cast(Greatest(Seq(lsz, rsz)), DoubleType)), tLit)
      // the remaining deterministic conjuncts (id_a < id_b, …) reference
      // only pass-through columns whose values are constant per pair, so
      // evaluating them AT THE JOIN is value-identical to the original
      // post-filter (null → false both ways) and prunes candidates before
      // they ever reach the aggregate; single-side ones get pushed further
      // down by the standard rules from here
      // JoinHint.NONE deliberately: any user hint targeted the CARTESIAN
      // join; the token equi-join is a different operator where the hint's
      // broadcast/shuffle intent does not transfer — AQE picks its
      // strategy from the actual exploded sizes
      val joined = Join(lGen, rGen, Inner,
        Some((Seq(EqualTo(ltok, rtok), lenFilter) ++ rest).reduce(And)), JoinHint.NONE)
      // group by the row-id pair ONLY; every other column rides as a
      // First(...) aggregate RE-ALIASED TO ITS OWN exprId (all rows of a
      // group share the value, so First is value-deterministic, and the
      // preserved ids keep the plan above resolving unchanged). Compared
      // to grouping by every column this (a) keeps wide payloads — the
      // token arrays, map columns, whole documents — out of the grouping
      // keys, so ColumnPruning can drop any the consumer never reads, and
      // (b) sidesteps the ungroupable-type restriction entirely.
      val group: Seq[Attribute] = Seq(lid, rid)
      val carried = (lProj.output ++ rProj.output)
        .filterNot(a => a.exprId == lid.exprId || a.exprId == rid.exprId)
        .map(a => Alias(aggregate.First(a, ignoreNulls = false).toAggregateExpression(),
          a.name)(exprId = a.exprId, qualifier = a.qualifier))
      val shared = Alias(
        aggregate.Count(Literal(1)).toAggregateExpression(), "__graft_shared")()
      val agg = Aggregate(group, (group ++ carried) :+ shared, joined)
      val sharedRef = shared.toAttribute
      val unionSize = Greatest(Seq(
        Subtract(Add(lsz, rsz), sharedRef), Literal(1L)))
      val jac = Divide(Cast(sharedRef, DoubleType), Cast(unionSize, DoubleType))
      val thresholdPred =
        if (strict) GreaterThan(jac, Literal(t)) else GreaterThanOrEqual(jac, Literal(t))
      val filtered = Filter(thresholdPred, agg)
      Project(left.output ++ right.output, filtered)
    }
  }
}
