package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DateType, TimestampNTZType, TimestampType}

/** Optimizer rule: rewrite point-in-interval THETA joins into bucketed
  * EQUI joins (the same rewrite [[graft.ops.RangeJoin.pointInInterval]]
  * offers as an operator, applied automatically by Catalyst).
  *
  * Matches an inner join whose condition conjuncts contain a lower and
  * an upper bound comparing one timestamp expression of side A ("the
  * point") against two expressions of side B ("the interval"), with NO
  * usable equi conjunct — exactly the shape Spark would otherwise plan
  * as BroadcastNestedLoopJoin / CartesianProduct, O(|A|·|B|) with an
  * unbounded broadcast. The rewrite:
  *
  *   A ⋈_{s ⊲ p ⊲ e} B   ⇒   Project(A ⋈_{trunc(p) = b ∧ s ⊲ p ⊲ e}
  *                              Generate(explode(sequence(trunc(s),
  *                                trunc(e), 1 day)) AS b, B))
  *
  * where ⊲ is any of <, <=, >, >= (all four bound forms accepted; the
  * exact original predicates are kept, so the result is IDENTICAL —
  * bucketing is inclusive and only generates candidates). Since trunc
  * is monotone, p ∈ [s, e] implies trunc(p) ∈ [trunc(s), trunc(e)], so
  * no matching pair is lost; a point hits exactly one bucket, so no
  * pair is duplicated.
  *
  * Scale: the join becomes a plain bucket-keyed shuffle join — work is
  * O(A + B·span/day + true candidates), not O(A·B); nothing is
  * broadcast. The rewritten join HAS an equi key, so the rule cannot
  * match its own output (fixpoint-safe). Day granularity is the
  * conservative default for event-time data; use the RangeJoin operator
  * directly to pick another bucket width.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), _) =>
      rewrite(j, left, right, splitConjunctivePredicates(cond)).getOrElse(j)
  }

  /** (point, bound) with point from `pointSide`, bound from `boundSide`,
    * both timestamps; isLower = the conjunct constrains point from
    * below. */
  private def asBound(c: Expression, pointSide: LogicalPlan,
                      boundSide: LogicalPlan): Option[(Expression, Expression, Boolean)] = {
    def ts(dt: DataType): Boolean =
      dt == TimestampType || dt == TimestampNTZType
    def sided(p: Expression, b: Expression): Boolean =
      ts(p.dataType) && ts(b.dataType) &&
        p.references.nonEmpty && b.references.nonEmpty &&
        p.references.subsetOf(pointSide.outputSet) &&
        b.references.subsetOf(boundSide.outputSet) &&
        p.deterministic && b.deterministic
    c match {
      case GreaterThanOrEqual(p, b) if sided(p, b) => Some((p, b, true))
      case GreaterThan(p, b) if sided(p, b) => Some((p, b, true))
      case LessThanOrEqual(b, p) if sided(p, b) => Some((p, b, true))
      case LessThan(b, p) if sided(p, b) => Some((p, b, true))
      case LessThanOrEqual(p, b) if sided(p, b) => Some((p, b, false))
      case LessThan(p, b) if sided(p, b) => Some((p, b, false))
      case GreaterThanOrEqual(b, p) if sided(p, b) => Some((p, b, false))
      case GreaterThan(b, p) if sided(p, b) => Some((p, b, false))
      case _ => None
    }
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      conjuncts: Seq[Expression]): Option[LogicalPlan] = {
    // an existing cross-side equi conjunct means Spark already has a
    // hash-join key — leave the plan alone
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(left.outputSet) &&
          b.references.subsetOf(right.outputSet) &&
          a.references.nonEmpty && b.references.nonEmpty) ||
        (b.references.subsetOf(left.outputSet) &&
          a.references.subsetOf(right.outputSet) &&
          a.references.nonEmpty && b.references.nonEmpty)
      case _: EqualNullSafe => true
      case _ => false
    }
    if (hasEqui) return None

    // try (point on left, interval on right), then mirrored
    val candidates = Seq((left, right, true), (right, left, false))
    candidates.view.flatMap { case (pSide, iSide, pointIsLeft) =>
      val bounds = conjuncts.flatMap(c =>
        asBound(c, pSide, iSide).map(b => (c, b)))
      val found = for {
        (c1, (p1, lo, true)) <- bounds
        (c2, (p2, hi, false)) <- bounds
        if p1.semanticEquals(p2)
      } yield (p1, lo, hi)
      found.headOption.map { case (p, lo, hi) =>
        val tz = Some(conf.sessionLocalTimeZone)
        // day bucket = cast to DATE: resolves for both TIMESTAMP and
        // TIMESTAMP_NTZ (TruncTimestamp does not accept ntz), and a
        // DATE sequence's default step is exactly 1 day
        def trunc(e: Expression) = Cast(e, DateType, tz)
        val pb = Alias(trunc(p), "__rj_bucket")()
        val pPlan = Project(pSide.output :+ pb, pSide)
        val gen = Explode(Sequence(trunc(lo), trunc(hi), None, tz))
        val field = gen.elementSchema.head
        val battr =
          AttributeReference("__rj_bucket", field.dataType, field.nullable)()
        val iPlan = Generate(gen, Nil, outer = false, None, Seq(battr), iSide)
        val newCond =
          (EqualTo(pb.toAttribute, battr) +: conjuncts).reduce(And)
        val (nl, nr) = if (pointIsLeft) (pPlan, iPlan) else (iPlan, pPlan)
        Project(j.output, Join(nl, nr, Inner, Some(newCond), j.hint))
      }
    }.headOption
  }
}
