package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType,
  ShortType}

/** Catalyst optimizer rule: plan a pure RANGE join as an equi join.
  *
  * `points JOIN intervals ON p BETWEEN lo AND hi` carries no equality
  * predicate, so Spark plans BroadcastNestedLoopJoin — every point row
  * against every interval row, the O(n·m) cliff every warehouse hits
  * the first time someone writes an interval join without hand-bucketed
  * keys (j17 is the HAND-bucketed form of this query; this rule makes
  * the naive form plan like it). The rewrite is the classic bin
  * technique (Databricks' range-join "bin size" optimization, DuckDB's
  * IEJoin family alternative): pick a bucket width W, explode each
  * interval into the buckets it overlaps (`sequence(lo div W,
  * hi div W)` — at most (hi−lo)/W + 1 rows), key each point by
  * `p div W`, and join bucket = bucket AND the ORIGINAL range
  * condition. Equal buckets are a NECESSARY condition for overlap
  * (truncating division is monotonic, so lo ≤ p ≤ hi ⇒
  * lo div W ≤ p div W ≤ hi div W — negatives included), so the
  * rewrite is semantics-preserving; the planner then picks a
  * shuffle-on-bucket sort-merge/hash join and the quadratic pair space
  * never exists.
  *
  * Fires only when `spark.graft.rangejoin.bucketWidth` > 0 (W is
  * workload knowledge — interval width ÷ W bounds the per-interval
  * fan-out, exactly like the Databricks hint's bin size), the join is
  * INNER — or an OUTER join whose PRESERVED side is the point side
  * (LEFT OUTER with points left / RIGHT OUTER with points right): the
  * explode multiplies only interval rows, a matched point still meets
  * each matching interval exactly once (the point has ONE bucket, and
  * the interval's copy in that bucket is unique), and an unmatched
  * point null-extends exactly once because the preserved side is never
  * multiplied. An outer join that PRESERVES the interval side must NOT
  * fire — its unmatched interval rows would null-extend once per
  * exploded bucket — and doesn't (guard below). Additionally the
  * condition must hold a lower and an upper bound on the same integral
  * point expression with bounds from the opposite side, and no
  * equality predicate may already cross the join (if one does, the
  * join is hash-plannable as-is and the rewritten node no longer
  * matches — which is also what makes the rule idempotent under the
  * optimizer's fixed-point loop). A Project restores the original
  * output so the bucket column never escapes. NULL bounds/points are
  * preserved: `sequence(null, …)` explodes to no rows (harmless — the
  * dropped interval row is on the non-preserved side and could match
  * nothing) and a null point's bucket never equals — no match, which
  * for an outer join leaves the preserved row null-extended, exactly
  * the BETWEEN's null semantics.
  */
object RangeJoinRewriteRule extends Rule[LogicalPlan] with PredicateHelper {

  private val WidthConf = "spark.graft.rangejoin.bucketWidth"

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString(WidthConf, "0").toLong
    if (w <= 0) plan
    else plan.transform {
      case j @ Join(_, _, Inner | LeftOuter | RightOuter, Some(_), _) =>
        rewrite(j, w).getOrElse(j)
    }
  }

  /** (point, bound) with the comparison normalized to point-vs-bound;
    * `lower=true` means bound ≤ point. */
  private case class Cmp(point: Expression, bound: Expression, lower: Boolean)

  private def asCmp(e: Expression): Seq[Cmp] = e match {
    case GreaterThanOrEqual(a, b) => Seq(Cmp(a, b, lower = true),
      Cmp(b, a, lower = false))
    case LessThanOrEqual(a, b) => Seq(Cmp(a, b, lower = false),
      Cmp(b, a, lower = true))
    case _ => Nil
  }

  private def rewrite(j: Join, w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    def fromLeft(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(j.left.outputSet)
    def fromRight(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(j.right.outputSet)
    // an existing cross-side equality means the join is already
    // hash-plannable — leave it alone (and stop refiring post-rewrite)
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => (fromLeft(a) && fromRight(b)) ||
        (fromRight(a) && fromLeft(b))
      case _ => false
    }
    if (hasEqui) return None

    // candidate bound comparisons: integral, deterministic, point and
    // bound from opposite sides
    val cmps = conjuncts.flatMap(asCmp).filter { c =>
      c.point.deterministic && c.bound.deterministic &&
        integral(c.point) && integral(c.bound) &&
        ((fromLeft(c.point) && fromRight(c.bound)) ||
          (fromRight(c.point) && fromLeft(c.bound)))
    }
    val pair = (for {
      lo <- cmps if lo.lower
      hi <- cmps if !hi.lower && hi.point.semanticEquals(lo.point)
    } yield (lo, hi)).headOption
    pair.flatMap { case (lo, hi) =>
      val point = lo.point
      val pointOnLeft = fromLeft(point)
      // outer joins may only explode the NON-preserved side: a
      // preserved interval row would null-extend once per bucket copy
      val shapeOk = j.joinType match {
        case Inner => true
        case LeftOuter => pointOnLeft
        case RightOuter => !pointOnLeft
        case _ => false
      }
      if (!shapeOk) None
      else {
        val intervalSide = if (pointOnLeft) j.right else j.left
        def div(e: Expression) =
          IntegralDivide(Cast(e, LongType), Literal(w))
        val bucketOut = AttributeReference("_graft_range_bucket", LongType)()
        // Sequence is TimeZoneAwareExpression: without an explicit
        // timeZoneId it reports UNRESOLVED, and no analyzer pass runs
        // after an optimizer rule — set it here
        val gen = Generate(
          Explode(new Sequence(div(lo.bound), div(hi.bound),
            Some(Literal(1L)), Some(conf.sessionLocalTimeZone))),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(bucketOut), child = intervalSide)
        val newCond = (EqualTo(bucketOut, div(point)) +: conjuncts)
          .reduce(And)
        val joined =
          if (pointOnLeft) j.copy(right = gen, condition = Some(newCond))
          else j.copy(left = gen, condition = Some(newCond))
        // the bucket column must not escape the join's original schema
        Some(Project(j.output, joined))
      }
    }
  }
}
