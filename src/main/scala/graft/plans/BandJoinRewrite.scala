package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule: rewrite a band (theta) join with NO equi-key —
  * which Spark would execute as BroadcastNestedLoopJoin or CartesianProduct,
  * O(|L|·|R|) — into the banded bucket equi-join of
  * [[graft.operators.RangeJoin]]: explode the left side into the ≤3 band
  * buckets its window overlaps, give the right side its single bucket, and
  * join hash-partitioned on the bucket id with the original predicates kept
  * as the exact filter.
  *
  * Matches inner joins whose condition contains the conjunct pair
  * {{{  b >= a - lo   AND   b <= a + hi  }}}
  * (either argument order) where `a` / `b` are LongType expressions rooted
  * in opposite join sides and lo/hi are non-negative literals (e.g.
  * microsecond columns compared with `BETWEEN a - lo AND a + hi`). Joins
  * that already have an equi-conjunct are left untouched — Spark plans
  * those as hash joins on its own. The rewrite introduces a bucket
  * equi-conjunct, so it can never re-fire on its own output.
  *
  * Registered by [[GraftExtensions]] (`injectOptimizerRule`) and available
  * on live sessions via `spark.experimental.extraOptimizations`. Disable
  * with `spark.graft.bandJoin.enabled=false`.
  *
  * Same plan shape as RangeJoin.timeBand — this rule exists so users who
  * WRITE the naive predicate (the portable SQL spelling) still get the
  * scalable plan, the way other engines apply range-join bin hints.
  */
object BandJoinRewrite extends Rule[LogicalPlan] {

  private val EnabledKey = "spark.graft.bandJoin.enabled"

  /** a band bound: right-side expr compared against left-side expr ± lit */
  private case class Bound(a: Expression, b: Expression, k: Long)

  private def longLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case _ => None
  }

  /** Normalize one comparison conjunct to `b >= a - k` (Lower) or
    * `b <= a + k` (Upper) candidates, without yet knowing which join side
    * `a` and `b` come from. */
  private def asLower(e: Expression): Option[Bound] = e match {
    case GreaterThanOrEqual(b, Subtract(a, k, _)) => longLit(k).map(Bound(a, b, _))
    case LessThanOrEqual(Subtract(a, k, _), b)    => longLit(k).map(Bound(a, b, _))
    case GreaterThanOrEqual(Add(b, k, _), a)      => longLit(k).map(Bound(a, b, _))
    case LessThanOrEqual(a, Add(b, k, _))         => longLit(k).map(Bound(a, b, _))
    case _ => None
  }

  private def asUpper(e: Expression): Option[Bound] = e match {
    case LessThanOrEqual(b, Add(a, k, _))         => longLit(k).map(Bound(a, b, _))
    case GreaterThanOrEqual(Add(a, k, _), b)      => longLit(k).map(Bound(a, b, _))
    case LessThanOrEqual(Subtract(b, k, _), a)    => longLit(k).map(Bound(a, b, _))
    case GreaterThanOrEqual(a, Subtract(b, k, _)) => longLit(k).map(Bound(a, b, _))
    case _ => None
  }

  private def sidesOk(x: Bound, left: LogicalPlan, right: LogicalPlan): Boolean =
    x.a.references.nonEmpty && x.b.references.nonEmpty &&
      x.a.references.subsetOf(left.outputSet) &&
      x.b.references.subsetOf(right.outputSet) &&
      x.a.dataType == LongType && x.b.dataType == LongType &&
      x.a.deterministic && x.b.deterministic

  private def isEqui(e: Expression, l: LogicalPlan, r: LogicalPlan): Boolean = e match {
    case EqualTo(x, y) =>
      (x.references.subsetOf(l.outputSet) && y.references.subsetOf(r.outputSet)) ||
        (x.references.subsetOf(r.outputSet) && y.references.subsetOf(l.outputSet))
    case EqualNullSafe(x, y) =>
      (x.references.subsetOf(l.outputSet) && y.references.subsetOf(r.outputSet)) ||
        (x.references.subsetOf(r.outputSet) && y.references.subsetOf(l.outputSet))
    case _ => false
  }

  /** floorDiv(x, m) for m > 0, exact long arithmetic: (x - pmod(x, m)) div m */
  private def floorDiv(x: Expression, m: Long): Expression = {
    val lit = Literal(m, LongType)
    IntegralDivide(Subtract(x, Pmod(x, lit)), lit)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!SQLConf.get.getConfString(EnabledKey, "true").toBoolean) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        if (conjuncts.exists(isEqui(_, left, right))) j
        else {
          val lower = conjuncts.flatMap(asLower).filter(sidesOk(_, left, right))
          val upper = conjuncts.flatMap(asUpper).filter(sidesOk(_, left, right))
          // pair bounds on the same (a, b) expressions with a non-empty band
          val band = (for {
            lo <- lower; hi <- upper
            if lo.a.semanticEquals(hi.a) && lo.b.semanticEquals(hi.b)
            if lo.k >= 0 && hi.k >= 0 && lo.k + hi.k > 0
          } yield (lo, hi)).headOption
          band match {
            case None => j
            case Some((lo, hi)) =>
              val bucket = lo.k + hi.k
              val bktL = AttributeReference("__graft_bkt", LongType, nullable = true)()
              // timeZoneId must be set explicitly: the rule runs after
              // analysis, so ResolveTimeZone won't visit this new node
              val seq = Sequence(
                floorDiv(Subtract(lo.a, Literal(lo.k, LongType)), bucket),
                floorDiv(Add(lo.a, Literal(hi.k, LongType)), bucket),
                Some(Literal(1L, LongType)),
                Some(SQLConf.get.sessionLocalTimeZone))
              val gen = Generate(Explode(seq), unrequiredChildIndex = Nil,
                outer = false, qualifier = None, generatorOutput = Seq(bktL),
                child = left)
              val bktRAlias = Alias(floorDiv(lo.b, bucket), "__graft_bkt_r")()
              val proj = Project(right.output :+ bktRAlias, right)
              val newCond = And(EqualTo(bktL, bktRAlias.toAttribute), cond)
              Project(left.output ++ right.output,
                Join(gen, proj, Inner, Some(newCond), hint))
          }
        }
    }
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjunctivePredicates(a) ++ splitConjunctivePredicates(b)
    case other => Seq(other)
  }
}
