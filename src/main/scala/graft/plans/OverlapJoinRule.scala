package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Auto-rewrite of box-overlap theta joins (SURVEY §4.2's "range-join
  * rule", the optimizer-rule leg of J2 — `overlaps_tbox_tbox`,
  * `/root/reference/meos/src/tbox.rs:104-106`) into the bucketed
  * equi-join shape of [[graft.meos.Boxes.tboxOverlapJoinBucketed]], so the
  * SQL spelling of an interval-overlap join gets the same scalable plan as
  * the API path instead of a BroadcastNestedLoopJoin / cartesian product.
  *
  * Pattern: an inner join whose condition carries a pair of
  * opposite-direction `<=` conjuncts over timestamps from opposite sides —
  *
  * {{{  l.tmin <= r.tmax AND r.tmin <= l.tmax  (AND anything else) }}}
  *
  * Any such pair IS an interval overlap of the derived intervals
  * [l.tmin, l.tmax] × [r.tmin, r.tmax], whatever the columns are named.
  * The rewrite explodes each side into fixed-width time buckets covering
  * its interval and equi-joins on the bucket id, keeping every other
  * conjunct (including the time pair itself) as the exact post-join
  * predicate — so the rewrite is output-identical, it only changes HOW
  * candidates meet: a shuffle on ints instead of |L|×|R|.
  *
  * Each qualifying pair meets in exactly ONE bucket — the one containing
  * `greatest(l.lo, r.lo)` (both intervals contain the larger of the two
  * lower bounds) — enforced with a canonical-bucket predicate, so the
  * rewrite needs NO dedup and preserves duplicate input rows faithfully.
  * Interval bounds are `least/greatest`-normalized per side first, which
  * keeps even degenerate (lo > hi) rows correct.
  *
  * Guards:
  *  - inner/cross joins only (a null or dropped bucket row can never have
  *    satisfied the original condition — safe to lose under inner
  *    semantics);
  *  - skips joins that already have a cross-side equi conjunct (hash join
  *    already applies; also makes the rule a no-op on its own output);
  *  - skips when either side's estimated size fits the broadcast
  *    threshold — a broadcast nested-loop over a small build side is
  *    already acceptable, and the rewrite would force a shuffle;
  *  - `spark.graft.overlapJoin.enabled` (default true) switches it off,
  *    `spark.graft.overlapJoin.bucketWidthSeconds` (default 604800 = 7
  *    days, q15's width) sets the bucket size — data-dependent width
  *    selection belongs to the API path, an optimizer rule must stay
  *    side-effect free.
  */
object OverlapJoinRule extends Rule[LogicalPlan] {

  private val EnabledKey = "spark.graft.overlapJoin.enabled"
  private val WidthKey = "spark.graft.overlapJoin.bucketWidthSeconds"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").toBoolean) return plan
    val widthUs =
      conf.getConfString(WidthKey, "604800").toLong * 1000000L
    plan.transform {
      case j @ Join(l, r, Inner | Cross, Some(cond), _)
          if eligible(j, l, r, cond) =>
        rewrite(j, l, r, cond, widthUs)
    }
  }

  /** Conjuncts of form `x <= y` with x, y wholly from opposite sides and
    * both timestamp-typed, returned as (leftExpr, rightExpr, leftIsLo). */
  private def timePairs(conjuncts: Seq[Expression], l: LogicalPlan,
                        r: LogicalPlan)
      : Seq[(Expression, Expression, Boolean)] =
    conjuncts.collect {
      case LessThanOrEqual(a, b)
          if a.dataType == TimestampType && b.dataType == TimestampType &&
            a.references.nonEmpty && b.references.nonEmpty &&
            a.references.subsetOf(l.outputSet) &&
            b.references.subsetOf(r.outputSet) =>
        (a, b, true) // l.lo <= r.hi
      case LessThanOrEqual(a, b)
          if a.dataType == TimestampType && b.dataType == TimestampType &&
            a.references.nonEmpty && b.references.nonEmpty &&
            a.references.subsetOf(r.outputSet) &&
            b.references.subsetOf(l.outputSet) =>
        (b, a, false) // r.lo <= l.hi
    }

  private def eligible(j: Join, l: LogicalPlan, r: LogicalPlan,
                       cond: Expression): Boolean = {
    val conjuncts = splitConjuncts(cond)
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(l.outputSet) &&
          b.references.subsetOf(r.outputSet)) ||
          (a.references.subsetOf(r.outputSet) &&
            b.references.subsetOf(l.outputSet))
      case _ => false
    }
    val pairs = timePairs(conjuncts, l, r)
    val broadcastable = {
      val t = conf.autoBroadcastJoinThreshold
      t > 0 && (l.stats.sizeInBytes <= t || r.stats.sizeInBytes <= t)
    }
    !hasEqui && !broadcastable &&
      pairs.exists(_._3) && pairs.exists(!_._3)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  private def rewrite(j: Join, l: LogicalPlan, r: LogicalPlan,
                      cond: Expression, widthUs: Long): LogicalPlan = {
    val conjuncts = splitConjuncts(cond)
    val pairs = timePairs(conjuncts, l, r)
    // first opposite-direction pair: l.lo <= r.hi with r.lo <= l.hi
    val (lLo, rHi, _) = pairs.find(_._3).get
    val (lHi2, rLo2, _) = pairs.find(!_._3).get
    val (lHi, rLo) = (lHi2, rLo2)

    val w = Literal(widthUs, LongType)
    def bucketOf(e: Expression): Expression =
      IntegralDivide(UnixMicros(e), w)
    // per-side normalized interval -> covered bucket range (Sequence is
    // TimeZoneAwareExpression: without an explicit timeZoneId it reports
    // unresolved even over longs)
    def bucketSeq(lo: Expression, hi: Expression): Expression =
      new Sequence(
        bucketOf(Least(Seq(lo, hi))), bucketOf(Greatest(Seq(lo, hi))),
        None, Some(conf.sessionLocalTimeZone))

    def exploded(side: LogicalPlan, lo: Expression, hi: Expression,
                 name: String): (LogicalPlan, Attribute) = {
      val attr = AttributeReference(name, LongType, nullable = false)()
      (Generate(Explode(bucketSeq(lo, hi)), Nil, outer = false, None,
        Seq(attr), side), attr)
    }

    val (genL, bL) = exploded(l, lLo, lHi, "__graft_bucket_l")
    val (genR, bR) = exploded(r, rLo, rHi, "__graft_bucket_r")

    // each qualifying pair meets exactly once: in the bucket holding the
    // larger of the two (normalized) interval starts
    val canonical = EqualTo(bL,
      bucketOf(Greatest(Seq(Least(Seq(lLo, lHi)), Least(Seq(rLo, rHi))))))
    val newCond = And(And(EqualTo(bL, bR), canonical), cond)
    Project(j.output, Join(genL, genR, Inner, Some(newCond), j.hint))
  }
}
