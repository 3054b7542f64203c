package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.{LongType, StringType, TimestampType}

/** Optimizer rule: plan timestamp range joins as binned equi-joins.
  *
  * An inner join whose ONLY cross-side predicates are a range test
  * (`p.ts >= i.start AND p.ts < i.end`) has no equi-key, so Spark can
  * only execute it as BroadcastNestedLoopJoin — O(|points|·|intervals|)
  * comparisons, and a hard broadcast-size wall on the interval side.
  * Engines with native range joins (interval trees, IEJoin) handle this
  * shape; Spark leaves it to the user. This rule closes that gap with
  * the standard binning rewrite (the logical twin of
  * [[graft.engine.Joins.binnedIntervalJoin]]):
  *
  *   - each interval explodes (`Generate`/`Sequence`) into the
  *     fixed-width time bins it overlaps,
  *   - each point computes its single bin,
  *   - the join becomes a plain shuffle equi-join on the bin id, with
  *     the original range predicate kept as the residual filter.
  *
  * Bin ids use integral `div` on epoch microseconds (double division
  * corrupts integers past 2^53); `start < end` is filtered first so
  * `Sequence` never sees an empty interval (it would run DESCENDING).
  * Inner-join null semantics are preserved: a null timestamp yields a
  * null bin (dropped by the equi-join), a null interval bound yields a
  * null sequence (explodes to zero rows).
  *
  * Fires only on Inner joins where no conjunct is already a cross-side
  * equality — after one application the new join HAS one, so the rule
  * is a no-op on its own output (safe under the optimizer's fixedPoint).
  * Bin width comes from `spark.graft.intervalJoin.binSeconds` (default
  * 3600); size it near the typical interval length so the per-interval
  * explode stays O(1). Registered by [[graft.GraftExtensions]].
  *
  * Guardrails (the rule rewrites ARBITRARY user joins, so it must not
  * silently make one worse):
  *
  *  - `spark.graft.intervalJoin.enabled` (default true) turns the
  *    rewrite off wholesale.
  *  - `spark.graft.intervalJoin.maxBinsPerInterval` (default 4096)
  *    bounds the per-interval explode factor. Interval spans are data,
  *    not plan properties, so a plan-time fallback is impossible — the
  *    cap is enforced at RUNTIME by a guard expression on the bin
  *    sequence that raises an actionable error (raise binSeconds, raise
  *    the cap, or disable the rule) instead of fabricating span/width
  *    rows per interval. A loud stop beats both silent intermediate
  *    blowup and a silent nested-loop: at 100 TB an unplanned
  *    1e6×-explode IS an outage, just an undiagnosable one.
  */
object BinnedIntervalJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val BinSecondsConf = "spark.graft.intervalJoin.binSeconds"
  val EnabledConf = "spark.graft.intervalJoin.enabled"
  val MaxBinsConf = "spark.graft.intervalJoin.maxBinsPerInterval"

  /** Per-plan bin-width override. A session-conf width only reaches the
    * optimizer runs that happen INSIDE the window where it's set; every
    * action on a Dataset (`count`, a write, …) builds a fresh
    * `QueryExecution` later, after a query-scoped conf has been
    * restored. Tagging the analyzed Join node instead travels with the
    * plan itself — the transform machinery copies tags whenever an
    * optimizer rule replaces the node, so the width survives into every
    * downstream re-optimization without leaking session-wide state. */
  val BinSecondsTag: TreeNodeTag[Long] =
    TreeNodeTag[Long]("graft.intervalJoin.binSeconds")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledConf, "true").toBoolean) return plan
    val binSeconds =
      conf.getConfString(BinSecondsConf, "3600").toLong
    val maxBins =
      conf.getConfString(MaxBinsConf, "4096").toLong
    require(binSeconds > 0, s"$BinSecondsConf must be > 0")
    require(maxBins > 0, s"$MaxBinsConf must be > 0")
    plan transformUp {
      case j @ Join(_, _, Inner, Some(cond), _)
          if j.resolved && eligible(j, cond) =>
        val width = j.getTagValue(BinSecondsTag).getOrElse(binSeconds)
        require(width > 0, s"$BinSecondsTag must be > 0")
        rewrite(j, cond, width, maxBins)
    }
  }

  /** The timestamp column + bounds of one matched range pair. */
  private case class RangePair(pt: Expression, start: Expression,
      end: Expression)

  private def sidesOf(j: Join, e: Expression): (Boolean, Boolean) = {
    val refs = e.references
    (refs.subsetOf(j.left.outputSet) && refs.nonEmpty,
      refs.subsetOf(j.right.outputSet) && refs.nonEmpty)
  }

  /** `a` from one side only, `b` wholly from the other. */
  private def crossSide(j: Join, a: Expression, b: Expression): Boolean = {
    val (al, ar) = sidesOf(j, a)
    val (bl, br) = sidesOf(j, b)
    (al && br) || (ar && bl)
  }

  private def isTs(e: Expression): Boolean = e.dataType == TimestampType

  /** Normalize `pt >= start` / `start <= pt` to (pt, start). */
  private def lowerBound(c: Expression): Option[(Expression, Expression)] =
    c match {
      case GreaterThanOrEqual(pt, s) => Some((pt, s))
      case LessThanOrEqual(s, pt) => Some((pt, s))
      case _ => None
    }

  /** Normalize `pt < end` / `end > pt` to (pt, end). */
  private def upperBound(c: Expression): Option[(Expression, Expression)] =
    c match {
      case LessThan(pt, e) => Some((pt, e))
      case GreaterThan(e, pt) => Some((pt, e))
      case _ => None
    }

  private def findPair(j: Join, conjuncts: Seq[Expression]): Option[RangePair] = {
    val lowers = conjuncts.flatMap(lowerBound(_)).filter { case (pt, s) =>
      isTs(pt) && isTs(s) && crossSide(j, pt, s)
    }
    val uppers = conjuncts.flatMap(upperBound(_)).filter { case (pt, e) =>
      isTs(pt) && isTs(e) && crossSide(j, pt, e)
    }
    (for {
      (pt1, s) <- lowers
      (pt2, e) <- uppers
      if pt1.semanticEquals(pt2)
      // Both bounds must live on the side opposite the point.
      if sidesOf(j, s) == sidesOf(j, e)
    } yield RangePair(pt1, s, e)).headOption
  }

  private def eligible(j: Join, cond: Expression): Boolean = {
    val conjuncts = splitConjunctivePredicates(cond)
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => crossSide(j, a, b)
      case EqualNullSafe(a, b) => crossSide(j, a, b)
      case _ => false
    }
    !hasEqui && findPair(j, conjuncts).isDefined
  }

  private def rewrite(j: Join, cond: Expression, binSeconds: Long,
      maxBins: Long): LogicalPlan = {
    val pair = findPair(j, splitConjunctivePredicates(cond)).get
    val width = Literal(binSeconds * 1000000L, LongType)
    def binOfUs(us: Expression) = IntegralDivide(us, width)
    def binOf(ts: Expression) = binOfUs(UnixMicros(ts))

    val (ptOnLeft, _) = sidesOf(j, pair.pt)
    val (pointsChild, intervalsChild) =
      if (ptOnLeft) (j.left, j.right) else (j.right, j.left)

    val pbin = Alias(binOf(pair.pt), "_graft_pbin")()
    val points = Project(pointsChild.output :+ pbin, pointsChild)

    val ibin = AttributeReference("_graft_ibin", LongType, nullable = false)()
    val startBin = binOf(pair.start)
    val endBin = binOfUs(Subtract(UnixMicros(pair.end), Literal(1L, LongType)))
    // Runtime explode-factor guard (see object doc): an interval
    // covering more than maxBins bins raises instead of silently
    // fabricating that many rows. Null bounds pass through (they
    // explode to zero rows, same as before). The guard is a no-op +0
    // on the start bound when within budget, so it folds into the
    // Sequence evaluation without changing results.
    val nBins = Add(Subtract(endBin, startBin), Literal(1L, LongType))
    val guardMsg = Concat(Seq(
      Literal.create(
        "graft binned interval join: an interval spans ", StringType),
      Cast(nBins, StringType),
      Literal.create(
        s" bins of $binSeconds s (cap $maxBins). Raise $BinSecondsConf" +
          s" toward the typical interval length, raise $MaxBinsConf, or" +
          s" disable the rewrite with $EnabledConf=false.", StringType)))
    val guarded = If(
      Or(IsNull(nBins), LessThanOrEqual(nBins, Literal(maxBins, LongType))),
      Literal(0L, LongType),
      Cast(RaiseError(guardMsg), LongType))
    // Sequence is TimeZoneAware and stays UNRESOLVED until the zone is
    // set (irrelevant for Long bounds, but required for `resolved`).
    val seq = Sequence(
      Add(startBin, guarded),
      endBin,
      Some(Literal(1L, LongType)), Some(conf.sessionLocalTimeZone))
    val intervals = Generate(Explode(seq), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(ibin),
      child = Filter(LessThan(pair.start, pair.end), intervalsChild))

    val (newLeft, newRight) =
      if (ptOnLeft) (points, intervals) else (intervals, points)
    val newCond = And(EqualTo(pbin.toAttribute, ibin), cond)
    Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
  }
}
