package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Bucketed-range-join optimizer rule — the whole-operator Catalyst
  * extension for interval joins.
  *
  * Open-source Spark has no range-join optimization: an inner join whose
  * only cross-side predicates are inequalities (`point BETWEEN lo AND hi`)
  * plans as BroadcastNestedLoopJoin — or a full CartesianProduct when
  * neither side broadcasts — which is O(|L|·|R|) comparisons and the join
  * that actually falls over first at 100 TB (event-in-window attribution,
  * IP-range lookups, sensor-interval alignment all have this shape and
  * often no equi key at all).
  *
  * This `Rule[LogicalPlan]` rewrites the naive join into the standard
  * bucketed form, entirely as logical-plan surgery:
  *
  *   - the POINT side gains one column `bucket(p) = toLong(p) div W`;
  *   - the INTERVAL side explodes to one row per bucket its `[lo, hi]`
  *     range overlaps (`Generate(Explode(Sequence(div lo, div hi)))`);
  *   - the join becomes an EQUI-join on the bucket with the ORIGINAL
  *     condition retained as residual filter, then projects back to the
  *     original output.
  *
  * Catalyst then plans a shuffled hash / sort-merge join keyed on the
  * bucket: cost drops from |L|·|R| to shuffle + per-bucket work, and each
  * matching (point, interval) pair meets in EXACTLY one bucket (a point
  * has one bucket; the interval emits each overlapped bucket once), so no
  * dedup is needed and the residual keeps semantics bit-exact — the
  * rewrite is a pure physical-cost transform. Truncating division is
  * monotone for W > 0, so p ∈ [lo, hi] ⇒ div(p) ∈ [div(lo), div(hi)]
  * (negatives included); degenerate lo > hi intervals emit one never-
  * matching bucket row instead of tripping Sequence's bounds check; null
  * bounds/points yield null buckets, which inner-equality drops — the
  * same rows the range predicate itself would drop.
  *
  * The bucket width W (in the column's long projection: seconds for
  * timestamps, the value itself for integrals) comes from
  * [[RangeJoinRule.WidthConfKey]] — width choice is a data statement
  * (match the typical interval length), so it is the caller's knob, and
  * the rule is inert while the conf is unset. Registered both ways:
  * `SparkSessionExtensions.injectOptimizerRule` (builder path) and
  * `spark.experimental.extraOptimizations` (existing-session path); both
  * batches run to fixed point, and the rewrite cannot self-reapply
  * because its own output contains a cross-side equality, which makes the
  * join ineligible.
  */
object RangeJoinRule extends Rule[LogicalPlan] {

  val WidthConfKey = "spark.graft.rangeJoin.binWidth"

  /** Upper bound on buckets a single interval may explode into. One outlier
    * interval wide relative to W — the classic SCD2 open-end sentinel
    * (valid_to = 9999-12-31) at W = 7 days is ~400k buckets — would
    * otherwise multiply rows arbitrarily or trip Sequence's max-array-length
    * error mid-query, at exactly the scale the rule targets. Eligible bounds
    * always reference interval-side columns (never foldable), so the guard
    * is necessarily per-row: a too-wide interval fails fast with a message
    * naming both confs instead of letting Sequence blow up opaquely.
    */
  val MaxBucketsConfKey = "spark.graft.rangeJoin.maxBucketsPerInterval"
  val DefaultMaxBuckets = 10000L

  private def width: Option[Long] =
    Option(conf.getConfString(WidthConfKey, null))
      .flatMap(s => scala.util.Try(s.trim.toLong).toOption)
      .filter(_ > 0)

  private def maxBuckets: Long =
    Option(conf.getConfString(MaxBucketsConfKey, null))
      .flatMap(s => scala.util.Try(s.trim.toLong).toOption)
      .filter(_ > 0)
      .getOrElse(DefaultMaxBuckets)

  override def apply(plan: LogicalPlan): LogicalPlan = width match {
    case None => plan
    case Some(w) =>
      plan.transformUp {
        case j @ Join(_, _, Inner, Some(cond), _) =>
          rewrite(j, cond, w).getOrElse(j)
      }
  }

  /** Monotone long projection of an orderable column for bucketing:
    * integrals cast straight to long; timestamps via epoch seconds (NTZ
    * through the session-zone instant, monotone for any fixed zone).
    * Types outside this set make the join ineligible rather than wrong.
    */
  private def toLong(e: Expression): Option[Expression] = {
    // timezone-aware casts are unresolved without an explicit zone id
    def cast(c: Expression, dt: DataType) = Cast(c, dt, Some(conf.sessionLocalTimeZone))
    e.dataType match {
      case LongType | IntegerType | ShortType | ByteType => Some(cast(e, LongType))
      case TimestampType => Some(cast(e, LongType))
      case TimestampNTZType => Some(cast(cast(e, TimestampType), LongType))
      case _ => None
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** (point, bound) for a lower-bound conjunct `point >= bound` in either
    * written order, else None; strict variants count too (the residual
    * keeps exactness — the bucket range is a superset).
    */
  private def lowerOf(c: Expression): Option[(Expression, Expression)] = c match {
    case GreaterThanOrEqual(p, lo) => Some((p, lo))
    case GreaterThan(p, lo)        => Some((p, lo))
    case LessThanOrEqual(lo, p)    => Some((p, lo))
    case LessThan(lo, p)           => Some((p, lo))
    case _ => None
  }

  private def upperOf(c: Expression): Option[(Expression, Expression)] = c match {
    case LessThanOrEqual(p, hi)    => Some((p, hi))
    case LessThan(p, hi)           => Some((p, hi))
    case GreaterThanOrEqual(hi, p) => Some((p, hi))
    case GreaterThan(hi, p)        => Some((p, hi))
    case _ => None
  }

  private def rewrite(j: Join, cond: Expression, w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjuncts(cond)
    def sideOf(e: Expression): Option[Boolean] = { // Some(true)=left, Some(false)=right
      val r = e.references
      if (r.isEmpty) None
      else if (r.subsetOf(j.left.outputSet)) Some(true)
      else if (r.subsetOf(j.right.outputSet)) Some(false)
      else None
    }
    // an existing cross-side equality (plain or null-safe) means Catalyst
    // already has an equi key and would hash-join without our help — leave
    // the join alone (also the self-reapplication guard)
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (for (sa <- sideOf(a); sb <- sideOf(b)) yield sa != sb).getOrElse(false)
      case EqualNullSafe(a, b) =>
        (for (sa <- sideOf(a); sb <- sideOf(b)) yield sa != sb).getOrElse(false)
      case _ => false
    }
    if (hasEqui) return None

    // find a lower and an upper bound on the SAME point expression, with
    // the point on one side and both bounds on the other
    val candidates = for {
      cLo <- conjuncts; (p1, lo) <- lowerOf(cLo).toSeq
      cHi <- conjuncts; (p2, hi) <- upperOf(cHi).toSeq
      if p1.semanticEquals(p2)
      pSide <- sideOf(p1).toSeq
      loSide <- sideOf(lo).toSeq; hiSide <- sideOf(hi).toSeq
      if loSide == hiSide && loSide != pSide
      pL <- toLong(p1).toSeq; loL <- toLong(lo).toSeq; hiL <- toLong(hi).toSeq
    } yield (pSide, pL, loL, hiL)

    // NB: a plan-time width check is impossible by construction — eligible
    // bounds always reference the interval side's columns (sideOf demands
    // it), so they are never foldable; the guard has to be per-row.
    val maxB = maxBuckets
    candidates.headOption.map { case (pointOnLeft, pL, loL, hiL) =>
      val wLit = Literal(w, LongType)
      val pBucket = Alias(IntegralDivide(pL, wLit), "__graft_range_bucket_p")()
      val divLo = IntegralDivide(loL, wLit)
      val divHi = IntegralDivide(hiL, wLit)
      // Greatest: a degenerate lo > hi interval emits its lo bucket (the
      // residual drops any match) instead of a Sequence bounds error
      val cappedHi = Greatest(Seq(divLo, divHi))
      // runtime guard: a row whose interval overlaps more than maxB buckets
      // fails fast with a message naming both confs, instead of multiplying
      // rows arbitrarily or tripping Sequence's opaque max-array-length error
      val nBuckets = Add(Subtract(cappedHi, divLo), Literal(1L, LongType))
      val failMsg = Concat(Seq(
        Literal(s"graft range join: interval spans "),
        Cast(nBuckets, StringType),
        Literal(s" buckets at width $w, over the $MaxBucketsConfKey limit of $maxB; " +
          s"raise that limit, widen $WidthConfKey, or filter open-ended sentinel intervals")))
      // null-safe: a NULL bound makes nBuckets NULL, and If treats a NULL
      // predicate as false — without IsNull the guard would fire RaiseError
      // on exactly the rows (open-ended SCD2 NULL valid_to) the scaladoc
      // promises to drop. NULL flows into Sequence -> NULL -> Explode drops.
      val guardedHi = If(
        Or(IsNull(nBuckets), LessThanOrEqual(nBuckets, Literal(maxB, LongType))),
        cappedHi,
        RaiseError(Literal("USER_RAISED_EXCEPTION"),
          CreateMap(Seq(Literal("errorMessage"), failMsg)), LongType))
      val seq = Sequence(divLo, guardedHi, Some(Literal(1L, LongType)),
                         Some(conf.sessionLocalTimeZone))
      val iBucket = AttributeReference("__graft_range_bucket_i", LongType)()

      val (pointPlan, intervalPlan) = if (pointOnLeft) (j.left, j.right) else (j.right, j.left)
      val pointNew = Project(pointPlan.output :+ pBucket, pointPlan)
      val intervalNew = Generate(Explode(seq), unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(iBucket), child = intervalPlan)
      val newCond = And(EqualTo(pBucket.toAttribute, iBucket), cond)
      val (newLeft, newRight) = if (pointOnLeft) (pointNew, intervalNew) else (intervalNew, pointNew)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
    }
  }
}
