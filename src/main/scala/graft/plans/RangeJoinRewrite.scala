package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: rewrite interval-containment theta joins into
  * bucketed equi-joins.
  *
  * Stock Spark plans `a JOIN b ON a.p >= b.lo AND a.p <= b.lo + W`
  * (W literal) as a BroadcastNestedLoopJoin — quadratic, the classic
  * 100 TB scale-killer. But a fixed-width interval admits the standard
  * binning rewrite (the same one `Joins.rangeJoinBucketed` applies by
  * hand, and that commercial engines expose as a "range join hint"):
  * bucket both sides by width W, explode the interval side to its two
  * covering buckets, equi-join on the bucket id, re-apply the exact
  * predicate. One hash shuffle, linear in matches.
  *
  * Scope guards (fall through untouched otherwise):
  *  - INNER join whose condition contains a lower and an upper bound
  *    on the same point expression, with `hi = lo + <numeric literal>`
  *    (either Add order), point and bound coming from opposite sides;
  *  - no existing cross-side equality conjunct (then Spark already
  *    equi-joins and the rewrite would only add work — this also makes
  *    the rule idempotent, since the rewritten join HAS one);
  *  - positive literal width.
  *
  * Bucket ids are computed as floor(x / W) in DOUBLE: exact for
  * |x/W| < 2^52; beyond that both sides mis-bucket IDENTICALLY only
  * when they round the same way, so the rule is not applied to
  * integral points wider than 52 bits.
  *
  * Registered through `spark.experimental.extraOptimizations` (see
  * `GraftExtensions.register`) or `injectOptimizerRule`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def litDouble(e: Expression): Option[Double] = e match {
    case Literal(v: Byte, _)    => Some(v.toDouble)
    case Literal(v: Short, _)   => Some(v.toDouble)
    case Literal(v: Int, _)     => Some(v.toDouble)
    case Literal(v: Long, _)    => Some(v.toDouble)
    case Literal(v: Float, _)   => Some(v.toDouble)
    case Literal(v: Double, _)  => Some(v)
    case Literal(v: org.apache.spark.sql.types.Decimal, _) =>
      Some(v.toDouble)
    case _                      => None
  }

  /** e as a lower bound: Some((point, bound)) if e ⇔ point >= bound. */
  private def asLower(e: Expression): Option[(Expression, Expression)] =
    e match {
      case GreaterThanOrEqual(p, lo) => Some((p, lo))
      case GreaterThan(p, lo)        => Some((p, lo))
      case LessThanOrEqual(lo, p)    => Some((p, lo))
      case LessThan(lo, p)           => Some((p, lo))
      case _                         => None
    }

  /** e as an upper bound: Some((point, bound)) if e ⇔ point <= bound. */
  private def asUpper(e: Expression): Option[(Expression, Expression)] =
    e match {
      case LessThanOrEqual(p, hi)    => Some((p, hi))
      case LessThan(p, hi)           => Some((p, hi))
      case GreaterThanOrEqual(hi, p) => Some((p, hi))
      case GreaterThan(hi, p)        => Some((p, hi))
      case _                         => None
    }

  /** hi decomposed as lo + w: Some((lo, w)) for either Add order. */
  private def asOffset(hi: Expression): Seq[(Expression, Double)] =
    hi match {
      case Add(lo, w, _) => litDouble(w).map(d => (lo, d)).toSeq ++
        litDouble(lo).map(d => (w, d)).toSeq
      case _ => Nil
    }

  private def fromOneSide(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty &&
      e.references.subsetOf(side.outputSet) && e.deterministic

  /** 52-bit-exact check for integral points (doubles are fine: their
    * magnitude already survived a double somewhere upstream). */
  private def bucketSafe(e: Expression): Boolean = e.dataType match {
    case LongType => false // can exceed 2^52 — don't risk mis-bucketing
    case _        => true
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && !hasCrossEquality(j, cond) =>
      rewrite(j, left, right, cond, hint).getOrElse(j)
  }

  private def hasCrossEquality(j: Join, cond: Expression): Boolean =
    splitConjunctivePredicates(cond).exists {
      case EqualTo(a, b) =>
        (fromOneSide(a, j.left) && fromOneSide(b, j.right)) ||
          (fromOneSide(a, j.right) && fromOneSide(b, j.left))
      case EqualNullSafe(a, b) =>
        (fromOneSide(a, j.left) && fromOneSide(b, j.right)) ||
          (fromOneSide(a, j.right) && fromOneSide(b, j.left))
      case _ => false
    }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression,
                      hint: JoinHint): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val candidates = for {
      lc <- conjuncts; (p, lo) <- asLower(lc).toSeq
      uc <- conjuncts if uc ne lc
      (p2, hi) <- asUpper(uc).toSeq if p.semanticEquals(p2)
      (lo2, w) <- asOffset(hi) if lo2.semanticEquals(lo) && w > 0
      if p.dataType.isInstanceOf[NumericType] && bucketSafe(p)
      // point on one side, bound wholly on the other
      swapped <-
        (if (fromOneSide(p, left) && fromOneSide(lo, right)) Seq(false)
        else if (fromOneSide(p, right) && fromOneSide(lo, left)) Seq(true)
        else Nil)
    } yield (p, lo, w, swapped)

    candidates.headOption.map { case (p, lo, w, swapped) =>
      val wLit = Literal(w, DoubleType)
      def bucket(e: Expression): Expression =
        Floor(Divide(Cast(e, DoubleType), wLit))
      // point side: scalar bucket via projection
      val pAlias = Alias(bucket(p), "__rj_bkt_p")()
      val (pointPlan, boundPlan) = if (swapped) (right, left) else (left, right)
      val newPoint = Project(pointPlan.output :+ pAlias, pointPlan)
      // bound side: the interval [lo, lo+w] spans at most the two
      // buckets around lo → explode them
      val b0 = bucket(lo)
      val bAttr = AttributeReference("__rj_bkt_b", LongType)()
      val newBound = Generate(
        Explode(CreateArray(Seq(b0, Add(b0, Literal(1L))))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(bAttr), child = boundPlan)
      val bktEq = EqualTo(pAlias.toAttribute, bAttr)
      val (nl, nr) =
        if (swapped) (newBound, newPoint) else (newPoint, newBound)
      Project(j.output,
        Join(nl, nr, Inner, Some(And(bktEq, cond)), hint))
    }
  }
}
