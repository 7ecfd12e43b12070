package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/**
 * Optimizer rule: rewrite an inner range θ-join
 * `points JOIN intervals ON ts >= lo AND ts <= hi` into a binned EQUALITY
 * join — Catalyst's native plan for a pure range condition is
 * BroadcastNestedLoopJoin (O(|points|·|intervals|) compare work and a
 * broadcast requirement that caps the interval side), which silently
 * stops scaling the moment either side grows. The rewrite adds
 * `ts div W` to the point side, explodes each interval into the bins it
 * overlaps, joins on bin equality, and keeps the original range
 * predicate as the in-bin refinement — `Ops.intervalJoin`'s shape,
 * applied automatically to any user query, SQL included.
 *
 * Fires only when `spark.graft.rangeJoin.binWidth` is set to a positive
 * long (the bin width is a data-dependent choice — near the typical
 * interval length — that the engine cannot infer), and only on inner
 * joins whose condition is EXACTLY the two integral range conjuncts with
 * the point attribute from one side and both bounds from the other. The
 * rewritten join's condition carries an extra equality conjunct, so the
 * pattern no longer matches — idempotent under the fixed-point batch.
 *
 * Correct for any values: `div` is monotonic, so lo ≤ ts ≤ hi implies
 * div(lo) ≤ div(ts) ≤ div(hi) — every qualifying pair shares the point's
 * (single) bin, and the retained range conjuncts discard in-bin false
 * candidates. Registered via [[GraftExtensions]].
 */
object RangeBinJoinRule extends Rule[LogicalPlan] {

  private val ConfKey = "spark.graft.rangeJoin.binWidth"

  private def binWidth: Option[Long] =
    scala.util.Try(conf.getConfString(ConfKey, "").toLong)
      .toOption.filter(_ > 0)

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** (ts, lo, hi) when cond is exactly `ts >= lo && ts <= hi` (either
    * conjunct order, either comparison direction) with ts attributed to
    * one join side and lo/hi to the other, all integral + deterministic. */
  private def extract(cond: Expression, left: LogicalPlan,
                      right: LogicalPlan): Option[(Expression, Expression, Expression)] = {
    def sideOf(e: Expression): Option[Boolean] = { // Some(true)=left
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(left.outputSet)) Some(true)
      else if (refs.subsetOf(right.outputSet)) Some(false)
      else None
    }
    // normalize each conjunct to (small, big) meaning small <= big
    def asLe(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThanOrEqual(a, b) => Some((a, b))
      case GreaterThanOrEqual(a, b) => Some((b, a))
      case _ => None
    }
    cond match {
      case And(c1, c2) =>
        (asLe(c1), asLe(c2)) match {
          case (Some((a1, b1)), Some((a2, b2))) =>
            // ts appears once as the big side (lo <= ts) and once as the
            // small side (ts <= hi); try both conjunct assignments
            val cands = Seq(
              (b1, a2, a1, b2), // c1 = lo <= ts, c2 = ts <= hi
              (b2, a1, a2, b1)) // c2 = lo <= ts, c1 = ts <= hi
            cands.collectFirst {
              case (ts1, ts2, lo, hi)
                if ts1.semanticEquals(ts2) &&
                  Seq(ts1, lo, hi).forall(e => integral(e) && e.deterministic) &&
                  sideOf(ts1).isDefined && sideOf(lo).isDefined &&
                  sideOf(lo) == sideOf(hi) && sideOf(ts1) != sideOf(lo) =>
                (ts1, lo, hi)
            }
          case _ => None
        }
      case _ => None
    }
  }

  private def divW(e: Expression, w: Long): Expression =
    IntegralDivide(Cast(e, LongType), Literal(w))

  override def apply(plan: LogicalPlan): LogicalPlan = binWidth match {
    case None => plan
    case Some(w) =>
      plan.transformUp {
        case j @ Join(left, right, Inner, Some(cond), hint) =>
          extract(cond, left, right) match {
            case Some((ts, lo, hi)) =>
              val tsOnLeft = ts.references.subsetOf(left.outputSet)
              val (pointSide, intervalSide) =
                if (tsOnLeft) (left, right) else (right, left)
              val binP = Alias(divW(ts, w), "__graft_binp")()
              val pointPlan = Project(pointSide.output :+ binP, pointSide)
              val binI = AttributeReference("__graft_bini", LongType,
                nullable = false)()
              // Sequence is TimeZoneAwareExpression: unresolved until a
              // timezone is bound, even for integral sequences
              val seqExpr = new Sequence(divW(lo, w), divW(hi, w))
                .withTimeZone(conf.sessionLocalTimeZone)
              val intervalPlan = Generate(
                Explode(seqExpr),
                unrequiredChildIndex = Nil, outer = false, qualifier = None,
                generatorOutput = Seq(binI), child = intervalSide)
              val newCond = And(EqualTo(binP.toAttribute, binI), cond)
              val (l2, r2) =
                if (tsOnLeft) (pointPlan, intervalPlan)
                else (intervalPlan, pointPlan)
              Project(j.output, Join(l2, r2, Inner, Some(newCond), hint))
            case None => j
          }
      }
  }
}
