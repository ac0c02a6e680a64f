package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, JoinType}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/**
 * Optimizer rule: rewrite cartesian-bound BAND joins into bucketed
 * equi-joins.
 *
 * An inner join whose only cross-side predicate is a time/offset band —
 * `abs(a.ts - b.ts) <= C`, or `b.ts BETWEEN a.ts - C1 AND a.ts + C2` —
 * has no equi key, so Spark plans BroadcastNestedLoopJoin / cartesian:
 * O(|L|·|R|) comparisons, dead at scale. But a band admits the classic
 * quantization: with bucket width B = hi − lo, any qualifying pair sits
 * in the same or adjacent B-buckets, so the probe side fans out to (at
 * most) 2 bucket values, the build side computes 1, and the join becomes
 * a plain hash equi-join on the bucket — candidate generation linear in
 * join output, the original predicate re-checked exactly afterwards.
 * This rule performs that rewrite automatically, so a user writing the
 * naive predicate (including via `spark.sql`) gets the scalable plan
 * [[graft.queries.JoinQueries]]'s j2 hand-builds.
 *
 * Soundness: bounds are normalized to lo <= y − x <= hi over the SAME
 * canonical operand pair (x from the left side, y from the right, both
 * integral after Cast to long). Bucketing uses exact integral floor
 * division (v − pmod(v, B)) div B, valid for negatives; an interval of
 * length B spans at most two width-B buckets, so probing
 * {bucket(x+lo), bucket(x+hi)} (deduplicated — no double matches) covers
 * every qualifying y. The original condition is kept in the rewritten
 * join, so the rewrite can only be a performance change, never a
 * semantic one. Offsets are assumed not to overflow Long (timestamps /
 * offsets, not adversarial extremes).
 *
 * Conservatism: fires only on Inner (or conditioned Cross, which is
 * semantically Inner — `crossJoin().filter(band)` arrives that way after
 * predicate pushdown) joins that have NO equi-key conjunct
 * (the cartesian-bound case — anything with an equi key already hash
 * partitions, and widening those is a cost call this rule doesn't make).
 * After one application the bucket equality IS an equi key, so the rule
 * is idempotent. Disable with spark.graft.bandJoinRewrite=false.
 */
object BandJoinRewrite extends Rule[LogicalPlan] {

  private def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  private def litLong(e: Expression): Option[Long] = e match {
    case Literal(v, t) if isIntegral(t) && v != null => Some(v.toString.toLong)
    case _ => None
  }

  /** Strip `± integral-literal` wrappers: returns (base, offset). */
  private def baseOffset(e: Expression): (Expression, Long) = e match {
    case Add(b, l, _) if litLong(l).isDefined =>
      val (bb, o) = baseOffset(b); (bb, o + litLong(l).get)
    case Add(l, b, _) if litLong(l).isDefined =>
      val (bb, o) = baseOffset(b); (bb, o + litLong(l).get)
    case Subtract(b, l, _) if litLong(l).isDefined =>
      val (bb, o) = baseOffset(b); (bb, o - litLong(l).get)
    case other => (other, 0L)
  }

  /** One bound on (y − x): (x, y, c, isUpper). */
  private type Bound = (Expression, Expression, Long, Boolean)

  /** Normalize `p <= q` into a bound on (y − x). */
  private def le(p: Expression, q: Expression,
      leftOut: AttributeSet, rightOut: AttributeSet): Option[Bound] = {
    val (pb, po) = baseOffset(p)
    val (qb, qo) = baseOffset(q)
    if (pb.references.isEmpty || qb.references.isEmpty) None
    else if (!isIntegral(pb.dataType) || !isIntegral(qb.dataType)) None
    else if (pb.references.subsetOf(leftOut) && qb.references.subsetOf(rightOut))
      Some((pb, qb, po - qo, false)) //  x+po <= y+qo  ⇒  y−x >= po−qo
    else if (pb.references.subsetOf(rightOut) && qb.references.subsetOf(leftOut))
      Some((qb, pb, qo - po, true)) //  y+po <= x+qo  ⇒  y−x <= qo−po
    else None
  }

  private def bounds(c: Expression,
      leftOut: AttributeSet, rightOut: AttributeSet): Seq[Bound] = c match {
    // abs(p − q) <= C  ⇒  both bounds at once. The offset from le() is
    // sign-correct for both the le(p,q) and le(q,p) branches:
    // abs((x+po) − (y+qo)) <= C  ⇒  y − x ∈ [off − C, off + C] with
    // off = po − qo, and the swapped branch returns qo − po for its own
    // (x, y) orientation — same formula either way.
    case LessThanOrEqual(Abs(Subtract(p, q, _), _), l) if litLong(l).isDefined =>
      val cc = litLong(l).get
      le(p, q, leftOut, rightOut).orElse(le(q, p, leftOut, rightOut)).toSeq
        .flatMap { case (x, y, off, _) =>
          Seq((x, y, off - cc, false), (x, y, off + cc, true)) }
    case LessThanOrEqual(a, b) => le(a, b, leftOut, rightOut).toSeq
    case LessThan(a, b) => le(a, b, leftOut, rightOut).toSeq // strict ⊂ closed
    case GreaterThanOrEqual(a, b) => le(b, a, leftOut, rightOut).toSeq
    case GreaterThan(a, b) => le(b, a, leftOut, rightOut).toSeq
    case _ => Nil
  }

  private def hasEquiKey(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Boolean =
    conjuncts(cond).exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(left.outputSet) &&
          b.references.subsetOf(right.outputSet) && a.references.nonEmpty &&
          b.references.nonEmpty) ||
        (a.references.subsetOf(right.outputSet) &&
          b.references.subsetOf(left.outputSet) && a.references.nonEmpty &&
          b.references.nonEmpty)
      case EqualNullSafe(a, b) =>
        (a.references.subsetOf(left.outputSet) &&
          b.references.subsetOf(right.outputSet)) ||
        (a.references.subsetOf(right.outputSet) &&
          b.references.subsetOf(left.outputSet))
      case _ => false
    }

  /** (v − pmod(v, B)) div B — exact floor division for any sign. */
  private def floorDiv(v: Expression, b: Expression): Expression =
    IntegralDivide(Subtract(v, Pmod(v, b)), b)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.bandJoinRewrite", "true").toBoolean)
      return plan
    plan.transformUp {
      // Cross-with-condition arises when a filter over crossJoin is
      // pushed into the join; it is semantically Inner, so rewrite both
      case j @ Join(left, right, Inner | Cross, Some(cond), hint)
          if !hasEquiKey(cond, left, right) =>
        // tightest band per canonical (x, y) pair
        val all = conjuncts(cond).flatMap(bounds(_, left.outputSet, right.outputSet))
        val band = all.groupBy { case (x, y, _, _) =>
            (x.canonicalized, y.canonicalized) }
          .values.flatMap { bs =>
            val los = bs.collect { case (_, _, c, false) => c }
            val his = bs.collect { case (_, _, c, true) => c }
            if (los.isEmpty || his.isEmpty) None
            else {
              val (lo, hi) = (los.max, his.min)
              if (hi - lo >= 1L) Some((bs.head._1, bs.head._2, lo, hi)) else None
            }
          } match {
            // several independent band pairs: bucket on the NARROWEST
            // (most selective — fewest candidates per bucket); the other
            // bands remain in the kept original condition
            case cs if cs.isEmpty => None
            case cs => Some(cs.minBy { case (_, _, lo, hi) => hi - lo })
          }
        band match {
          case None => j
          case Some((x, y, lo, hi)) =>
            val b = Literal(hi - lo, LongType)
            val xl = Cast(x, LongType)
            val yl = Cast(y, LongType)
            val probes = ArrayDistinct(CreateArray(Seq(
              floorDiv(Add(xl, Literal(lo, LongType)), b),
              floorDiv(Add(xl, Literal(hi, LongType)), b))))
            val elem = probes.dataType.asInstanceOf[ArrayType]
            val probeAttr = AttributeReference("__graft_band_probe",
              elem.elementType, elem.containsNull)()
            val gen = Generate(Explode(probes), unrequiredChildIndex = Nil,
              outer = false, qualifier = None,
              generatorOutput = Seq(probeAttr), child = left)
            val buildAlias = Alias(floorDiv(yl, b), "__graft_band_bucket")()
            val newRight = Project(right.output :+ buildAlias, right)
            val newJoin = Join(gen, newRight, Inner,
              Some(And(EqualTo(probeAttr, buildAlias.toAttribute), cond)), hint)
            Project(j.output, newJoin)
        }
    }
  }
}
