package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite an inequality-only interval join into the
  * binned equi-join `operators.AsOf.rangeJoin` authors by hand — so a
  * plain-SQL `SELECT ... FROM points JOIN intervals ON p >= s AND p < e`
  * gets a shuffleable plan instead of the broadcast-nested-loop join
  * Spark falls back to when a join has no equality keys (O(n·m) compares
  * — the plan that dies first at 100 TB; the commercial engines ship the
  * same rewrite as their "range join optimization").
  *
  * Shape matched: an INNER join whose condition contains a lower bound
  * (`p >= s` / `p > s`) and an upper bound (`p <= e` / `p < e`) on the
  * SAME integral point expression, where the point comes from one side
  * and both bounds from the other, and the condition contains no
  * cross-side equality (if it does, Spark already has an equi key and
  * needs no help). Opt-in: set [[ConfKey]] to the bin width (in the point
  * column's units, ideally ≈ the max interval span).
  *
  * The rewrite adds `bin(x) = x DIV width` to the point side, explodes
  * each interval to `sequence(bin(s), bin(e))`, and joins on bin equality
  * with the ORIGINAL condition kept as residual — correctness therefore
  * never depends on the bin math beyond coverage, which holds because
  * truncating division is monotone: `s ≤ p ≤ e ⇒ bin(s) ≤ bin(p) ≤
  * bin(e)` for any sign. A final Project restores the join's exact
  * output. The rewritten join HAS an equality conjunct, so the guard
  * stops the rule from firing again on its own output.
  */
object RangeJoinBinning extends Rule[LogicalPlan] with PredicateHelper {

  /** Session conf holding the bin width; unset/empty disables the rule. */
  val ConfKey = "spark.graft.rangeJoin.binWidth"

  /** Session conf capping bins per interval (default 2^20): one hot
    * interval must fail loudly, not explode a billion replicas — the
    * same contract as `AsOf.rangeJoin`'s maxBinsPerInterval. */
  val MaxBinsKey = "spark.graft.rangeJoin.maxBins"

  private val integral = Seq(ByteType, ShortType, IntegerType, LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(ConfKey, "").trim
    val parsed = width.toLongOption
    if (parsed.isEmpty || parsed.get <= 0) return plan
    val w = parsed.get
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if eligible(j, cond) =>
        extract(cond, j) match {
          case Some((point, lo, hi, pointOnLeft)) =>
            val (pointPlan, intervalPlan) =
              if (pointOnLeft) (left, right) else (right, left)
            def binOf(x: Expression) =
              IntegralDivide(Cast(x, LongType), Literal(w))
            // point side: one bin column
            val binP = Alias(binOf(point), "__graft_bin_p")()
            val pointProj = Project(pointPlan.output :+ binP, pointPlan)
            // interval side: one row per covered bin
            val binI = AttributeReference("__graft_bin_i", LongType,
              nullable = false)()
            // hot-interval guard (AsOf.rangeJoin's maxBinsPerInterval
            // contract): an interval spanning more than maxBins bins
            // fails loudly instead of exploding its replicas
            val maxBins = conf.getConfString(MaxBinsKey, "")
              .trim.toLongOption.getOrElse(1L << 20)
            val loBin = binOf(lo)
            val rawHi = binOf(hi)
            // RaiseError must be the TRUE branch: a NULL interval bound
            // makes the span predicate NULL and If takes the FALSE
            // branch on NULL — with raise in the false branch a
            // NULL-bounded row would FAIL the query that the
            // unrewritten join simply drops (advisor r13). With raise
            // on true, a NULL predicate falls through to rawHi = NULL,
            // Sequence goes NULL, and the non-outer Explode emits no
            // rows — matching original join semantics (NULL fails the
            // range predicate).
            val guarded = If(
              GreaterThanOrEqual(Subtract(rawHi, loBin), Literal(maxBins)),
              Cast(new RaiseError(Literal(
                s"RangeJoinBinning: interval spans more than $maxBins bins " +
                  s"at binWidth=$w — widen $ConfKey or raise $MaxBinsKey")),
                LongType),
              rawHi)
            // inverted intervals (e < s) must emit NOTHING: their
            // negative span passes the guard above, and Sequence
            // without an explicit step defaults to step -1 when
            // start > stop — one bad row like (s=2^40, e=0) would
            // enumerate ~10^12 descending bins, the exact blow-up
            // maxBins exists to prevent (advisor r13). NULL-ing hiBin
            // makes Sequence NULL → zero replicas, matching the
            // original join (the residual s ≤ p ≤ e can never hold).
            val hiBin = If(LessThan(rawHi, loBin),
              Literal(null, LongType), guarded)
            // Sequence is TimeZoneAware — unused for longs, but an unset
            // timeZoneId leaves the expression unresolved post-rewrite.
            // The step is pinned to +1 so the sequence can never descend.
            val gen = Generate(
              Explode(new Sequence(loBin, hiBin, Some(Literal(1L)),
                Some(conf.sessionLocalTimeZone))),
              Seq.empty, outer = false, qualifier = None,
              generatorOutput = Seq(binI), child = intervalPlan)
            val (newLeft, newRight) =
              if (pointOnLeft) (pointProj, gen) else (gen, pointProj)
            val newCond = And(EqualTo(binP.toAttribute, binI), cond)
            Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
          case None => j
        }
    }
  }

  /** Only joins with NO cross-side equality conjunct (those are already
    * shuffleable) and only deterministic conditions. */
  private def eligible(j: Join, cond: Expression): Boolean = {
    if (!cond.deterministic) return false
    val crossEq = splitConjunctivePredicates(cond).exists {
      case EqualTo(a, b) => spans(a, b, j)
      case EqualNullSafe(a, b) => spans(a, b, j)
      case _ => false
    }
    !crossEq
  }

  /** a and b reference opposite sides of j. */
  private def spans(a: Expression, b: Expression, j: Join): Boolean = {
    def side(e: Expression): Int =
      if (e.references.isEmpty) 0
      else if (e.references.subsetOf(j.left.outputSet)) 1
      else if (e.references.subsetOf(j.right.outputSet)) 2
      else 0
    val (sa, sb) = (side(a), side(b))
    sa > 0 && sb > 0 && sa != sb
  }

  /** Find (point, lower, upper, pointOnLeft): both bounds on the same
    * integral point expression, point and bounds from opposite sides. */
  private def extract(cond: Expression, j: Join)
      : Option[(Expression, Expression, Expression, Boolean)] = {
    // normalize each conjunct to (point-candidate, bound, isLower)
    val cmp = splitConjunctivePredicates(cond).flatMap {
      case GreaterThanOrEqual(p, s) => Seq((p, s, true), (s, p, false))
      case GreaterThan(p, s)        => Seq((p, s, true), (s, p, false))
      case LessThanOrEqual(p, e)    => Seq((p, e, false), (e, p, true))
      case LessThan(p, e)           => Seq((p, e, false), (e, p, true))
      case _ => Nil
    }
    def sideOf(e: Expression): Option[Boolean] =
      if (e.references.nonEmpty && e.references.subsetOf(j.left.outputSet))
        Some(true)
      else if (e.references.nonEmpty && e.references.subsetOf(j.right.outputSet))
        Some(false)
      else None
    val candidates = for {
      (p, lo, true) <- cmp
      if integral.contains(p.dataType) && p.deterministic
      pSide <- sideOf(p).toSeq
      loSide <- sideOf(lo).toSeq if loSide != pSide
      (p2, hi, false) <- cmp
      if p2.semanticEquals(p)
      hiSide <- sideOf(hi).toSeq if hiSide != pSide
      if integral.contains(lo.dataType) && integral.contains(hi.dataType)
      if lo.deterministic && hi.deterministic
    } yield (p, lo, hi, pSide)
    candidates.headOption
  }
}
