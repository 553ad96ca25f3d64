package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Banded rewrite for point-in-interval theta joins.
  *
  * A join whose only cross-side predicates are range bounds —
  * `point >= lo AND point <= hi` with `point` from one side and
  * `lo`/`hi` from the other — has no equi-key, so Spark plans a
  * nested-loop join: broadcast if one side is small, else
  * quadratic-per-partition. At 100 TB that is a non-starter even when
  * result cardinality is modest (e.g. events landing in promo
  * windows, readings between calibration bounds).
  *
  * The standard fix (the shape behind Databricks' RANGE_JOIN bin
  * hint, here derived from first principles on public Spark APIs) is
  * to quantize the domain into fixed-width bands: the interval side
  * explodes onto every band its `[lo, hi]` overlaps, the point side
  * computes its single band, the two meet with an ordinary equi-join
  * on the band id, and the original predicate runs as a residual
  * filter. Catalyst then plans a shuffled sort-merge/hash join that
  * partitions on the band — distributed, skew-splittable by AQE, and
  * linear in matches per band instead of |L|×|R|.
  *
  * Shuffle volume on the interval side is rows × bands-per-interval,
  * so pick `binSize` of the same order as the typical interval width
  * (too fine multiplies the explode; too coarse fattens buckets
  * toward the nested-loop it replaces).
  *
  * Two entry points:
  *  - as an optimizer rule, gated on `spark.graft.rangeJoin.binSize`
  *    (> 0 enables; units: micros for timestamps, raw value for
  *    integers) and registered via [[graft.GraftExtensions]] — the
  *    user writes the naive declarative join and the engine makes it
  *    scale;
  *  - [[graft.ops.RangeJoin.banded]] applies the same rewrite to one
  *    DataFrame explicitly, no session conf involved.
  *
  * Supported: INNER joins; point/bounds of integral or timestamp
  * (with or without time zone) type; bounds may be arbitrary
  * expressions of their side (e.g.
  * `ts - INTERVAL 5 MINUTE`). Joins that already carry a cross-side
  * equi-conjunct are left untouched — Spark has a shuffle key there
  * and banding would only add work.
  */
object BandedRangeJoin extends Rule[LogicalPlan] {

  /** Band width; > 0 turns the automatic rewrite on. */
  val BinSizeConf = "spark.graft.rangeJoin.binSize"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val bin =
      try conf.getConfString(BinSizeConf, "0").toLong
      catch { case _: NumberFormatException => 0L }
    if (bin <= 0L) plan
    else plan.transform {
      case j: Join => rewriteJoin(j, bin).getOrElse(j)
    }
  }

  /** Rewrite one Join node, or None when the shape does not match. */
  def rewriteJoin(j: Join, binSize: Long): Option[LogicalPlan] = {
    require(binSize > 0, s"binSize must be positive, got $binSize")
    if (j.joinType != Inner) return None
    val cond = j.condition.getOrElse(return None)
    val conjuncts = splitConjuncts(cond)

    val leftOut = j.left.outputSet
    val rightOut = j.right.outputSet
    // Some(true) = references only the left side, Some(false) = only
    // the right; None = constant or mixed (unusable as a bound).
    def side(e: Expression): Option[Boolean] = {
      val r = e.references
      if (r.isEmpty) None
      else if (r.subsetOf(leftOut)) Some(true)
      else if (r.subsetOf(rightOut)) Some(false)
      else None
    }
    def crossSide(a: Expression, b: Expression): Boolean =
      (for { sa <- side(a); sb <- side(b) } yield sa != sb).getOrElse(false)

    // Already has a shuffle key — banding would be pure overhead.
    val hasEquiKey = conjuncts.exists {
      case EqualTo(a, b)       => crossSide(a, b)
      case EqualNullSafe(a, b) => crossSide(a, b)
      case _                   => false
    }
    if (hasEquiKey) return None

    // Normalize every cross-side inequality to (small, large).
    val ineqs = conjuncts.flatMap {
      case LessThanOrEqual(a, b) if crossSide(a, b)    => Seq((a, b))
      case LessThan(a, b) if crossSide(a, b)           => Seq((a, b))
      case GreaterThanOrEqual(a, b) if crossSide(a, b) => Seq((b, a))
      case GreaterThan(a, b) if crossSide(a, b)        => Seq((b, a))
      case _                                           => Nil
    }
    // A usable pattern is a pair (lo <= p, p <= hi) where p is the
    // same expression in both and lo/hi both live on p's other side.
    // Strict bounds band identically: p > lo still implies
    // band(p) ∈ [band(lo), band(hi)] because floorDiv is monotone.
    val pattern = (for {
      (lo, p1) <- ineqs.iterator
      (p2, hi) <- ineqs.iterator
      if p1.semanticEquals(p2)
      ps <- side(p1)
      ls <- side(lo)
      hs <- side(hi)
      if ls == hs && ls != ps
      if bandable(p1.dataType)
    } yield (p1, lo, hi, ps)).nextOption()

    pattern.map { case (point, lo, hi, pointOnLeft) =>
      val (pointPlan, intervalPlan) =
        if (pointOnLeft) (j.left, j.right) else (j.right, j.left)

      // Interval side: drop rows that cannot match (null or inverted
      // bounds — also keeps Sequence from throwing on lo > hi), then
      // explode onto every band the interval overlaps.
      val cellAttr = AttributeReference("__graft_band_cell", LongType,
        nullable = false)()
      val intervalFiltered = Filter(
        And(And(IsNotNull(lo), IsNotNull(hi)), LessThanOrEqual(lo, hi)),
        intervalPlan)
      val cells = Generate(
        Explode(new Sequence(
          floorDiv(toLong(lo), binSize),
          floorDiv(toLong(hi), binSize),
          Some(Literal(1L, LongType)),
          Some(conf.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil,
        outer = false,
        qualifier = None,
        generatorOutput = Seq(cellAttr),
        child = intervalFiltered)

      // Point side: a single band per row.
      val bandAlias = Alias(floorDiv(toLong(point), binSize), "__graft_band")()
      val banded = Project(
        pointPlan.output :+ bandAlias,
        Filter(IsNotNull(point), pointPlan))
      val bandAttr = bandAlias.toAttribute

      val (newLeft, newRight) =
        if (pointOnLeft) (banded, cells) else (cells, banded)
      // Residual keeps the ORIGINAL predicate verbatim, so strict
      // bounds, tolerance arithmetic, and extra conjuncts all apply
      // exactly; the equi-conjunct only routes candidates.
      val rejoined = Join(newLeft, newRight, Inner,
        Some(And(EqualTo(bandAttr, cellAttr), cond)), j.hint)
      Project(j.output, rejoined)
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  private def bandable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | TimestampType |
        TimestampNTZType => true
    case _ => false
  }

  /** Map the banded domain to Long: integral widens, timestamps use
    * exact epoch micros (no ANSI cast semantics involved). NTZ first
    * rebinds to an instant in the session zone — that mapping is
    * non-decreasing in local-datetime order (even across DST folds),
    * which is all band containment needs, and every bound of one
    * pattern converts through the same zone.
    */
  private def toLong(e: Expression): Expression = e.dataType match {
    case LongType         => e
    case TimestampType    => UnixMicros(e)
    case TimestampNTZType =>
      UnixMicros(Cast(e, TimestampType, Some(conf.sessionLocalTimeZone)))
    case _                => Cast(e, LongType)
  }

  /** Exact floor division in integer arithmetic (correct for negative
    * values, unlike truncating `div`): a - pmod(a, w) is divisible by
    * w, so the integral divide is exact.
    */
  private def floorDiv(a: Expression, w: Long): Expression = {
    val lw = Literal(w, LongType)
    IntegralDivide(Subtract(a, Pmod(a, lw)), lw)
  }
}
