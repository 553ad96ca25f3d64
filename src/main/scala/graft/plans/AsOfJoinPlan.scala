package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the whole-operator Catalyst extension tier
  * ((c) in the build plan: LogicalPlan + SparkStrategy + SparkPlan).
  *
  * Semantics: every left row joins the single right row with equal
  * keys and the greatest right-time that is `<=` the left row's time
  * (optionally within `toleranceMicros`). Left-outer (default) pads
  * unmatched left rows with nulls; `isInner = true` drops them — the
  * trades×quotes shape, and DuckDB's ASOF JOIN default. This is the
  * operator the window/union composition (q54/q184) emulates; here
  * it is ONE streaming merge pass per partition.
  *
  * Scale shape: `requiredChildDistribution` clusters both sides on
  * the join keys and `requiredChildOrdering` sorts within partitions
  * by (keys, time) — EnsureRequirements inserts exactly one exchange
  * + sort per side (same machinery as sort-merge join), and the
  * merge itself holds O(1) rows per key: no per-key buffering of the
  * probe side, no window state. At 100 TB this is a plain co-
  * partitioned merge, parallel in the key space.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceMicros: Option[Long],
    isInner: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (isInner) right.output
                    else right.output.map(_.withNullability(true)))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceMicros: Option[Long],
    isInner: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (isInner) right.output
                    else right.output.map(_.withNullability(true)))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning = left.outputPartitioning

  // left rows pass through in their sorted order
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  // callers null-check before converting — a NULL time never reaches here
  private def asMicros(v: Any): Long = v match {
    case l: Long      => l
    case i: Int       => i.toLong
    case n: Number    => n.longValue()
    case other => throw new IllegalArgumentException(
      s"as-of time must be integral/timestamp, got ${other.getClass}")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val tol = toleranceMicros
    val inner = isInner
    val leftOut = left.output
    val rightOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOut)
      val lTimeEval = BindReferences.bindReference(lTime, leftOut)
      val rTimeEval = BindReferences.bindReference(rTime, rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.size)

      /** The merge state + per-left-row scan, shared by both join
        * shapes: returns the matched right row or null, advancing the
        * right cursor monotonically (both inputs are (keys, time)
        * sorted, so state is O(1) rows).
        */
      final class Matcher {
        // lookahead right row not yet consumed (copied — sorter reuses rows)
        private var rNext: InternalRow = _
        // best match so far for the current key run (copied) + its time
        private var held: InternalRow = _
        private var heldKey: InternalRow = _
        private var heldT: Long = _

        def findMatch(lRow: InternalRow): InternalRow = {
          val lKey = lKeyProj(lRow)
          val lTimeVal = lTimeEval.eval(lRow)

          // SQL equi-join semantics: a NULL key or NULL time on the
          // left never matches (SMJ skips null keys; a null as-of time
          // has no "latest row at or before it"). Null-first sort
          // order puts these rows ahead of the real key runs, so
          // returning without scanning leaves the merge state intact.
          if (lKey.anyNull || lTimeVal == null) return null
          val lT = asMicros(lTimeVal)

          var scanning = true
          while (scanning) {
            if (rNext == null) {
              if (rIter.hasNext) rNext = rIter.next().copy()
              else scanning = false
            }
            if (rNext != null) {
              val rKey = rKeyProj(rNext)
              if (rKey.anyNull) {
                // null-keyed build rows can never match any left row
                rNext = null
              } else {
                val cmp = keyOrd.compare(rKey, lKey)
                if (cmp < 0) {
                  // right key already behind every remaining left key
                  rNext = null
                } else if (cmp > 0) {
                  scanning = false // hold for a later left key
                } else {
                  val rTimeVal = rTimeEval.eval(rNext)
                  if (rTimeVal == null) {
                    // a versionless build row is unusable as a match —
                    // and must never feed the staleness tolerance
                    rNext = null
                  } else {
                    val rT = asMicros(rTimeVal)
                    if (rT <= lT) {
                      // newer candidate at or before lT — keep the latest
                      held = rNext
                      heldKey = rKey.copy()
                      heldT = rT
                      rNext = null
                    } else {
                      scanning = false // too new for this left row
                    }
                  }
                }
              }
            }
          }

          // heldT <= lT always, so the staleness test subtracts two
          // real timestamps — no sentinel, no overflow path
          val matches = held != null && keyOrd.compare(heldKey, lKey) == 0 &&
            tol.forall(t => lT - heldT <= t)
          if (matches) held else null
        }
      }
      val m = new Matcher

      if (!inner) {
        // left-outer: 1:1 with the left input — project straight out
        // of the shared buffers, no copies
        new Iterator[InternalRow] {
          override def hasNext: Boolean = lIter.hasNext
          override def next(): InternalRow = {
            val lRow = lIter.next()
            val r = m.findMatch(lRow)
            resultProj(joined(lRow, if (r == null) nullRight else r))
          }
        }
      } else {
        // inner: unmatched left rows vanish, so hasNext must look
        // ahead; the looked-ahead output is copied because computing
        // the NEXT row reuses the projection buffer of the previous
        // one (one UnsafeRow copy per EMITTED row — matched rows only)
        new Iterator[InternalRow] {
          private var out: InternalRow = _
          private def advance(): Unit = {
            out = null
            while (out == null && lIter.hasNext) {
              val lRow = lIter.next()
              val r = m.findMatch(lRow)
              if (r != null) out = resultProj(joined(lRow, r)).copy()
            }
          }
          advance()
          override def hasNext: Boolean = out != null
          override def next(): InternalRow = {
            val r = out
            advance()
            r
          }
        }
      }
    }
  }
}

/** Planner strategy mapping the logical as-of node to its exec. */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tol, inner) =>
      AsOfJoinExec(lk, rk, lt, rt, tol, inner, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}
