package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a 2-D cell — a native Catalyst expression.
  *
  * The walk is the classic top-down quadrant fold (Hilbert 1891; the
  * d = xy2d form popularized by Warren, Hacker's Delight §16-1 and
  * the public curve literature): per level extract the quadrant bit
  * pair, accumulate s·s along the curve, rotate/reflect the frame
  * (reflection against the FULL side n−1, coordinates stay in
  * [0, n)). Identical values to the Column-composition form this
  * replaces ([[graft.ops.Layout.hilbertValue]] round-7) — the
  * hash-verified q262/q98 oracles pin the walk.
  *
  * Why an expression and not built-in composition: the fold rewrites
  * x and y each level in terms of BOTH previous x and y, so a Column
  * expansion doubles the tree per level — 6 levels ≈ 4^6 Catalyst
  * nodes, and analysis + codegen of that tree cost ~2 s per query
  * (measured, q262). The native expression is O(bits) generated code
  * and participates in whole-stage codegen like any built-in.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && 2 * bits <= 63,
    s"bits=$bits out of range (need 1 <= bits and 2*bits <= 63)")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"hilbert_index requires (bigint, bigint), got (${a.simpleString}, ${b.simpleString})")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    java.lang.Long.valueOf(HilbertIndex.index(
      bits, x.asInstanceOf[Long], y.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.HilbertIndex.index($bits, $x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "hilbert_index"
}

object HilbertIndex {

  /** Shared by interpreted eval and generated code. Matches the
    * Column-composition walk bit for bit. */
  def index(bits: Int, xin: Long, yin: Long): Long = {
    val n = 1L << bits
    var x = xin & (n - 1)
    var y = yin & (n - 1)
    var d = 0L
    var i = bits - 1
    while (i >= 0) {
      val s = 1L << i
      val rx = (x >> i) & 1L
      val ry = (y >> i) & 1L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        val fx = if (rx == 1L) n - 1 - y else y
        val fy = if (rx == 1L) n - 1 - x else x
        x = fx
        y = fy
      }
      i -= 1
    }
    d
  }
}
