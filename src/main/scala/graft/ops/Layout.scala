package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout clustering keys. At 100 TB the dominant cost is which
  * files a query must open; writing data ordered by a space-filling
  * curve over the common filter dimensions lets min/max file
  * statistics prune range predicates on EITHER dimension — the
  * optimization Delta/Iceberg call Z-ORDER, expressed here as a plain
  * column so `repartitionByRange(zValue).sortWithinPartitions` lays
  * files out along the curve with no engine extension.
  */
object Layout {

  /** Morton (Z-order) interleave of the low `bits` bits of two
    * non-negative long columns: bit i of `a` lands at position 2i+1,
    * bit i of `b` at position 2i. Composition of codegen'd bit
    * built-ins — no UDF, stays inside whole-stage codegen.
    */
  def zValue(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)

  /** N-dimensional Morton interleave: bit i of column d (of n) lands
    * at position `i * n + (n - 1 - d)`, so every dimension's low bits
    * are equally significant and min/max file stats prune range
    * predicates on ANY of the clustered columns. `bits * n` must fit
    * a long (≤ 63); with k columns you get `floor(63 / k)` usable
    * bits each — clustering degrades gracefully for wider values
    * (pruning always reads real footer stats, so correctness never
    * depends on the curve). Same codegen-friendly composition of bit
    * built-ins as the 2-D form.
    */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, s"zValueN wants >= 2 columns, got ${cols.size}")
    require(bits * cols.size <= 63,
      s"bits=$bits over ${cols.size} columns exceeds a long (max ${63 / cols.size})")
    val n = cols.size
    (for {
      i <- 0 until bits
      (c, d) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + (n - 1 - d)))
      .reduce(_ bitwiseOR _)
  }

  /** Hilbert-curve distance of point `(a, b)` on the `bits`-order
    * curve (each coordinate uses its low `bits` bits; `2 * bits` must
    * fit a long). The Hilbert curve never takes the long diagonal
    * jumps Morton order does, so consecutive curve positions are
    * always ADJACENT cells — range-partitioned files carry tighter
    * per-dimension min/max envelopes than Z-order at the same file
    * count, i.e. strictly better stats pruning for the same layout
    * cost. The classic xy→d walk (top-down quadrant fold with
    * rotation) is the native codegen expression
    * [[graft.functions.HilbertIndex]] — the Column-composition form
    * it replaces rewrote x and y each level in terms of BOTH previous
    * x and y, an exponential (~4^bits node) Catalyst tree whose
    * analysis + codegen alone cost ~2 s per query (measured, q262).
    */
  def hilbertValue(a: Column, b: Column, bits: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(graft.functions.HilbertIndex(
      ColumnShim.expression(a.cast("long")),
      ColumnShim.expression(b.cast("long")), bits))
  }
}
