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
}
