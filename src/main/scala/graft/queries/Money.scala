package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit, sum}
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Canonical cross-engine money arithmetic for the oracle-gated query
  * suite. Every money aggregate in the suite MUST go through one of
  * these — never a bare double `sum` (whose accumulation order
  * diverges between engines) and never a bare integer `SUM` in the
  * oracle SQL (which DuckDB types HUGEINT/int128, hashed differently
  * from BIGINT by the driver even when every value is equal — the
  * round-7 lesson: 11 value-exact queries went driver-red on exactly
  * this).
  *
  * Lowercase helpers build the Spark side; UPPERCASE build the
  * matching DuckDB oracle SQL fragment. The pairs are kept adjacent
  * so a change to one is a change to both.
  */
object Money {

  /** Exact decimal accumulator surfaced as DOUBLE: associativity-safe
    * at DECIMAL(18,4), one rounding at the very end. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast(DoubleType)
  def DSUM(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(18,4))) AS DOUBLE)"

  /** Higher-scale variant for squared / product terms. */
  def dsum8(c: Column): Column = sum(c.cast(DecimalType(30, 8))).cast(DoubleType)
  def DSUM8(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(30,8))) AS DOUBLE)"

  /** Per-row floored cents — exact BIGINT, safe to sum in any order
    * (negative values floor toward -inf identically in both engines). */
  def cents(c: Column): Column = floor(c * lit(100.0)).cast(LongType)
  def CENTS(e: String): String = s"CAST(floor(($e) * 100.0) AS BIGINT)"

  /** Oracle-side integer sum pinned to BIGINT. DuckDB types a bare
    * `SUM(<integer>)` as HUGEINT (int128); the outer cast keeps the
    * result int64 like Spark's `sum(LongType)`. Spark needs no
    * counterpart — its long sum is already long. */
  def BSUM(e: String): String = s"CAST(SUM($e) AS BIGINT)"
}
