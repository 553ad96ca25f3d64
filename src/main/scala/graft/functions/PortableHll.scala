package graft.functions

/** Engine-portable HyperLogLog building blocks, shared by the batch
  * sketch queries (`queries/Sketches`) and the streaming stateful
  * estimator (`streaming/StreamingOps.approxDistinctStream`).
  *
  * The register derivation is SQL expression TEXT (not compiled
  * functions) on purpose: the same string runs as a Spark `expr` and
  * inside the DuckDB oracle, so both engines evaluate the identical
  * operation tree — md5 consumed as hex text, register index from the
  * first two nibbles, rank from the next 40 bits via string ops and a
  * 16-way nibble CASE. See `queries/Sketches` for the full
  * portability rationale (exact power-of-two harmonic sums, no libm
  * on the compared path).
  */
object PortableHll {

  /** Registers = 256 (p = 8). */
  val M = 256

  /** Zero-prefix length (hex chars) of the 40-bit rank word. */
  val ZP = "length(regexp_extract(substring(hx, 3, 10), '^0*', 0))"

  /** rho = leading-zero BITS of the rank word + 1 (41 if all zero),
    * expects a column `hx` holding the md5 hex text of the key.
    */
  val RHO =
    s"""CASE WHEN $ZP = 10 THEN 41
        ELSE $ZP * 4 +
          CASE substring(substring(hx, 3, 10), $ZP + 1, 1)
            WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
            WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
            ELSE 0 END + 1 END"""

  /** Register index in [0, 256) from the first two hex nibbles of `hx`. */
  val BUCKET =
    """(instr('0123456789abcdef', substring(hx, 1, 1)) - 1) * 16 +
       (instr('0123456789abcdef', substring(hx, 2, 1)) - 1)"""

  /** alpha_256 * m^2 / S over columns `s` (harmonic sum incl. empty
    * registers) and `v` (empty-register count).
    */
  val RAW_EST =
    s"""CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST($M.0 AS DOUBLE))
        * CAST(${M * M}.0 AS DOUBLE) / s"""

  /** RAW_EST with the standard linear-counting fallback. */
  val EST =
    s"""CASE WHEN $RAW_EST <= CAST(${2.5 * M} AS DOUBLE) AND v > CAST(0.0 AS DOUBLE)
        THEN CAST($M.0 AS DOUBLE) * ln(CAST($M.0 AS DOUBLE) / v)
        ELSE $RAW_EST END"""

  /** Scala-side estimate from a full register array — the SAME
    * arithmetic as [[EST]]: every addend in the harmonic sum is an
    * exact power of two in [2^-41, 1] (49-bit span < 53-bit mantissa),
    * so the sum is exact and order-free, and a streaming state that
    * holds these registers produces estimates bit-identical to the
    * batch query over the same distinct keys.
    */
  def estimateFromRegisters(regs: Array[Byte]): Double = {
    require(regs.length == M, s"expected $M registers, got ${regs.length}")
    var s = 0.0
    var v = 0
    var i = 0
    while (i < M) {
      s += math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) v += 1
      i += 1
    }
    val raw = 0.7213 / (1.0 + 1.079 / M) * (M.toDouble * M) / s
    if (raw <= 2.5 * M && v > 0) M.toDouble * math.log(M.toDouble / v) else raw
  }
}
