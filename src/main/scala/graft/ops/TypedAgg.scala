package graft.ops

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed (Dataset API) aggregation surface: a custom
  * `Aggregator[IN, BUF, OUT]` — the type-safe counterpart of the
  * DataFrame aggregates, usable via `ds.groupByKey(...).agg(...)`.
  *
  * The buffer carries an exact decimal sum as unscaled cents (Long),
  * so merge order cannot change the result (same determinism contract
  * as the DataFrame-side DECIMAL sums) — safe under partial
  * aggregation and AQE.
  */
object TypedAgg {

  final case class SumCount(cents: Long, n: Long)

  /** Exact mean of a money-like Double (2-decimal data), tracked in
    * integer cents.
    */
  class ExactMean[IN](f: IN => Double) extends Aggregator[IN, SumCount, Double] {
    override def zero: SumCount = SumCount(0L, 0L)
    override def reduce(b: SumCount, a: IN): SumCount =
      SumCount(b.cents + math.round(f(a) * 100.0), b.n + 1)
    override def merge(x: SumCount, y: SumCount): SumCount =
      SumCount(x.cents + y.cents, x.n + y.n)
    override def finish(r: SumCount): Double =
      if (r.n == 0) 0.0 else (r.cents / 100.0) / r.n
    override def bufferEncoder: Encoder[SumCount] = Encoders.product[SumCount]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def exactMean[IN](f: IN => Double, name: String): TypedColumn[IN, Double] =
    new ExactMean(f).toColumn.name(name)
}
