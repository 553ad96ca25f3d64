package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Skew-handling utilities.
  *
  * At 100 TB a handful of hot keys (one dominant language, one viral
  * document, the null bucket) can pin an aggregation or join to a
  * single reducer. Two standard remedies, both expressed as plain
  * plans so Catalyst/AQE still apply:
  *
  *  - **Salted two-stage aggregation**: append a deterministic salt to
  *    the key, pre-aggregate on (key, salt) — spreading a hot key over
  *    `saltBuckets` reducers — then aggregate the partials on the bare
  *    key. Results are identical to the direct aggregation for any
  *    associative+commutative aggregate (counts, decimal sums).
  *  - **AQE skew-join** (`spark.sql.adaptive.skewJoin.enabled`, on by
  *    default in Spark 4) splits oversized join partitions at runtime;
  *    prefer it for joins and keep salting for aggregations whose skew
  *    is known ahead of time.
  */
object Skew {

  /** Deterministic salt in [0, buckets): engine-portable (hash on an
    * md5 hex prefix, not Spark's Murmur3), so plans using it remain
    * oracle-verifiable.
    */
  def salt(orderCol: Column, buckets: Int): Column =
    pmod(conv(substring(md5(orderCol.cast(StringType)), 1, 6), 16, 10).cast(LongType),
      lit(buckets.toLong))

  /** Two-stage salted sum+count: exactly `groupBy(keys).agg(count,
    * dsum(valueCol))` but with the hot-key pressure spread over
    * `saltBuckets` pre-aggregation groups.
    */
  def saltedSumCount(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      saltCol: Column,
      saltBuckets: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    val partial = df
      .withColumn("__salt", Skew.salt(saltCol, saltBuckets))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(
        count(lit(1)).as("__n"),
        sum(col(valueCol).cast(DecimalType(18, 4))).as("__s"))
    partial
      .groupBy(keyCols: _*)
      .agg(
        sum(col("__n")).as("n"),
        sum(col("__s")).cast(DoubleType).as("sum_value"))
  }

  /** Salted shuffle join for a skewed BIG side: the big side salts
    * each row deterministically into `buckets` sub-keys via
    * `saltBy` (any column — typically a high-cardinality id; the
    * salt only has to spread rows, not be meaningful), and the small
    * side replicates ×`buckets`, so a hot join key occupies `buckets`
    * reducers instead of one. Results equal `big.join(small, key)`
    * exactly for any join the replicate side can express (inner /
    * left on the big side). AQE's skew-join split handles
    * sort-merge skew reactively; this is the proactive form for
    * when the hot keys are known and the small side is replicable —
    * e.g. enriching a 100 TB event stream where one tenant is 30%
    * of traffic. Replication cost: |small| × buckets rows shuffled.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltBy: Column, buckets: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left" ||
      joinType == "left_outer",
      s"salted join supports inner/left (big-side-preserving), got $joinType")
    val b = big.withColumn("__salt", Skew.salt(saltBy, buckets))
    val s = small.withColumn("__salt",
      explode(array((0 until buckets).map(i => lit(i.toLong)): _*)))
    b.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
