package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** Proves AQE's runtime skew-join handling on this engine's session:
  * a join with one pathological hot key gets its oversized shuffle
  * partition split at runtime — the mechanism that keeps a 100 TB
  * join from stalling on one straggler reducer (complementing the
  * explicit salting in [[Skew]] for skewed aggregations).
  */
class AqeSkewJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Full traversal of an executed AQE plan: query stages are leaf
    * nodes, so plain collect() never sees inside them — unwrap each
    * stage's materialized plan recursively.
    */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case q: QueryStageExec => p +: flatten(q.plan)
    case _ => p +: p.children.flatMap(flatten)
  }

  test("AQE splits the hot key's shuffle partition at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // thresholds scaled down so a local-scale hot key counts as skew
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "10KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "10KB")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      // 50k rows on one key vs uniform tail; right side small but not broadcast
      val left = (1 to 50000).map(i => (if (i <= 45000) 1L else (i % 100).toLong, s"payload-$i"))
        .toDF("k", "v")
      val right = (0L to 100L).map(k => (k, s"dim-$k")).toDF("k", "name")
      val joined = left.join(right, "k")
      // collect() executes THIS dataset's QueryExecution — count() would
      // build a separate one and leave joined's AQE plan unexecuted
      assert(joined.collect().length === 50000)

      val adaptive = joined.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }.get
      val nodes = flatten(adaptive.executedPlan)
      val skewHandled = nodes.collectFirst {
        case j: SortMergeJoinExec => j.isSkewJoin
        case j: ShuffledHashJoinExec => j.isSkewJoin
      }
      assert(skewHandled.isDefined, "expected a shuffled join under AQE")
      assert(skewHandled.get,
        "AQE did not mark the join as skew-handled; the hot partition was not split")
      val skewReads = nodes.collect {
        case r: AQEShuffleReadExec if r.hasSkewedPartition => r
      }
      assert(skewReads.nonEmpty, "no AQEShuffleRead with skewed partition splits")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
