package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, UnknownPartitioning}

/** Pins the mechanism behind `Graph.pinEdges`' co-partition route:
  * under AQE a `repartition(n, col).localCheckpoint()` LogicalRDD
  * advertises UnknownPartitioning (the adaptive plan's pre-execution
  * partitioning is unknown — one reason the round-13 unconditional
  * co-partition experiment saw no superstep saving), and
  * `ColumnShim.withDeclaredHashPartitioning` restores the layout the
  * repartition guaranteed, making downstream key-aggregations
  * exchange-free.
  */
class CkptPartitioningProbe extends SparkSpec {

  test("AQE checkpoint loses the layout; the declared stamp restores it") {
    val n = spark.sessionState.conf.numShufflePartitions
    val ck = spark.range(100).selectExpr("id AS src", "CAST(id % 7 AS LONG) AS dst")
      .repartition(n, col("src")).localCheckpoint()
    val lost = ck.queryExecution.analyzed
      .collect { case l: LogicalRDD => l }.head
    assert(lost.outputPartitioning === UnknownPartitioning(0))
    // the un-stamped frame re-exchanges on groupBy(src)
    assert(ck.groupBy("src").count()
      .queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))

    val stamped = org.apache.spark.sql.graftshim.ColumnShim
      .withDeclaredHashPartitioning(ck, "src", n)
    val lr = stamped.queryExecution.analyzed
      .collect { case l: LogicalRDD => l }.head
    assert(lr.outputPartitioning.isInstanceOf[HashPartitioning])
    // the stamped frame aggregates on src with NO exchange
    val plan = stamped.groupBy("src").count()
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    // and the stamp changed no rows
    assert(stamped.collect().map(_.toString).sorted ===
      ck.collect().map(_.toString).sorted)
  }
}
