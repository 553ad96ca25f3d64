package graft.sink

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Proves the bronze layout (Hive-partitioned by ingestion day) gives
  * partition pruning: a day-filtered read touches only that day's
  * files — at 100 TB the difference between scanning one partition
  * and the whole lake.
  */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  test("day filter prunes to one partition's files at the scan") {
    val dir = Files.createTempDirectory("graft-prune").resolve("tbl").toString
    Seq(
      (1L, "a", "20240101"), (2L, "b", "20240101"),
      (3L, "c", "20240102"), (4L, "d", "20240102"),
      (5L, "e", "20240103"))
      .toDF("id", "payload", "anomesdia")
      .repartition(2)
      .write.partitionBy("anomesdia").parquet(dir)

    val all = spark.read.parquet(dir)
    val filtered = all.filter(col("anomesdia") === "20240102")
    assert(filtered.collect().map(_.getAs[Long]("id")).sorted.toSeq === Seq(3L, 4L))

    val scan = filtered.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    // the partition predicate must be a PartitionFilter (metadata-level
    // pruning), not a post-scan data filter
    assert(scan.metadata("PartitionFilters").contains("anomesdia"))
    val filesRead = scan.metrics("numFiles").value
    val filesTotal = all.inputFiles.length
    assert(filesRead < filesTotal,
      s"scan read $filesRead of $filesTotal files — no pruning")
    // only the 20240102 partition's files were opened
    val d2Files = all.inputFiles.count(_.contains("anomesdia=20240102"))
    assert(filesRead === d2Files.toLong)
  }
}
