package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run one named SparkEntry query and show rows and/or the
  * formatted plan. Usage:
  *   runMain graft.RunQuery <name> [sfDir] [show|plan|both|noop]
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val mode = if (args.length > 2) args(2) else "both"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (mode == "plan" || mode == "both") println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    if (mode == "show" || mode == "both") df.show(20, truncate = false)
    if (mode == "noop") {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[runquery] $name took ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
