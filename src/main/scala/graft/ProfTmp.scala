package graft
// scratch profiling main — NOT committed
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfTmp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t[A](name: String)(body: => A): A = { val t0 = System.nanoTime; val r = body
      println(f"$name%-28s ${(System.nanoTime - t0) / 1e9}%.2f s"); r }
    spark.range(100000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    for (rep <- 1 to 2) {
      println(s"=== rep $rep")
      val tdir = java.nio.file.Files.createTempDirectory("graft_mv_prof").resolve("ord").toString
      val base = spark.read.parquet(d + "/orders.parquet").select(
        col("o_orderkey").as("k"), col("o_custkey").as("cust"),
        col("o_orderstatus").as("status"),
        expr("CAST(floor(o_totalprice * 100.0) AS BIGINT)").as("price_c"))
      t("append v1") { graft.sink.TxLogTable.append(base.repartition(4), tdir) }
      val state0 = t("matview init") { graft.ops.Matview.initialize(
        graft.sink.TxLogTable.read(spark, tdir, Some(1L)), Seq("cust"), Map("spend_c" -> "price_c")) }
      val v2 = t("delete COW") { graft.sink.TxLogTable.delete(spark, tdir, "status = 'F' AND k % 7 = 0") }
      val v3 = t("update COW") { graft.sink.TxLogTable.update(spark, tdir, "k % 5 = 0",
        Map("price_c" -> "price_c + 100")) }
      val feed = t("changes feed") { graft.sink.TxLogTable.changes(spark, tdir, 1L, v3) }
      t("applyDelta+sort") { graft.ops.Matview.applyDelta(state0, feed, Seq("cust"), Map("spend_c" -> "price_c"))
        .orderBy("cust").write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
