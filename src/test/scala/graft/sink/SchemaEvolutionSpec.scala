package graft.sink

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Schema evolution across lake generations: old files keep reading
  * after a writer adds columns — the property a 100 TB table relies
  * on instead of rewriting history.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("parquet mergeSchema unifies generations; missing columns read NULL") {
    val dir = Files.createTempDirectory("graft-evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.parquet(s"$dir/gen=1")
    Seq((3L, "c", 9.5), (4L, "d", 7.25)).toDF("id", "name", "score")
      .write.parquet(s"$dir/gen=2")

    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(df.columns.sorted.toSeq === Seq("gen", "id", "name", "score"))
    // old generation surfaces the new column as NULL
    assert(df.filter(col("gen") === 1 && col("score").isNull).count() === 2)
    assert(df.filter(col("gen") === 2).agg(sum("score")).head.getDouble(0) === 16.75)
  }

  test("unionByName with allowMissingColumns aligns evolved frames") {
    val v1 = Seq((1L, "a")).toDF("id", "name")
    val v2 = Seq((2L, 9.5, "b")).toDF("id", "score", "name") // reordered + extra
    val u = v1.unionByName(v2, allowMissingColumns = true)
    assert(u.columns.toSeq === Seq("id", "name", "score"))
    val rows = u.orderBy("id").collect()
    assert(rows(0).isNullAt(2) && rows(1).getDouble(2) === 9.5)
    // positional union would have mis-bound the reordered columns —
    // by-name is the only safe append across writer versions
  }
}
