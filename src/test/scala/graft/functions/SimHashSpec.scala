package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.functions.{simhash64, hamming64}

class SimHashSpec extends SparkSpec {
  import spark.implicits._

  test("simhash64 is deterministic and near-dups differ in few bits") {
    val df = Seq(
      ("the quick brown fox jumps over the lazy dog and runs far away", 1),
      ("the quick brown fox jumps over the lazy dog and runs far home", 2),
      ("completely different text about databases and distributed query engines", 3))
      .toDF("text", "id")
      .select(col("id"), simhash64(split(col("text"), " ")).as("h"))
    val m = df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val near = java.lang.Long.bitCount(m(1) ^ m(2))
    val far = java.lang.Long.bitCount(m(1) ^ m(3))
    assert(near < far, s"near=$near far=$far")
    assert(near <= 16)
  }

  test("identical token arrays hash identically; hamming64 agrees with bitCount") {
    val df = Seq(("a b c", "a b c")).toDF("t1", "t2")
      .select(
        simhash64(split(col("t1"), " ")).as("h1"),
        simhash64(split(col("t2"), " ")).as("h2"))
      .withColumn("d", hamming64(col("h1"), col("h2")))
    val r = df.head()
    assert(r.getLong(0) === r.getLong(1))
    assert(r.getInt(2) === 0)
  }

  test("fingerprint is engine-portable (pinned value, matches md5-nibble reconstruction in DuckDB/python)") {
    val h = Seq(Tuple1("the quick brown fox jumps over the lazy dog")).toDF("t")
      .select(simhash64(split(col("t"), " "))).head().getLong(0)
    assert(h === 1140603644929599182L)
  }

  test("interpreted eval matches codegen path") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val arr = new GenericArrayData(
      Array[Any](UTF8String.fromString("a"), UTF8String.fromString("bb")))
    val direct = SimHash64.hashTokens(arr)
    val viaDf = Seq(("a bb", 1)).toDF("t", "i")
      .select(simhash64(split(col("t"), " "))).head().getLong(0)
    assert(direct === viaDf)
  }
}
