package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.sink.TxLogTable
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Null-count data skipping: committed per-column null counts answer
  * `IS NULL` / `IS NOT NULL` conjuncts at the file level, and kill
  * all-null files under value predicates (where min/max stats are
  * absent and range pruning alone must read the file).
  */
class NullStatsPruningSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("nullstats").resolve("t").toString

  private def build(): String = {
    val t = freshTable()
    // three appends → three files with distinct null shapes on x
    TxLogTable.append(Seq[(Long, Option[Long])](
      (1L, None), (2L, None), (3L, None), (4L, None))
      .toDF("id", "x").repartition(1), t) // all-null
    TxLogTable.append(Seq[(Long, Option[Long])](
      (5L, Some(1L)), (6L, None), (7L, Some(2L)), (8L, None))
      .toDF("id", "x").repartition(1), t) // mixed
    TxLogTable.append(Seq[(Long, Option[Long])](
      (9L, Some(5L)), (10L, Some(6L)), (11L, Some(7L)), (12L, Some(8L)))
      .toDF("id", "x").repartition(1), t) // no-null
    t
  }

  test("IS NULL / IS NOT NULL / value predicates prune by null counts") {
    val t = build()
    val idx = new TxLogFileIndex(spark, t, None)
    val x = AttributeReference("x", LongType)()
    def kept(f: Expression): Int =
      idx.listFiles(Nil, Seq(f)).flatMap(_.files).length
    assert(kept(IsNull(x)) === 2, "no-null file must be skipped for IS NULL")
    assert(kept(IsNotNull(x)) === 2, "all-null file must be skipped for IS NOT NULL")
    // x = 5: the all-null file has NO min/max for x (range pruning
    // alone would read it) — the null count kills it; the mixed file's
    // range [1,2] kills it by min/max
    assert(kept(EqualTo(x, Literal(5L))) === 1)
    // conservative: a column with no stats at all prunes nothing
    val ghost = AttributeReference("ghost", LongType)()
    assert(kept(IsNull(ghost)) === 3)
  }

  test("pruned format reads stay exact") {
    val t = build()
    val df = spark.read.format("graft-txlog").load(t)
    assert(df.where("x IS NULL").count() === 6L)
    assert(df.where("x IS NOT NULL").count() === 6L)
    assert(df.where("x = 5").select("id").head().getLong(0) === 9L)
  }

  test("null pruning follows a renamed column") {
    val t = build()
    TxLogTable.renameColumn(spark, t, "x", "score")
    // the bridged read stays exact under the logical name
    val df = TxLogTable.read(spark, t)
    assert(df.where("score IS NULL").count() === 6L)
    // and the scan snapshot translates the stats lookup
    val snap = TxLogTable.scanSnapshot(spark, t, None)
    val counts = snap.files.flatMap(f => snap.nullCounts(f, "score")).sortBy(_._1)
    assert(counts === Seq((0L, 4L), (2L, 4L), (4L, 4L)))
  }
}
