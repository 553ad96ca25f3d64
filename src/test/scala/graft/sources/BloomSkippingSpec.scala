package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.sink.TxLogTable
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-file bloom skipping for point lookups: opt-in via the
  * `graft.bloom.columns` property; equality / IN predicates on the
  * indexed column prune files the bloom proves value-free — the case
  * min/max ranges can't help (unclustered high-cardinality keys).
  */
class BloomSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("bloom").resolve("t").toString

  /** Three files with DISJOINT uuid-like string keys but identical
    * k ranges per file — range stats are useless by construction.
    */
  private def build(): (String, Seq[String]) = {
    val t = freshTable()
    TxLogTable.append(Seq((1L, "seed")).toDF("k", "key"), t)
    TxLogTable.setProperties(spark, t, Map(
      TxLogTable.BloomColumnsProperty -> "key"))
    val keys = (0 until 3).map(g => (0 until 200).map(i => s"id-$g-$i"))
    keys.zipWithIndex.foreach { case (ks, g) =>
      TxLogTable.append(
        ks.zipWithIndex.map { case (s, i) => (i.toLong, s) }
          .toDF("k", "key").repartition(1), t)
    }
    (t, keys.map(_.head))
  }

  private def kept(t: String, f: Expression): Seq[String] = {
    val idx = new TxLogFileIndex(spark, t, None)
    idx.listFiles(Nil, Seq(f)).flatMap(_.files)
      .map(_.getPath.getName).toSeq
  }

  private val keyAttr = AttributeReference("key", StringType)()
  private def strLit(s: String) = Literal(UTF8String.fromString(s), StringType)

  test("equality on the bloom column prunes to the containing file") {
    val (t, _) = build()
    // 4 files total (seed + 3 groups); 'id-1-57' lives in exactly one
    val hits = kept(t, EqualTo(keyAttr, strLit("id-1-57")))
    assert(hits.size <= 2, s"bloom should prune to ~1 file, kept $hits")
    // correctness: the surviving set still yields the row
    val df = spark.read.format("graft-txlog").load(t)
    assert(df.where("key = 'id-1-57'").count() === 1L)
    // a value present nowhere prunes everything the blooms cover
    val misses = kept(t, EqualTo(keyAttr, strLit("id-9-999")))
    assert(misses.size <= 1, s"absent key kept $misses") // seed file has no bloom? it does — pre-property append
    assert(spark.read.format("graft-txlog").load(t)
      .where("key = 'id-9-999'").count() === 0L)
  }

  test("IN-lists keep a file if ANY member may be present; longs work too") {
    val (t, firstKeys) = build()
    val in = In(keyAttr, Seq(strLit(firstKeys(0)), strLit(firstKeys(2))))
    val hits = kept(t, in)
    // members live in two distinct files; the third group's file drops
    assert(hits.size <= 3, s"IN-list kept $hits")
    val lt = freshTable()
    TxLogTable.append(Seq((1L, "x")).toDF("id", "v"), lt)
    TxLogTable.setProperties(spark, lt, Map(
      TxLogTable.BloomColumnsProperty -> "id"))
    TxLogTable.append((100L to 199L).map(i => (i, "a")).toDF("id", "v")
      .repartition(1), lt)
    TxLogTable.append((200L to 299L).map(i => (i, "b")).toDF("id", "v")
      .repartition(1), lt)
    val idAttr = AttributeReference("id", LongType)()
    val h = kept(lt, EqualTo(idAttr, Literal(150L)))
    assert(h.size <= 2, s"long equality kept $h")
    assert(spark.read.format("graft-txlog").load(lt)
      .where("id = 150").count() === 1L)
  }

  test("blooms follow renames and survive compaction rewrites") {
    val (t, _) = build()
    TxLogTable.renameColumn(spark, t, "key", "doc_key")
    val snap = TxLogTable.scanSnapshot(spark, t, None)
    // lookups under the LOGICAL name still consult the bloom
    val containing = snap.files.count(f =>
      snap.mayContainEq(f, "doc_key", "id-2-7"))
    assert(containing >= 1 && containing <= 2,
      s"expected ~1 bloom-positive file, got $containing")
    // a compaction rewrite re-derives blooms for the new files
    TxLogTable.materializeColumns(spark, t) // clears mapping, rewrites
    TxLogTable.compact(spark, t, smallFileBytes = Long.MaxValue,
      targetFileBytes = 16L * 1024)
    val snap2 = TxLogTable.scanSnapshot(spark, t, None)
    val present = snap2.files.count(f =>
      snap2.mayContainEq(f, "doc_key", "id-2-7"))
    assert(present >= 1, "true key must stay bloom-positive after rewrite")
    // rewritten files must carry blooms: over many absent keys, the
    // vast majority must be provably absent from SOME file (any single
    // key can be a deterministic ~0.4% false positive of the merged
    // 600-key bitmap — observed in the wild for exactly one probe key)
    val provedAbsent = (0 until 20).count { i =>
      snap2.files.exists(f => !snap2.mayContainEq(f, "doc_key", s"zz-absent-$i"))
    }
    assert(provedAbsent >= 15,
      s"expected most absent keys bloom-negative, got $provedAbsent/20")
  }
}
