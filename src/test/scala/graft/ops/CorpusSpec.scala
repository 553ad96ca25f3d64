package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, n: Int): (Long, String) =
    id -> (1 to n).map(i => s"w$i").mkString(" ")

  test("chunk: stride geometry, counts, and short-doc fallback") {
    val docs = Seq(doc(1L, 100), doc(2L, 10), doc(3L, 48)).toDF("doc_id", "text")
    val out = Corpus.chunk(docs, "doc_id", "text", chunkTokens = 64, stride = 48)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc1: starts 0,48,96 → 64,52,4 tokens; doc2: one short chunk; doc3: one full-doc chunk
    assert(out === Set((1L, 0L, 64L), (1L, 1L, 52L), (1L, 2L, 4L), (2L, 0L, 10L), (3L, 0L, 48L)))
  }

  test("chunk: overlapping windows share content (md5 of the overlap region)") {
    val docs = Seq(doc(1L, 64)).toDF("doc_id", "text")
    val rows = Corpus.chunk(docs, "doc_id", "text", 64, 48).collect()
    assert(rows.length === 2) // starts 0 and 48
    val full = (1 to 64).map(i => s"w$i").mkString(" ")
    val tail = (49 to 64).map(i => s"w$i").mkString(" ")
    val md5of = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val byChunk = rows.map(r => r.getLong(1) -> r.getString(3)).toMap
    assert(byChunk(0L) === md5of(full))
    assert(byChunk(1L) === md5of(tail))
  }

  test("decontaminate flags only docs sharing an n-gram with the benchmark") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "zeta eta theta iota kappa"),
      (3L, "completely unrelated words here now")).toDF("doc_id", "text")
    val bench = Seq((100L, "beta gamma delta something else")).toDF("doc_id", "text")
    val hits = Corpus.decontaminate(corpus, bench, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.keySet === Set(1L)) // only doc 1 shares the "beta gamma delta" 3-gram
    assert(hits(1L) === 1L)
  }

  test("sampleFlag is deterministic and stratum-sensitive") {
    val docs = (0L until 400L).map(i => (if (i % 2 == 0) "en" else "fr", i))
      .toDF("lang", "doc_id")
    val nibble = when(col("lang") === "en", "8").otherwise("2")
    val kept = docs.filter(Corpus.sampleFlag(col("lang"), col("doc_id"), nibble))
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 200 per stratum; en keeps ~50% (8/16 nibbles), fr ~12.5% (2/16)
    assert(kept("en") > 60 && kept("en") < 140, s"en=${kept("en")}")
    assert(kept("fr") > 5 && kept("fr") < 60, s"fr=${kept("fr")}")
    // re-evaluation yields the identical sample (no RNG state)
    val again = docs.filter(Corpus.sampleFlag(col("lang"), col("doc_id"), nibble)).count()
    assert(again === kept.values.sum)
  }

  test("duplicateClusters resolves chains past one hop (min-label fixpoint)") {
    // chain 1-2-3-4 (diameter 3 needs >1 round) plus isolated pair 10-11
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id1", "id2")
    val got = Corpus.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("deterministicShuffle is a permutation and stable across runs") {
    val docs = (0L until 100L).map(Tuple1(_)).toDF("doc_id")
    val a = Corpus.deterministicShuffle(docs, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(a.map(_._1).sorted.toSeq === (0L until 100L))
    assert(a.map(_._2).sorted.toSeq === (0L until 100L))
    assert(a.map(_._2).take(10).toSeq !== (0L until 10L)) // actually shuffled
    val b = Corpus.deterministicShuffle(docs, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(a.toSeq === b.toSeq)
  }

  test("packSequences: contiguous fill, bins bounded by capacity plus one doc") {
    val docs = Seq(("en", 1L, 900), ("en", 2L, 900), ("en", 3L, 900),
      ("en", 4L, 100), ("fr", 5L, 50)).toDF("lang", "doc_id", "n")
    val out = Corpus.packSequences(docs, "lang", "doc_id", col("n"), capacity = 1000)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // en cumsums 900,1800,2700,2800 → preceding 0,900,1800,2700 → bins 0,0,1,2
    assert(out === Set(("en", 1L, 0L), ("en", 2L, 0L), ("en", 3L, 1L),
      ("en", 4L, 2L), ("fr", 5L, 0L)))
  }
}
