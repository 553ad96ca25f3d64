package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import QueryDef.table

/** Round-17 batch: the streaming exact-dedup ingest promoted under
  * the hash oracle (the r16 verdict's task 5 — the matrix's streaming
  * cells were spec-gated only). The REAL `StreamingOps.
  * exactDedupIngest` runs inside the query: documents land in a
  * TxLog source table in two waves, the stream's first batch is
  * the wave-0 snapshot, wave 1 arrives as one incremental commit-log
  * batch (`processAllAvailable` between appends pins wave ==
  * micro-batch, so the verdict set is deterministic), and the
  * ACID-appended verdict pairs are compared row-for-row against a
  * DuckDB reconstruction of the stream semantics: per-wave min-id
  * co-arrival collapse + first-arrival-wins cross-wave canonicals.
  * The remaining streaming ingest members (winnow, semantic, LSH,
  * pHash) keep the documented fixed-stream-cost waiver — their
  * sequential semantics are oracle-gated by q318/q315/q316/q317 and
  * the stream == sequential-composition parity by their specs
  * (COVERAGE.md); this query pins the streaming machinery itself
  * (snapshot-then-incremental delivery, txn-tagged exactly-once
  * appends) under the oracle once, on the cheapest member.
  */
object Extras35 {

  val all: Seq[QueryDef] = Seq(

    // STREAMING exact-dedup ingest under the oracle. Natural exact
    // duplicates are absent below sf0.1, so the waves carry
    // deterministic exact twins (the q318 seeding pattern, NEGATIVE
    // ids — never colliding with corpus ids at any SF): wave 1 adds
    // copies of the 4 smallest wave-0 docs (cross-batch pairs:
    // arrival drops against the stored canonical whatever its id)
    // plus TWO extra copies each of the next 2 wave-0 docs
    // (three-way in-batch co-arrival: the smallest twin id survives
    // the batch, the other twins collapse to it in-batch, and it
    // drops cross-batch against the wave-0 original). Two waves keep
    // the query's fixed stream cost at half the 3-wave form while
    // still exercising snapshot delivery, an incremental commit-log
    // batch, in-batch collapse, and cross-batch canonical chasing;
    // natural dups at sf0.1 flow through the same generic semantics.
    QueryDef("q320_stream_exact_dedup_ingest",
      (s, d) => {
        import graft.sink.TxLogTable
        val src = QueryDef.scratch("graft_sed_src").toString
        val hashT = QueryDef.scratch("graft_sed_hash").toString
        val outT = QueryDef.scratch("graft_sed_out").toString
        val ckpt = QueryDef.scratch("graft_sed_ck").toString
        // stream a deterministic 1/3 slice PLUS every doc whose text
        // is a natural exact duplicate (so the natural-dup coverage
        // at sf0.1 survives the slim-down): the gate checks stream
        // SEMANTICS, and the fixed commit/batch machinery dominates
        // its cost — streaming the whole corpus bought nothing
        val allDocs = table(s, d, "documents").select(col("doc_id"), col("text"))
        val dupTexts = allDocs.groupBy("text")
          .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
          .select("text").withColumn("__d", lit(1))
        // pinned: three consumers (two wave appends + the twin base)
        // would each re-run the dup-text groupBy and the slice join
        val docs = allDocs.join(broadcast(dupTexts), Seq("text"), "left")
          .filter(pmod(col("doc_id"), lit(3)) === 0 || col("__d") === 1)
          .select(col("doc_id"), col("text"))
          .coalesce(2).transform(graft.ops.Pinned.pin)
        def natural(i: Int) = docs.filter(pmod(col("doc_id"), lit(2)) === i)
        val w0small = natural(0).orderBy("doc_id").limit(6)
          .transform(graft.ops.Pinned.pin)
        val tA = w0small.orderBy("doc_id").limit(4)
          .select((-col("doc_id") - 1).as("doc_id"), col("text"))
        val tb = w0small.orderBy(col("doc_id").desc).limit(2)
        // offsets far beyond any doc_id spread: -d-1000 twins could
        // collide across the two tb docs when their ids differ by
        // exactly 1000 (the per-id groupBy would silently collapse
        // two different-text rows); 1e6/2e6 make that impossible for
        // any non-negative doc_id below a million
        val tB = tb.select((-col("doc_id") - 1000000).as("doc_id"), col("text"))
          .unionAll(tb.select((-col("doc_id") - 2000000).as("doc_id"), col("text")))
        TxLogTable.create(s, hashT, new StructType()
          .add("doc_id", LongType).add("__h", StringType))
        TxLogTable.create(s, outT, new StructType()
          .add("new_id", LongType).add("seen_id", LongType))
        TxLogTable.append(natural(0), src)
        // node-sized state frames — same shuffle-partition pin +
        // restore discipline as q299 (streams capture the conf at
        // start; bench runs queries sequentially). AQE off for the
        // stream too: every foreachBatch plan is node-sized, and each
        // AQE query stage would be its own job (the q150 barrier
        // lesson applied to the stream's fixed cost).
        val spKey = "spark.sql.shuffle.partitions"
        val aqeKey = "spark.sql.adaptive.enabled"
        val spSaved = s.conf.getOption(spKey)
        val aqeSaved = s.conf.getOption(aqeKey)
        var q: org.apache.spark.sql.streaming.StreamingQuery = null
        try {
          s.conf.set(spKey, "4")
          s.conf.set(aqeKey, "false")
          q = graft.streaming.StreamingOps.exactDedupIngest(
            s.readStream.format("graft-txlog").load(src),
            hashT, outT, "q320", ckpt)
          q.processAllAvailable() // initial batch = wave-0 snapshot
          TxLogTable.append(natural(1).unionAll(tA).unionAll(tB), src)
          q.processAllAvailable() // wave 1 = one commit-log batch
        } finally {
          if (q != null) q.stop()
          // getOption/unset: never convert a previously-unset key
          // into an explicitly-set default (the Corpus discipline)
          spSaved.fold(s.conf.unset(spKey))(s.conf.set(spKey, _))
          aqeSaved.fold(s.conf.unset(aqeKey))(s.conf.set(aqeKey, _))
        }
        graft.ops.Pinned.release(w0small)
        graft.ops.Pinned.release(docs)
        TxLogTable.read(s, outT).orderBy("new_id", "seen_id")
      },
      Some("""WITH sel AS (SELECT doc_id, text FROM documents
                     WHERE doc_id % 3 = 0 OR text IN (
                       SELECT text FROM documents
                       GROUP BY text HAVING COUNT(*) > 1)),
              w0 AS (SELECT doc_id, text FROM sel WHERE doc_id % 2 = 0),
              w0small AS (SELECT doc_id, text FROM w0 ORDER BY doc_id LIMIT 6),
              twina AS (SELECT -doc_id - 1 AS doc_id, text
                     FROM (SELECT doc_id, text FROM w0small ORDER BY doc_id LIMIT 4)),
              w1n AS (SELECT doc_id, text FROM sel WHERE doc_id % 2 = 1),
              tbase AS (SELECT doc_id, text FROM w0small ORDER BY doc_id DESC LIMIT 2),
              twinb AS (SELECT -doc_id - 1000000 AS doc_id, text FROM tbase
                     UNION ALL SELECT -doc_id - 2000000, text FROM tbase),
              aw AS (SELECT 0 AS wave, doc_id, text FROM w0
                     UNION ALL SELECT 1, doc_id, text FROM w1n
                     UNION ALL SELECT 1, doc_id, text FROM twina
                     UNION ALL SELECT 1, doc_id, text FROM twinb),
              -- per-(content, wave) batch canonical: min id co-arrival collapse
              cw AS (SELECT text, wave, MIN(doc_id) AS mw
                     FROM aw GROUP BY text, wave),
              -- first wave each content appears in; its batch min is THE canonical
              c0 AS (SELECT text, MIN(wave) AS wv0 FROM aw GROUP BY text),
              canon AS (SELECT cw.text, cw.mw AS canon
                        FROM cw JOIN c0 ON cw.text = c0.text AND cw.wave = c0.wv0),
              -- in-batch pairs: every non-min member drops to the batch min
              inner_p AS (SELECT a.doc_id AS new_id, cw.mw AS seen_id
                          FROM aw a JOIN cw
                            ON a.text = cw.text AND a.wave = cw.wave
                          WHERE a.doc_id <> cw.mw),
              -- cross-batch pairs: a later wave's batch min drops to the stored canonical
              cross_p AS (SELECT cw.mw AS new_id, c.canon AS seen_id
                          FROM cw JOIN c0 ON cw.text = c0.text
                                JOIN canon c ON c.text = cw.text
                          WHERE cw.wave > c0.wv0)
              SELECT new_id, seen_id FROM inner_p
              UNION ALL SELECT new_id, seen_id FROM cross_p
              ORDER BY new_id, seen_id"""))
  )
}
