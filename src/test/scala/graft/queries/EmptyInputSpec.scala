package graft.queries

import java.nio.file.Files

import graft.SparkSpec
import graft.SparkEntry

/** Degenerate-input hardening: a representative slice of the query
  * suite must return EMPTY results — not throw — when every table
  * exists but has zero rows (the state of a fresh lake, a filtered
  * branch, or a partition with no data). Guards against hidden
  * head()/first()/div-by-count assumptions.
  */
class EmptyInputSpec extends SparkSpec {

  /** Empty copies of every table, schema intact. */
  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft-empty").toString
    val src = "/root/testdata/sf0.001"
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .write.parquet(s"$dir/$t.parquet")
    }
    dir
  }

  // one per operator family: scan/agg, join, window, dedup, ANN,
  // text, sketch, rank machinery, grid generation, graph
  private val representative = Seq(
    "q01_scan_project", "q18_q1_agg", "q29_star_join", "q22_window_running",
    "q33_dedup_exact", "q36_lsh_pairs", "q40_embed_topk", "q58_doc_frequency",
    "q81_portable_hll", "q84_percentile_disc", "q104_bigram_lm",
    "q155_paginate", "q160_portable_cms",
    "q164_nearest_click", "q166_kmv_set_ops", "q169_hour_fill",
    "q172_two_hop_reach", "q176_percentile_cont",
    "q281_bpe_merges", "q282_label_propagation", "q283_hard_negatives",
    "q287_contamination_matrix", "q288_drift_chi2",
    "q289_embedding_dispersion")

  representative.foreach { name =>
    test(s"$name returns empty (no throw) on zero-row tables") {
      val rows = SparkEntry.queries(name)(spark, emptyDir).collect()
      assert(rows.isEmpty, s"$name emitted ${rows.length} rows from empty inputs")
    }
  }

  // global-summary queries legitimately emit ONE all-zero row for an
  // empty set (a count over nothing is 0, not absent)
  test("q130_triangle_count summarizes empty input as a single zero row") {
    val rows = SparkEntry.queries("q130_triangle_count")(spark, emptyDir).collect()
    assert(rows.length === 1 && (0 until 3).forall(i => rows.head.getLong(i) === 0L))
  }

  // the LSH sweep's config rows are a FIXED domain: an empty corpus
  // must still emit all three configs, with zero candidates/hits
  test("q286_lsh_tradeoff emits its 3 config rows with zero counts when empty") {
    val rows = SparkEntry.queries("q286_lsh_tradeoff")(spark, emptyDir).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_candidates") === 0L)
      assert(r.getAs[Long]("n_hits") === 0L)
      assert(r.getAs[Long]("n_truth") === 0L)
    }
  }
}
