package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch upsert (SCD type 1) — the "apply a change batch to a base
  * table" primitive an ingestion engine needs once it moves past
  * append-only bronze loads (the reference is append-only:
  * `ingestao_csv.py` / `ingestao_api.py` always write a fresh
  * partition; this is the natural next operator at lake scale).
  *
  * Semantics: rows from `updates` win on key collision; unmatched
  * update rows are inserts; unmatched base rows pass through.
  */
object Merge {

  /** Full-outer merge. Both inputs must share the schema of
    * `base`; `key` must be unique and non-null per side.
    *
    * Scale shape: one shuffle on `key` (sort-merge join). When the
    * change batch is small relative to the base — the common CDC case —
    * Spark's size stats broadcast it automatically and the base is
    * never shuffled; at 100 TB base + GB-scale updates that is the
    * plan you want (map-side merge, no base movement).
    */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val cols = base.columns.toSeq
    // matched = the update key is present (key is non-null on the u
    // side of the full outer). A matched update row wins WHOLESALE —
    // including legitimately-NULL fields — matching MERGE INTO
    // semantics; per-column coalesce would silently keep stale base
    // values wherever an update field is NULL.
    base.alias("b")
      .join(updates.alias("u"), col(s"b.$key") === col(s"u.$key"), "full_outer")
      .select(cols.map(c =>
        when(col(s"u.$key").isNotNull, col(s"u.$c"))
          .otherwise(col(s"b.$c")).as(c)): _*)
  }
}
