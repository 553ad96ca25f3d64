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

  /** Apply a MULTI-VERSION change log in one pass: `log` carries any
    * number of changes per key, each stamped with a per-key-unique
    * `seqCol` and an `opCol` of "U" (upsert) or "D" (delete); only the
    * HIGHEST-seq change per key takes effect, exactly as if the
    * versions had been applied one batch at a time in seq order
    * (spec'd by property against the sequential fold).
    *
    * Scale shape: the fold is ONE hash aggregation on the log —
    * `max(struct(seq, op, payload...))` picks the last version per key
    * with a map-side partial combine, so a log with millions of
    * versions of a hot key collapses before it shuffles (the classic
    * CDC-compaction plan). The apply is then the same anti-join +
    * union as a single-version feed: at 100 TB base + GB-scale folded
    * log, the log side broadcasts and the base never moves.
    */
  def applyChangeLog(
      base: DataFrame,
      log: DataFrame,
      key: String,
      seqCol: String,
      opCol: String): DataFrame = {
    val cols = base.columns.toSeq
    require(cols.contains(key), s"base must carry key column '$key'")
    val payload = cols.filterNot(_ == key)
    // last version per key: struct comparison orders by seq first;
    // seq is unique per key, so the winner is deterministic
    val folded = log
      .groupBy(col(key))
      .agg(max(struct((col(seqCol) +: col(opCol) +: payload.map(col)): _*))
        .as("__last"))
      .select(col(key) +: col(s"__last.$opCol").as(opCol) +:
        payload.map(c => col(s"__last.$c").as(c)): _*)
    val dels = folded.filter(col(opCol) === "D").select(key)
    val ups = folded.filter(col(opCol) === "U").select(cols.map(col): _*)
    base.join(dels, Seq(key), "left_anti")
      .join(ups.select(col(key)), Seq(key), "left_anti")
      .unionAll(ups)
  }
}
