package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.LogicalRDD

/** Release discipline for `localCheckpoint()` frames.
  *
  * `Dataset.unpersist()` only talks to the cache manager, so it is a
  * silent no-op on a checkpointed frame — the blocks live at the RDD
  * layer (`rdd.localCheckpoint()` persists MEMORY_AND_DISK) and stay
  * pinned until the ContextCleaner happens to collect the RDD. Inside
  * an iterative operator that checkpoints per round (label
  * propagation, BPE merges) the superseded rounds accumulate for the
  * whole job; [[release]] frees them deterministically.
  *
  * Contract mirrored from `Ranks`: an operator releases every
  * checkpoint it pinned EXCEPT the one backing the frame it returns —
  * that one is caller-owned (the caller may `Pinned.release` it when
  * done; the hermetic bench drops it between queries either way).
  */
object Pinned {

  /** `localCheckpoint()` with an audit tap. A pin truncates lineage
    * to a `LogicalRDD` stub, so a plan audit inspecting only the
    * FINAL frame is blind to everything upstream of the last pin —
    * round 12's PLANS.md recorded "0 shuffles" for the two most
    * expensive graph queries because their real join/aggregate
    * shapes sat behind `localCheckpoint()`. All query/operator pins
    * go through here; in audit mode ([[withAuditTap]], used by
    * `graft.PlanAudit`) the PRE-pin physical plan is recorded before
    * the cut. Normal runs pay one null-check.
    */
  def pin(df: DataFrame): DataFrame = {
    val tap = auditTap
    if (tap != null && (Thread.currentThread() eq auditThread))
      tap(df.queryExecution.executedPlan.toString)
    df.localCheckpoint()
  }

  @volatile private var auditTap: String => Unit = null
  @volatile private var auditThread: Thread = null

  /** Run `body` with every [[pin]]'s pre-checkpoint plan streamed to
    * `sink`. Audit-only (PlanAudit runs queries one at a time); the
    * single-thread restriction is ENFORCED, not just documented: the
    * tap fires only for pins executed on the installing thread, so a
    * concurrent pin (e.g. a streaming query's foreachBatch in the
    * same JVM) falls back to a plain localCheckpoint instead of
    * polluting the audited query's shuffle/codegen sums. */
  def withAuditTap[A](sink: String => Unit)(body: => A): A = {
    auditThread = Thread.currentThread()
    auditTap = sink
    try body finally { auditTap = null; auditThread = null }
  }

  /** Row count of a pinned frame, taken on the BACKING RDD: the
    * blocks are already materialized (MEMORY_AND_DISK), so this is a
    * single-stage per-partition count with no SQL planning, no
    * partial-agg exchange — the cheap way an operator turns a frame
    * it just pinned into a routing/literal constant (pagerank's
    * vertex count, triangleStats' edge count). Falls back to
    * `Dataset.count()` when the frame is not a direct checkpoint.
    */
  def count(df: Dataset[_]): Long =
    df.queryExecution.analyzed match {
      case l: LogicalRDD => l.rdd.count()
      case _             => df.count()
    }

  /** Free the storage behind a `localCheckpoint()`ed frame. Safe only
    * once nothing will read `df` again: a checkpointed RDD has no
    * lineage to recompute from, so its data is gone for good. No-op
    * on a frame that is not a direct checkpoint.
    */
  def release(df: Dataset[_]): Unit =
    df.queryExecution.analyzed match {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _             => ()
    }
}
