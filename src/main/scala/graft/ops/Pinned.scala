package graft.ops

import org.apache.spark.sql.Dataset
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
