package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Eager release of `localCheckpoint` storage.
  *
  * `Dataset.unpersist()` on a checkpointed frame is a silent no-op: the
  * blocks belong to the checkpointed RDD, not the cache manager, and
  * they live until the driver GCs the RDD reference and the
  * ContextCleaner notices — minutes on a busy heap. An operator that
  * checkpoints an intermediate it has finished with (iterative loops
  * snap their result free of the loop lineage, so the loop's own
  * checkpoints die with the op) should free the blocks deterministically
  * instead of leaking them into the next query's storage budget — round
  * 6 measured that leak compounding into a 5× slowdown on later
  * suite queries (PERF.md).
  *
  * Only safe when nothing returned to the caller still references the
  * checkpoint: a released checkpoint cannot be recomputed (its lineage
  * was truncated), so releasing a frame that a returned lazy plan reads
  * would fail the caller's action. Operators therefore only release
  * checkpoints consumed strictly inside an eager section. */
object Checkpoints {
  /** Free the checkpoint blocks behind `df`, if it is the direct result
    * of `localCheckpoint()`; no-op otherwise. */
  def release(df: DataFrame): Unit = df.queryExecution.logical match {
    case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
    case _ => ()
  }
}
