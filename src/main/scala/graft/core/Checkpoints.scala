package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Release helpers for materialized frames.
  *
  * `Dataset.unpersist` only consults the CacheManager, so it is a no-op
  * for a `localCheckpoint`ed frame: the checkpoint's blocks belong to
  * the RDD inside the plan's `LogicalRDD`, and they stay pinned in
  * executor storage until the ContextCleaner happens to GC the RDD
  * reference — which a tight driver loop never gives it time to do.
  * Round 11's bench artifact showed the cost: ~10 superseded checkpoint
  * block-sets per iterative operator accumulating across 38 queries
  * until GC pressure throttled everything (11.7 s headline GC vs 3.2 s
  * at the anchor). Iterative operators now release each superseded
  * round explicitly through [[release]].
  */
object Checkpoints {

  /** Free the storage behind a materialized frame, whichever way it was
    * materialized: drops the CacheManager entry if the frame was
    * `persist`ed, and unpersists the underlying checkpointed RDD if the
    * frame is a bare `localCheckpoint` scan (`LogicalRDD`). Safe no-op
    * for frames that are neither. AFTER release a checkpointed frame is
    * UNUSABLE (localCheckpoint cuts lineage — there is nothing left to
    * recompute from); only call it once every reader of the frame has
    * finished.
    */
  def release(df: DataFrame): Unit = {
    df.unpersist(blocking = false)
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }
}
