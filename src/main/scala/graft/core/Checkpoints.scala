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
    * `persist`ed, and unpersists the checkpointed RDD behind EVERY
    * `LogicalRDD` leaf of the plan — not just a bare-checkpoint root.
    * Operators commonly hand back a thin projection over their final
    * checkpoint (`dupClusters`/`connectedComponents` return
    * `labels.withColumnRenamed("label", "cluster_id")`); a root-only
    * match made the documented "release when done" contract a silent
    * no-op for exactly those frames, leaving the final round's blocks
    * pinned. Safe no-op for frames with no checkpoint leaf (unpersist
    * on a never-persisted RDD does nothing). AFTER release a
    * checkpointed frame is UNUSABLE (localCheckpoint cuts lineage —
    * there is nothing left to recompute from); only call it once every
    * reader of the frame — including any OTHER frame sharing a
    * checkpoint leaf with it — has finished.
    */
  def release(df: DataFrame): Unit = {
    df.unpersist(blocking = false)
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }
}
