package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge frames (extension — the reference has no
  * graph surface; its nearest neighbor is this repo's pointer-doubling
  * connected components in `pipeline/Dedup.dupClusters`).
  *
  * PageRank here is FIXED-POINT INTEGER arithmetic by design: ranks are
  * integer micro-units, contributions use floor division, so every sum
  * is order-independent and the result is bit-identical on any engine —
  * the same determinism contract the rest of the driver oracles rely on
  * (floating-point PageRank is unverifiable across engines: group-sum
  * order changes the low bits).
  */
object Graph {

  /** `iterations` rounds of damped PageRank over `edges` (src, dst).
    * Ranks start at `scale` (micro-units); each round every node emits
    * `pr div outdeg` along its out-edges and collects
    * `base + damping% · Σ contributions / 100` (integer floor at both
    * divisions). Nodes = src ∪ dst; dangling nodes (no out-edges)
    * contribute nothing (their mass evaporates — the standard simple
    * variant; build symmetric edges for undirected graphs and none are
    * dangling).
    *
    * Scale shape per round: one join of edges to the O(nodes) rank
    * frame on src (both hash-partitioned on the join key; the rank side
    * is the small one and broadcasts when it fits), one partial-agg
    * groupBy dst — shuffled bytes O(edges) worst case, O(nodes) after
    * map-side combine. Ranks persist per round (the previous round
    * unpersists); `iterations` is the driver-loop budget exactly like
    * `bpeTrain`'s merge count. The RETURNED frame is the final round's
    * persisted ranks — already materialized, so reads are free; the
    * caller owns `unpersist()` when done (dropping the cache inside
    * this method would discard the materialization it just paid for).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int, dampingPct: Int = 85,
               scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = (100L - dampingPct) * scale / 100L
    var pr = nodes.withColumn("pr", lit(scale))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    for (_ <- 0 until iterations) {
      val contribs = e
        .join(pr.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("node"), expr("pr div outdeg").as("c"))
        .groupBy("node").agg(sum("c").as("contrib"))
      val next = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($dampingPct * coalesce(contrib, 0L)) div 100"))
            .as("pr"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before dropping the parent
      pr.unpersist(blocking = false)
      pr = next
    }
    e.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    pr
  }
}
