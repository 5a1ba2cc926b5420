package graft.tools

import org.apache.spark.sql.SparkSession

/** r15 probe for the a05-at-sf1 per-JVM bimodality seen while cutting
  * BENCH_anchor_r15 (one JVM plateaued at ~4.0 s, two others at ~1.6 s,
  * all flags clean): run the exact bench query on the exact blown
  * corpus several times in ONE JVM and print wall times plus the
  * physical-join fingerprint of the plan, so mode membership can be
  * tied (or not) to a plan difference. Run the main repeatedly to
  * sample JVMs. Dev tool — not part of the driver contract.
  */
object ProbeA05 {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = graft.Bench.benchSession()
    val dir = graft.Bench.buildSf1(spark, "/root/testdata/sf0.1")
    try {
      val fn = graft.SparkEntry.queries("a05_semantic_dedup")
      // plan fingerprint once (same query object each run)
      val df = fn(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      def cnt(s: String) = s.r.findAllIn(plan).size
      println(s"[probe] plan: bhj=${cnt("BroadcastHashJoin")} " +
        s"smj=${cnt("SortMergeJoin")} shj=${cnt("ShuffledHashJoin")} " +
        s"wsc=${cnt("WholeStageCodegen")}")
      for (i <- 1 to 4) {
        val t0 = System.nanoTime()
        graft.Bench.materialize(fn(spark, dir))
        println(f"[probe] run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      // AQE-final plan after an execution
      val df2 = fn(spark, dir)
      graft.Bench.materialize(df2)
      val fin = df2.queryExecution.executedPlan.toString
      def cnt2(s: String) = s.r.findAllIn(fin).size
      println(s"[probe] final: bhj=${cnt2("BroadcastHashJoin")} " +
        s"smj=${cnt2("SortMergeJoin")} shj=${cnt2("ShuffledHashJoin")}")
    } finally {
      Cleanup.deleteRecursively(dir)
      spark.stop()
    }
  }
}
