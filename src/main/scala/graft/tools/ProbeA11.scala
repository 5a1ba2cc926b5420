package graft.tools

import org.apache.spark.sql.SparkSession

/** r17 probe for a11_ivf_int8_rerank's sf1 bimodal shelf (r16 verdict
  * ask #2): BENCH_r16 recorded five same-day runs at 1.9-2.27 s and two
  * at 3.9-4.2 s — each bench run is its own forked JVM, so the question
  * is whether the shelf is per-JVM state (C2-JIT tiering of the
  * quantize/cosine kernel, the a05 pattern attributed by [[ProbeA05]])
  * or something in the plan/data. Runs the exact bench query on the
  * exact blown corpus several times in ONE JVM and prints wall times
  * plus the physical-join fingerprint; run the main repeatedly to
  * sample JVMs. Pass a directory argument to reuse a pre-built blown
  * corpus across JVM samples (and build it on first use); without one,
  * a throwaway corpus builds and deletes per run. Dev tool — not part
  * of the driver contract.
  */
object ProbeA11 {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = graft.Bench.benchSession()
    val keep = args.headOption
    val dir = keep match {
      case Some(d) if new java.io.File(d, "embeddings.parquet").exists() => d
      case Some(d) => graft.Bench.buildSf1(spark, "/root/testdata/sf0.1", Some(d))
      case None => graft.Bench.buildSf1(spark, "/root/testdata/sf0.1")
    }
    try {
      val fn = graft.SparkEntry.queries("a11_ivf_int8_rerank")
      val df = fn(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      def cnt(s: String) = s.r.findAllIn(plan).size
      println(s"[probe] plan: bhj=${cnt("BroadcastHashJoin")} " +
        s"smj=${cnt("SortMergeJoin")} shj=${cnt("ShuffledHashJoin")} " +
        s"wsc=${cnt("WholeStageCodegen")}")
      for (i <- 1 to 6) {
        val t0 = System.nanoTime()
        graft.Bench.materialize(fn(spark, dir))
        println(f"[probe] run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    } finally {
      if (keep.isEmpty) Cleanup.deleteRecursively(dir)
      spark.stop()
    }
    sys.exit(0)
  }
}
