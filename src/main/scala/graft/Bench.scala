package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: headline queries at SPARK_GRAFT_SF_DIR, ONE JSON line
  * on stdout. The headline set covers each engine subsystem: scan+agg,
  * shuffle join, broadcast join, window, sketch stats, dedup (hash +
  * minhash), ANN, text enrichment, and the events rollup.
  *
  * Noise attribution: this host intermittently starves the JVM for
  * minutes (identical jobs vary 2 s ↔ 250 s; the round-2 bench logged
  * executor-heartbeat RPC timeouts, and the round-3 "57 s" d02 reruns at
  * 1.7 s in isolation). Per query we therefore report the MIN of
  * `SPARK_GRAFT_RUNS` (default 5) runs as the headline number, plus two
  * diagnostics per query so a spike is attributable from the JSON alone:
  *   - `samples`: every wall-clock sample (a 57/1.8/1.9 triple = noise;
  *     5 similar slow samples = a real regression);
  *   - `util`: process-CPU-seconds ÷ (wall × cores) for the best run —
  *     starvation shows as near-zero utilization, real work doesn't.
  */
object Bench {
  private val headline = Seq(
    "q10_tpch_q1", "q12_tpch_q3", "q20_join_inner", "q21_join_multikey", "q27_union_all",
    "q40_summary", "q43_histogram", "q62_window_rank", "q63_window_runsum",
    "q64_events_hourly", "d01_dedup_exact", "d02_dedup_minhash",
    "d11_incremental_minhash_fast", "a01_ann_brute", "t01_text_enrich",
    "t03_repetition", "t04_decontaminate", "t09_span_dedup",
    "c01_tfidf_topterms", "s01_sessionize", "j01_asof_join", "e02_interval_join",
    "q67_tpch_q17", "q80_tpch_q9", "e03_json_extract", "t14_token_ids")

  private val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    .asInstanceOf[com.sun.management.OperatingSystemMXBean]
  private def gcMs: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "5").toInt
    require(runs >= 1, s"SPARK_GRAFT_RUNS must be >= 1, got $runs")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = SparkEntry.queries

    /** Materialization-proof sink: hash EVERY output column into one
      * aggregate. `count()` (the pre-round-5 sink) let Catalyst prune
      * the computed columns entirely for projection-shaped queries —
      * t01's enrichment pipeline benched at 0.07 s because none of it
      * ran. The hash forces every column of every row to be produced,
      * uniformly across query shapes, while collecting one row.
      * (Round-5 harness change: numbers for previously-prunable queries
      * are HIGHER than round-4's for the same code — they now measure
      * the work the query name promises.)
      */
    def materialize(df: org.apache.spark.sql.DataFrame): Unit = {
      import org.apache.spark.sql.functions._
      df.select(xxhash64(df.columns.map(col): _*).as("__h"))
        .agg(expr("bit_xor(__h)")).collect()
    }
    // JVM/codegen warmup outside the timed region
    materialize(qs("q10_tpch_q1")(spark, sfDir))

    /** One run → (wall sec, cpu-utilization fraction of the whole box). */
    def timed(name: String): (Double, Double) = {
      val cpu0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      // fail FAST: swallowing the error would report the (often very
      // fast) failure path as a legitimate best-of-N time — a broken
      // query must break the bench, not improve it
      try materialize(qs(name)(spark, sfDir))
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: $e"); throw e
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val cpuSec = (osBean.getProcessCpuTime - cpu0) / 1e9
      (wall, cpuSec / (wall * Runtime.getRuntime.availableProcessors()))
    }
    // SPARK_GRAFT_ONLY=d01,d02 narrows the set for local iteration; the
    // driver never sets it, so the per-round bench always runs everything
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val gc0 = gcMs
    val results = headline.filter(qs.contains)
      .filter(n => only.forall(_.contains(n)))
      .map { name => name -> Seq.fill(runs)(timed(name)) }
    val best = results.map { case (k, ss) => k -> ss.minBy(_._1) }
    val qJson = best.map { case (k, (w, _)) => "\"" + k + f"\":$w%.3f" }
      .mkString("{", ",", "}")
    val samplesJson = results.map { case (k, ss) =>
      "\"" + k + "\":" + ss.map(s => f"${s._1}%.2f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val utilJson = best.map { case (k, (_, u)) => "\"" + k + f"\":$u%.2f" }
      .mkString("{", ",", "}")
    val total = best.map(_._2._1).sum
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qJson,"sf":"$sfDir","runs":$runs,"harness":"hash-materialized (round 5: count() let Catalyst prune computed columns; totals are not comparable to round<=4)","samples":$samplesJson,"best_run_cpu_util":$utilJson,"gc_ms":${gcMs - gc0}}"""
    // the stdout line interleaves with sbt/Spark logging and has arrived
    // truncated in past rounds ("parsed": null) — ALSO write the JSON to
    // its own file so the artifact is machine-readable regardless of
    // what the launcher does to stdout
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_result.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(line)
    spark.stop()
  }
}
