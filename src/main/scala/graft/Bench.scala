package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: headline queries at SPARK_GRAFT_SF_DIR, ONE JSON line
  * on stdout. The headline set covers each engine subsystem: scan+agg,
  * shuffle join, broadcast join, window, sketch stats, dedup (hash +
  * minhash), ANN, text enrichment, and the events rollup.
  */
object Bench {
  private val headline = Seq(
    "q10_tpch_q1", "q12_tpch_q3", "q20_join_inner", "q21_join_multikey", "q27_union_all",
    "q40_summary", "q43_histogram", "q62_window_rank", "q63_window_runsum",
    "q64_events_hourly", "d01_dedup_exact", "d02_dedup_minhash",
    "a01_ann_brute", "t01_text_enrich", "t03_repetition", "t04_decontaminate",
    "s01_sessionize", "j01_asof_join")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val qs = SparkEntry.queries
    // JVM/codegen warmup outside the timed region
    qs("q10_tpch_q1")(spark, sfDir).count()

    // min of three runs: this host shows intermittent multi-second CPU
    // starvation (identical jobs vary 2s ↔ 250s, project memory + round-2
    // verdict); min-of-2 demonstrably couldn't separate noise from
    // regressions, so take the best of three
    def timed(name: String): Double = {
      val t0 = System.nanoTime()
      // fail FAST: swallowing the error would report the (often very
      // fast) failure path as a legitimate best-of-three time — a broken
      // query must break the bench, not improve it
      try qs(name)(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: $e"); throw e
      }
      (System.nanoTime() - t0) / 1e9
    }
    val results = headline.filter(qs.contains).map { name =>
      name -> Seq(timed(name), timed(name), timed(name)).min
    }
    val qJson = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
