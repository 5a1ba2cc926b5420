package graft.tools

import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the d02 minhash pipeline — times each stage
  * separately so regressions are attributable. Not part of the driver
  * contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    timed("read+count")(docs.count())

    val sig = Dedup.minhashSignatures(docs, "text", "doc_id")
    timed("signatures")(sig.count())
    timed("signatures(2nd)")(sig.count())

    val cand = Dedup.minhashCandidates(docs, "text", "doc_id")
    val nc = timed("candidates")(cand.count())
    println(s"[profile] n_candidates = $nc")

    val jac = Dedup.jaccardOnPairs(cand, docs, "text", "doc_id")
    timed("jaccard_on_pairs")(jac.count())

    val full = Dedup.minhashDedup(docs, "text", "doc_id", threshold = 0.5)
    val nf = timed("full_dedup_fresh")(full.count())
    println(s"[profile] n_final = $nf")
    spark.stop()
  }
}
