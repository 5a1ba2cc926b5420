package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling smoke: blow the sf0.1 documents table up 1×→10× (each replica
  * is a near-duplicate of its siblings — a pathologically dup-heavy
  * corpus) and watch minhash dedup + TF-IDF wall time. Measured on this
  * host (local[32], 2026-08): minhash ≈ 6–7 s flat from 5k to 50k docs
  * even as verified pairs grow 256 → 250k (parallel slack absorbs the
  * candidate growth; no quadratic blowup), TF-IDF 1.7 s → 2.8 s for 10×
  * the data. Dev tool — not part of the driver contract.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def blow(f: Int) = (0 until f).map(i =>
      docs.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        concat(col("text"), lit(" v" + i)).as("text")))
      .reduce(_ unionAll _)
    for (f <- Seq(1, 2, 5, 10)) {
      val d = blow(f)
      d.count()
      val t0 = System.nanoTime()
      val n = graft.pipeline.Dedup.minhashDedup(d, "text", "doc_id", threshold = 0.5).count()
      println(f"[smoke] factor=$f docs=${5000L * f} pairs=$n minhash=${(System.nanoTime() - t0) / 1e9}%.2f s")
      val t1 = System.nanoTime()
      val v = graft.pipeline.Relevance.tfidfTopTerms(d, "text", "doc_id", k = 3).count()
      println(f"[smoke] factor=$f tfidf_rows=$v tfidf=${(System.nanoTime() - t1) / 1e9}%.2f s")
      val t2 = System.nanoTime()
      val sd = graft.pipeline.Dedup.spanDedup(d, "text", "doc_id", w = 6).count()
      println(f"[smoke] factor=$f span_docs=$sd span_dedup=${(System.nanoTime() - t2) / 1e9}%.2f s")
      val t3 = System.nanoTime()
      import spark.implicits._
      val queries = Seq((1L, "spark join"), (2L, "window stream"), (3L, "hash filter scan"))
        .toDF("qid", "qtext")
      val br = graft.pipeline.Relevance.bm25Retrieve(d, "text", "doc_id",
        queries, "qid", "qtext", k = 10).count()
      println(f"[smoke] factor=$f bm25_rows=$br bm25_retrieve=${(System.nanoTime() - t3) / 1e9}%.2f s")
      val t4 = System.nanoTime()
      val ul = graft.pipeline.TextAnalysis.unigramLogProb(d, "text", "doc_id").count()
      println(f"[smoke] factor=$f unigram_rows=$ul unigram=${(System.nanoTime() - t4) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
