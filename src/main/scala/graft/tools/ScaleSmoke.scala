package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling smoke for the headline dedup/retrieval family: blow the sf0.1
  * tables up 1×→10× (10× ≈ sf1) and fit the scaling exponent b of
  * t ≈ a·factor^b per operator from min-of-N (SPARK_GRAFT_RUNS, default 3) wall times at factors
  * 1/2/5/10. Linear scaling is b ≈ 1 (plus parallel-slack flattening
  * b < 1 while 32 cores absorb the growth); anything approaching 2 is a
  * pair-explosion bug. Results are recorded in SCALE.md §"Measured
  * scaling". Dev tool — not part of the driver contract.
  *
  * Corpus construction mirrors production growth, not degenerate
  * replication: each text replica is a NEAR-duplicate of its siblings
  * (dup-heavy, stresses candidate generation); embedding replicas get a
  * deterministic per-replica orthogonal-ish perturbation and the IVF
  * centroid count grows with the corpus (16·f) — the production contract
  * that cells bound the within-cell pair explosion as data grows.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val baseDocs = docs.count()
    val baseVecs = emb.count()

    def blowDocs(f: Int): DataFrame = (0 until f).map(i =>
      docs.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        concat(col("text"), lit(" v" + i)).as("text")))
      .reduce(_ unionAll _)

    // replica i is the CYCLIC SHIFT of the embedding by i components:
    // norm- and distribution-preserving, but rotated random vectors are
    // ~orthogonal to their originals — so the dup RATE stays constant as
    // the corpus grows (each replica contributes the base corpus's pair
    // structure, shifted; cross-replica pairs stay below threshold).
    // A near-dup perturbation instead makes every replica pair with all
    // its siblings — output grows f², and the measurement reads output
    // explosion, not operator scaling.
    def blowEmb(f: Int): DataFrame = (0 until f).map { i =>
      val rot =
        if (i == 0) col("embedding")
        else expr(s"concat(slice(embedding, ${i + 1}, size(embedding) - $i), " +
          s"slice(embedding, 1, $i))")
      emb.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"), rot.as("embedding"))
    }.reduce(_ unionAll _)

    val queries = Seq((1L, "spark join"), (2L, "window stream"), (3L, "hash filter scan"))
      .toDF("qid", "qtext")

    // (name, factor => result-count thunk). The blown corpus is WRITTEN
    // TO PARQUET and read back — production inputs come from storage;
    // leaving the f-way union as lineage instead re-computes it inside
    // every downstream job and over-charges multi-job operators (d11
    // measured 25.5 s from lineage vs 9.8 s from storage at f=10)
    val tmp = java.nio.file.Files.createTempDirectory("graft_smoke").toString
    def ops(f: Int): Seq[(String, () => Long)] = {
      lazy val d = {
        blowDocs(f).write.mode("overwrite").parquet(s"$tmp/docs_$f")
        spark.read.parquet(s"$tmp/docs_$f")
      }
      lazy val e = {
        blowEmb(f).write.mode("overwrite").parquet(s"$tmp/emb_$f")
        spark.read.parquet(s"$tmp/emb_$f")
      }
      Seq(
        "minhash_dedup(d02)" -> (() =>
          graft.pipeline.Dedup.minhashDedup(d, "text", "doc_id", threshold = 0.5).count()),
        "incr_minhash(d11)" -> (() => {
          val old = d.filter(col("doc_id") % 2 === 0)
          val batch = d.filter(col("doc_id") % 2 === 1)
          val index = graft.pipeline.Dedup.bandRows(
            graft.pipeline.Dedup.minhashSignaturesFromShingles(
              graft.pipeline.Dedup.shingled(old, "text", "doc_id")))
          val (kept, _) = graft.pipeline.Dedup.incrementalMinhash(batch, index,
            "text", "doc_id", threshold = 0.5)
          kept.count()
        }),
        "span_dedup(t09)" -> (() =>
          graft.pipeline.Dedup.spanDedup(d, "text", "doc_id", w = 6).count()),
        "bm25_retrieve(c06)" -> (() =>
          graft.pipeline.Relevance.bm25Retrieve(d, "text", "doc_id",
            queries, "qid", "qtext", k = 10).count()),
        "tfidf(c01)" -> (() =>
          graft.pipeline.Relevance.tfidfTopTerms(d, "text", "doc_id", k = 3).count()),
        "semantic_dedup(a05)" -> (() => {
          // cells grow with the corpus: 16·f centroids keep E[cell size]
          // constant — the scale contract that bounds within-cell pairs
          val centroids = e.filter(col("vec_id") < 16L * f).orderBy("vec_id")
            .select("embedding").collect()
            .map(_.getSeq[Float](0).toArray.map(_.toDouble))
          val idx = graft.pipeline.IvfIndex.buildFromCentroids(e, "embedding", "vec_id", centroids)
          graft.pipeline.Dedup.semanticPairs(idx, threshold = 0.35).count()
        }))
    }

    val factors = Seq(1, 2, 5, 10)
    // times(op)(factor) = min-of-N seconds
    val times = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Map[Int, Double]]
    for (f <- factors; (name, thunk) <- ops(f)) {
      var best = Double.MaxValue
      var rows = 0L
      val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
      for (_ <- 1 to runs) {
        val t0 = System.nanoTime()
        rows = thunk()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      times.getOrElseUpdate(name, scala.collection.mutable.Map.empty)(f) = best
      println(f"[smoke] factor=$f%-2d docs=${baseDocs * f}%-6d vecs=${baseVecs * f}%-6d " +
        f"op=$name%-20s rows=$rows%-8d min=$best%6.2f s")
      spark.sharedState.cacheManager.clearCache()
    }

    // least-squares slope of log t over log f = the scaling exponent
    println("\n[smoke] scaling exponents (t ~ a * factor^b, min-of-N at f=1/2/5/10):")
    times.toSeq.sortBy(_._1).foreach { case (name, byF) =>
      val pts = factors.map(f => (math.log(f.toDouble), math.log(byF(f))))
      val n = pts.length
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      println(f"[smoke]   $name%-20s b=$b%5.2f   " +
        factors.map(f => f"f=$f:${byF(f)}%.2fs").mkString("  "))
    }
    spark.stop()
    // the blown-corpus copies are gigabytes at f=10 — don't accrete them
    // across dev runs (best-effort; dev tool)
    Cleanup.deleteRecursively(tmp)
  }
}
