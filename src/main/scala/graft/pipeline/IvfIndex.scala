package graft.pipeline

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index: corpus vectors are assigned to k-means
  * cells; a query scores only the `nprobe` nearest cells' vectors.
  *
  * The 100 TB shape: the indexed corpus is partitioned (and on disk,
  * bucketed) by `cell`, so a query touches nprobe/nCells of the data;
  * centroids are tiny and broadcast. Compare `Similarity.lshTopK`
  * (stateless, no training) — IVF trades a one-off k-means for much
  * better recall at the same probe budget.
  */
object IvfIndex {

  /** `corpus` is the assigned (id, v, cell) frame; `rawVecs` keeps the
    * pre-assignment (id, v) projection so consumers that need vectors
    * WITHOUT cells (e.g. [[topKQuantized]]'s exact re-rank) can fetch
    * them without re-deriving the argmax + cell shuffle — on a stored
    * index this is the float tier next to the int8 sidecar. `quantized`
    * (r16, advice) carries the STORED (id, cell, q8) int8 tier when the
    * index was [[load]]ed from disk, so [[topKQuantized]] scores the
    * persisted artifact instead of re-deriving it from the float corpus
    * every session; None on a freshly built index (the sidecar derives
    * inline via [[quantizedSidecar]]).
    */
  final case class Index(centroids: Array[Array[Double]], corpus: DataFrame,
                         rawVecs: Option[DataFrame] = None,
                         quantized: Option[DataFrame] = None)

  /** Build the index: k-means over (a sample of) the corpus, then assign
    * every vector to its nearest centroid. `corpus` output columns:
    * (id, v, cell), repartitioned by cell.
    */
  def build(df: DataFrame, vecCol: String, idCol: String, nCells: Int,
            seed: Long = 42L, sampleFraction: Double = 1.0): Index = {
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val trainSet = (if (sampleFraction < 1.0) vecs.sample(sampleFraction, seed) else vecs)
      .withColumn("features", array_to_vector(col("v")))
    val model = new KMeans().setK(nCells).setSeed(seed).setFeaturesCol("features")
      .fit(trainSet)
    buildFromCentroids(df, vecCol, idCol, model.clusterCenters.map(_.toArray))
  }

  /** Index from explicit centroids — no training pass. Use for
    * warm-started / externally-trained indexes, and for deterministic
    * builds (k-means|| init is engine-specific RNG; fixed centroids make
    * the whole assign→probe→score pipeline cross-engine reproducible —
    * see the a03 oracle).
    */
  def buildFromCentroids(df: DataFrame, vecCol: String, idCol: String,
                         centroids: Array[Array[Double]]): Index = {
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    Index(centroids, assign(vecs, centroids), Some(vecs))
  }

  /** Assign (id, v) rows to their nearest centroid and partition by cell.
    * Two assignment shapes: inlined-literal argmax up to
    * [[maxInlineCentroids]] (proven, zero shuffle, pure codegen — but the
    * Column tree grows one literal array per centroid and chokes Janino
    * near ~80); beyond that, the [[graft.functions.NearestCentroid]]
    * matrix expression — the SAME flat argmax as ONE generated loop over
    * a dim-major `double[]` reference object. Both are exact and
    * bit-identical (score = dot − ‖c‖²/2, ties → higher cell); the
    * r14-measured contrast vs the earlier broadcast-join shape
    * ([[nearestCellByJoin]], kept as the spec-pinned reference twin) is
    * 78 s → ~2 s at 200 k vectors × 1 600 cells: the join streamed a
    * |vecs|×|cells| row set through a partial aggregate where the loop
    * does ~20 GFLOP in-register.
    */
  private def assign(vecs: DataFrame, centroids: Array[Array[Double]]): DataFrame =
    (if (centroids.length <= maxInlineCentroids)
      vecs.withColumn("cell", nearestCell(col("v"), centroids))
    else vecs.withColumn("cell", nearestCellMatrix(col("v"), centroids)))
      .repartition(col("cell"))

  /** The matrix-expression argmax as a Column — exposed so callers
    * composing their own assignment (and the equality specs) can use it
    * directly at any centroid count.
    */
  def nearestCellMatrix(v: Column, centroids: Array[Array[Double]]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.NearestCentroid(
        org.apache.spark.sql.graftbridge.Bridge.expression(v), centroids))

  /** Incrementally add `batch` to an existing index WITHOUT retraining and
    * without rescanning the indexed corpus: only the new vectors run the
    * nearest-centroid assignment (the same argmax path as the build, so an
    * appended index is bit-identical to rebuilding over corpus ∪ batch
    * with the same frozen centroids — the a10 oracle pins this). At
    * 100 TB the nightly ingest costs O(batch), not O(corpus). Duplicate
    * ids are NOT deduplicated — upsert policy belongs to the caller.
    * Centroids drift as the distribution moves; watch [[cellStats]] and
    * rebuild when cell occupancy skews.
    */
  def append(index: Index, batch: DataFrame, vecCol: String, idCol: String): Index = {
    val vecs = batch.select(col(idCol).as("id"), col(vecCol).as("v"))
    Index(index.centroids, index.corpus.unionByName(assign(vecs, index.centroids)),
      index.rawVecs.map(_.unionByName(vecs)))
  }

  /** Per-cell occupancy — the rebuild-decision monitor for [[append]].
    * One partial-aggregated groupBy over the corpus: (cell, n). A healthy
    * index has max(n)/avg(n) near 1; a hot cell means the frozen
    * centroids no longer match the data and probe cost degrades toward a
    * scan of that cell.
    */
  def cellStats(index: Index): DataFrame =
    index.corpus.groupBy("cell").agg(count(lit(1)).as("n"))

  /** Cluster-balanced coverage sample: keep at most `perCell` vectors
    * per cell, chosen by the deterministic portable hash rank of the id
    * (Views.stratifiedSampleDf's xor-fold — a pure function of the key,
    * so a re-run or a cross-engine replay selects the same rows). This
    * is the diversity-preserving subsample for embedding corpora: a
    * uniform sample mirrors the data's cluster-size skew (mega-clusters
    * of boilerplate dominate), whereas capping every k-means cell keeps
    * the sample's coverage of the embedding space — the cluster-balanced
    * selection step in SemDeDup-style curation pipelines.
    *
    * Scale shape: the corpus is already partitioned by cell, and the
    * per-cell cap is the boundary-sub-range rank-prefix selection — no
    * whole-cell window, so a mega-cell cannot become one straggler sort
    * task. Output: the capped (id, v, cell) frame.
    */
  def diversitySample(index: Index, perCell: Int): DataFrame =
    graft.operators.Views.stratifiedSampleDf(index.corpus, "cell", perCell, "id")

  /** Centroid-count threshold above which assignment switches from the
    * inlined-literal expression to the [[nearestCellMatrix]] native
    * expression. Measured (ivf decade ladder, 64-dim): ~80 inlined
    * centroids sit on a Janino compile cliff — the generated argmax
    * method is near the JIT/codegen size limit and COMPILATION dominates
    * the job (f=5 @ 80 cells: 8.6 s vs f=10 @ 160 cells: 3.4 s, where
    * codegen gives up and the interpreted path wins). Inline literals
    * only clearly win while the expression stays comfortably compilable,
    * so the cutover sits at 48; past it the matrix expression is one
    * constant-size generated loop at ANY centroid count (the r14
    * replacement for the broadcast-join fallback, which streamed
    * |vecs|×|cells| rows — 78 s vs 6 s at 200 k × 1 600).
    */
  val maxInlineCentroids: Int = 48

  /** The broadcast (cell, cv, half_norm) centroid table. half_norm =
    * ||c||²/2 carries the L2-argmin identity (argmin ||v−c|| = argmax
    * v·c − ||c||²/2) that ties probe RANKING to assignment — one
    * definition so the two sides cannot desynchronize (r14 review).
    */
  private def centroidFrame(spark: org.apache.spark.sql.SparkSession,
                            centroids: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    spark.createDataset(
      centroids.zipWithIndex.map { case (c, i) =>
        (i, c.toSeq, c.map(x => x * x).sum / 2.0)
      }.toSeq).toDF("cell", "cv", "half_norm")
  }

  /** Assignment via broadcast centroid join: score every (vector,
    * centroid) pair against the broadcast table, keep the argmax cell per
    * id with `max_by`. One map-side join + one partial-aggregated groupBy
    * on id — no literal blowup, scales to tens of thousands of cells.
    */
  private[pipeline] def nearestCellByJoin(vecs: DataFrame,
                                          centroids: Array[Array[Double]]): DataFrame = {
    val cents = centroidFrame(vecs.sparkSession, centroids)
    vecs.crossJoin(broadcast(cents))
      .select(col("id"), col("v"),
        struct((graft.functions.VectorFunctions.dot(col("v"), col("cv")) - col("half_norm")).as("s"),
          col("cell").as("cell")).as("sc"),
        col("cell"))
      // max_by on the (score, cell) struct: ties break toward the highest
      // cell id — the SAME order array_max gives the inlined path, so the
      // two assignment shapes are bit-identical
      .groupBy("id").agg(first(col("v")).as("v"), max_by(col("cell"), col("sc")).as("cell"))
  }

  /** Nearest-centroid expression: argmin over squared L2 distance, i.e.
    * argmax(dot − ‖c‖²/2) — one native vector_dot per centroid, centroids
    * inlined as literals (broadcast-by-constant).
    *
    * argmax is `array_max` over (score, cell) structs, NOT a when/otherwise
    * fold: a fold references each accumulated subtree ~3× per level, so
    * the Column tree grows 3^k — at k=16 the ColumnNode→Expression
    * conversion alone ran for minutes. array_max keeps it linear.
    */
  def nearestCell(v: Column, centroids: Array[Array[Double]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val cLit = array(c.map(lit): _*)
      val halfNorm = c.map(x => x * x).sum / 2.0
      struct((graft.functions.VectorFunctions.dot(v, cLit) - halfNorm).as("s"),
        lit(i).as("cell"))
    }
    array_max(array(scored: _*)).getField("cell")
  }

  /** Rank each query's `nprobe` nearest cells then score only vectors in
    * those cells. Returns (query_id, id, cosine, rk) top-k per query.
    *
    * Probe ranking uses the SAME score as assignment (dot − ‖c‖²/2 =
    * L2 argmin): cells are L2-Voronoi regions, so probing by a different
    * metric (cosine) would systematically miss the cells that actually
    * hold a query's neighbors when vector norms vary. For cosine search
    * L2-normalize the vectors first — then the two metrics coincide and
    * the final cosine ranking is exact within the probed cells.
    */
  def topK(index: Index, queries: DataFrame, vecCol: String, queryIdCol: String,
           k: Int, nprobe: Int): DataFrame = {
    val scored = candidates(index, queries, vecCol, queryIdCol, nprobe)
      .select(col("query_id"), col("id"),
        graft.functions.VectorFunctions.cosine(col("qv"), col("v")).as("cosine"))
    graft.operators.Views.topKWithRank(scored, "query_id", "cosine", "id", k)
  }

  /** The candidate frame [[topK]] scores — corpus rows joined to each
    * query's `nprobe` nearest cells (query_id, qv, id, v, cell), BEFORE
    * cosine scoring and the top-k window. Exposed so instrumentation
    * (tools/AnnSmoke's scan_frac) counts the same rows topK actually
    * scores instead of maintaining a replica of the probe selection.
    */
  def candidates(index: Index, queries: DataFrame, vecCol: String,
                 queryIdCol: String, nprobe: Int): DataFrame =
    index.corpus.join(
      broadcast(probeFrame(index, queries, vecCol, queryIdCol, nprobe)), "cell")

  /** Each query's `nprobe` nearest cells as (query_id, qv, cell) — the
    * probe selection shared by [[candidates]] and [[topKQuantized]]
    * (assignment-metric ranking, ties → lower cell; see [[topK]]).
    */
  private def probeFrame(index: Index, queries: DataFrame, vecCol: String,
                         queryIdCol: String, nprobe: Int): DataFrame = {
    val q = queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("qv"))
    val cents = centroidFrame(queries.sparkSession, index.centroids)
    q.crossJoin(broadcast(cents))
      .select(col("query_id"), col("qv"), col("cell"),
        (graft.functions.VectorFunctions.dot(col("qv"), col("cv")) - col("half_norm")).as("cs"))
      .withColumn("crk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cs").desc, col("cell"))))
      .filter(col("crk") <= nprobe)
      .select("query_id", "qv", "cell")
  }

  /** IVF search that scores the probed cells on an int8-quantized
    * sidecar and re-ranks only a per-query `shortlist` at full
    * precision — the standard memory-tiering move for corpus-scale ANN:
    * the shortlist pass reads (id, cell, scale, int8[dim]) ≈ ¼ the bytes
    * of the float corpus, and the float vectors are fetched for
    * |queries| × shortlist rows only (broadcast-hash semi-fetch, never
    * a corpus shuffle). Recall loss vs [[topK]] is bounded by the
    * quantization error ONLY at the shortlist boundary — candidates
    * whose true rank ≤ k but int8 rank > shortlist; size `shortlist`
    * at 2-4× k to absorb it (a04 measures round-trip cosine ≥ 0.999 on
    * this corpus, so the boundary band is thin).
    *
    * In production the sidecar is the STORED index artifact (write
    * `quantizedSidecar(index)` once, bucketed by cell); here it derives
    * inline from the corpus frame so the operator stays self-contained.
    *
    * Deterministic end-to-end: quantization uses the portable
    * floor(x/scale + 0.5) rounding (a04), both ranking passes break
    * ties by id.
    */
  def topKQuantized(index: Index, queries: DataFrame, vecCol: String,
                    queryIdCol: String, k: Int, nprobe: Int,
                    shortlist: Int): DataFrame = {
    require(shortlist >= k,
      s"shortlist ($shortlist) must be >= k ($k) — the exact pass can " +
        "only re-rank what the quantized pass kept")
    val probes = broadcast(
      probeFrame(index, queries, vecCol, queryIdCol, nprobe))
    // r17: fused native cosine∘dequantize — the per-pair `transform`
    // dequantize was CodegenFallback, keeping the hottest loop of the
    // int8 path (|probed cells| × corpus pairs) interpreted; the fused
    // expression is bit-identical (same element order and operations)
    // so the oracle-pinned shortlist ranks are unchanged
    val approx = quantizedSidecar(index).join(probes, "cell")
      .select(col("query_id"), col("id"),
        graft.functions.VectorFunctions.cosineDequantInt8(
          col("qv"), col("q8")).as("cos8"))
    val short = graft.operators.Views
      .topKWithRank(approx, "query_id", "cos8", "id", shortlist)
      .select("query_id", "id")
    // exact pass: stream the FLOAT tier once (rawVecs — the
    // pre-assignment projection, so no argmax/cell-shuffle recompute),
    // keep only shortlist ids (broadcast), then re-attach each query's
    // vector (broadcast) — the full-precision frame never shuffles
    val qv = queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("qv"))
    val floats = index.rawVecs.getOrElse(index.corpus).select(col("id"), col("v"))
    val exact = floats
      .join(broadcast(short), "id")
      .join(broadcast(qv), "query_id")
      .select(col("query_id"), col("id"),
        graft.functions.VectorFunctions.cosine(col("qv"), col("v")).as("cosine"))
    graft.operators.Views.topKWithRank(exact, "query_id", "cosine", "id", k)
  }

  /** The int8 index sidecar [[topKQuantized]] scores: (id, cell, q8)
    * with `q8 = (scale, codes)` per [[Similarity.quantizeInt8]]. On a
    * [[load]]ed index this is the stored tier (¼-size parquet scan,
    * partition-pruned to the probed cells); otherwise it derives from
    * the float corpus inline — identical values either way, since the
    * quantizer is deterministic.
    */
  def quantizedSidecar(index: Index): DataFrame =
    index.quantized.getOrElse(
      index.corpus.select(col("id"), col("cell"),
        Similarity.quantizeInt8(col("v")).as("q8")))

  /** Persist the index as a durable, manifest-verified parquet artifact
    * (r14 verdict ask #5 — [[append]] and the s09 streaming ingest imply
    * an index that outlives the session):
    *
    *   - `<path>/centroids/` — (cell, c): config-sized, one shard;
    *   - `<path>/corpus/`    — (id, v, cell), hive-partitioned by cell;
    *   - `<path>/quantized/` — (id, cell, q8) int8 sidecar, partitioned
    *     by cell — the tier [[topKQuantized]] scores, stored instead of
    *     re-derived per session;
    *   - `<path>/raw/`       — (id, v) float tier for the exact re-rank
    *     (omitted when the index carries no rawVecs).
    *
    * Every tier goes through [[graft.sources.Manifest.writeWithManifest]]
    * (the p04 verified-publish pattern), so a copied/moved index is
    * checkable shard by shard before it serves traffic. Partitioning the
    * vector tiers by cell is the 100 TB read path: the probe join's
    * broadcast side is a handful of cell ids, so dynamic partition
    * pruning reads only the probed cells' directories — a loaded index
    * scans nprobe/nCells of the corpus, same as the in-session shape.
    */
  def save(index: Index, path: String): Unit = {
    val spark = index.corpus.sparkSession
    import spark.implicits._
    val cents = index.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
    graft.sources.Manifest.writeWithManifest(
      cents.toDF("cell", "c").coalesce(1), s"$path/centroids")
    graft.sources.Manifest.writeWithManifest(
      index.corpus.select("id", "v", "cell"), s"$path/corpus", Seq("cell"))
    graft.sources.Manifest.writeWithManifest(
      quantizedSidecar(index), s"$path/quantized", Seq("cell"))
    index.rawVecs.foreach(rv => graft.sources.Manifest.writeWithManifest(
      rv.select("id", "v"), s"$path/raw"))
  }

  /** Load a [[save]]d index. With `verify = true` (default) every stored
    * tier's manifest is re-checked shard by shard first and any
    * rows/hash mismatch fails the load loudly — an index that silently
    * lost a cell directory would return plausible-but-wrong neighbors,
    * the worst failure mode a stored ANN artifact has. Centroids load
    * to the driver (config-sized); the vector tiers stay as lazy scans,
    * so loading is O(centroids), not O(corpus). Search-after-load is
    * bit-identical to search-before-save (same centroids, same vectors,
    * same tie-breaks — the a18 oracle pins it).
    */
  def load(spark: org.apache.spark.sql.SparkSession, path: String,
           verify: Boolean = true): Index = {
    val rawPath = new org.apache.hadoop.fs.Path(s"$path/raw")
    val hasRaw = rawPath
      .getFileSystem(spark.sparkContext.hadoopConfiguration).exists(rawPath)
    val tiers = Seq("centroids", "corpus", "quantized") ++
      (if (hasRaw) Seq("raw") else Nil)
    if (verify) tiers.foreach { t =>
      val bad = graft.sources.Manifest.verifyManifest(spark, s"$path/$t")
        .filter(!col("ok")).count()
      require(bad == 0L,
        s"IvfIndex.load: tier '$t' fails manifest verification ($bad shards) — " +
          "refusing to serve a corrupted index")
    }
    val cents = spark.read.parquet(s"$path/centroids").orderBy("cell").collect()
      .map(_.getAs[scala.collection.Seq[Double]]("c").toArray)
    val corpus = spark.read.parquet(s"$path/corpus")
    val raw = if (tiers.contains("raw"))
      Some(spark.read.parquet(s"$path/raw")) else None
    // the stored int8 tier is the one topKQuantized serves (r16 advice:
    // it was verified but never read before) — its values are identical
    // to an in-session re-derivation because quantizeInt8 is
    // deterministic, so a18's search-after-load pin still holds
    Index(cents, corpus, raw, Some(spark.read.parquet(s"$path/quantized")))
  }

  /** Recall@k of an ANN result against the brute-force truth: fraction of
    * true top-k ids recovered PER QUERY, then averaged (macro — a query
    * with fewer than k truth rows weighs the same as any other).
    */
  def recallAt(ann: DataFrame, truth: DataFrame, k: Int): Double = {
    val a = ann.filter(col("rk") <= k).select("query_id", "id")
    val t = truth.filter(col("rk") <= k).select("query_id", "id")
    val perQuery = t.join(a.withColumn("__hit", lit(1)), Seq("query_id", "id"), "left")
      .groupBy("query_id")
      .agg((sum(coalesce(col("__hit"), lit(0))).cast("double") / count(lit(1))).as("r"))
      .agg(avg("r")).first()
    require(!perQuery.isNullAt(0), "recallAt: empty truth frame")
    perQuery.getDouble(0)
  }
}
