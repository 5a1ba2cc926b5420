package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`) —
  * brute-force cosine top-k as the correctness baseline, sign-LSH
  * bucketing as the scale path. All vector math is higher-order array
  * expressions (`zip_with`/`aggregate`) over the native array column — no
  * UDF serialization, stays in Tungsten rows.
  */
object Similarity {

  /** dot(u, v): native codegen'd expression (graft.functions.VectorDot).
    * The composable `aggregate(zip_with(...))` form is interpreted and
    * allocates per row — measurably slower in the ANN scoring loop.
    */
  def dot(u: Column, v: Column): Column = graft.functions.VectorFunctions.dot(u, v)

  def norm(u: Column): Column = sqrt(dot(u, u))

  /** Cosine similarity in one array pass; 0 for zero vectors. Identical
    * arithmetic order to the dot/sqrt composition (oracle-exact).
    */
  def cosine(u: Column, v: Column): Column = graft.functions.VectorFunctions.cosine(u, v)

  /** Interpreted HOF formulation, kept for cross-checking the native
    * expressions in tests.
    */
  def cosineHof(u: Column, v: Column): Column = {
    def d(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val dd = d(u, v); val nu = sqrt(d(u, u)); val nv = sqrt(d(v, v))
    when(nu === 0.0 || nv === 0.0, 0.0).otherwise(dd / (nu * nv))
  }

  def dimOf(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).first().getInt(0)

  /** Deterministic pseudo-random hyperplanes (seeded; reproducible across
    * runs and engines). Returned as plane-major literal arrays.
    */
  def hyperplanes(dim: Int, planes: Int, seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(planes)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-LSH bucket id: one bit per hyperplane (sign of the projection).
    * Vectors in the same bucket are near-duplicate candidates.
    */
  def hyperplaneBucket(v: Column, dim: Int, planes: Int, seed: Long): Column = {
    val hp = hyperplanes(dim, planes, seed)
    val bits = hp.zipWithIndex.map { case (plane, i) =>
      val planeLit = array(plane.map(lit): _*)
      when(dot(v, planeLit) >= 0.0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Brute-force cosine top-k: broadcast the (small) query set, score every
    * corpus vector, take k per query via the native bounded-heap aggregate
    * (map-side partial top-k — no window, no sort). One pass over the corpus,
    * no corpus self-join — the right baseline at any scale where the query
    * set fits in a broadcast.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
                     idCol: String, queryIdCol: String, k: Int,
                     excludeSelf: Boolean = false): DataFrame = {
    val scored0 = corpus.alias("c")
      .join(broadcast(queries.alias("q")))
      .select(col(s"q.$queryIdCol").as("query_id"), col(s"c.$idCol").as("id"),
        cosine(col(s"q.$vecCol"), col(s"c.$vecCol")).as("cosine"))
    // leave-one-out mode (kNN classification of in-corpus queries): drop
    // the query's own row BEFORE ranking, so all k neighbors are others
    val scored = if (excludeSelf) scored0.filter(col("query_id") =!= col("id"))
                 else scored0
    // native bounded-heap top-k (window-identical output): a handful of
    // queries must not funnel every corpus score into |queries| sort tasks
    graft.operators.Views.topKWithRank(scored, "query_id", "cosine", "id", k)
  }

  /** k-nearest-neighbor majority-vote classification over a neighbor
    * frame — the label-propagation / eval primitive over an embedding
    * index (auto-labeling a corpus from a labeled seed, or leave-one-out
    * sanity-checking an embedding column). `neighbors` is any top-k
    * result shaped (query_id, id, rk) ([[bruteForceTopK]] exact,
    * [[lshTopK]] / `IvfIndex.topK` at scale — the vote layer doesn't
    * care which index produced the candidates); `labels` maps corpus id →
    * label. Vote: majority over the ≤ k neighbors, ties to the SMALLEST
    * label (deterministic, engine-portable — no float tie-break).
    *
    * Scale shape: neighbors is result-sized (k × |queries|), so the
    * label join broadcasts the neighbor side under AQE regardless of
    * corpus size, and the vote is one window-free max-of-struct
    * aggregate. Output: (query_id, pred_label, n_votes).
    */
  def knnClassify(neighbors: DataFrame, labels: DataFrame, idCol: String,
                  labelCol: String, k: Int,
                  rankCol: String = "rk"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(labels.schema(labelCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"labelCol '$labelCol' must be numeric (min-label tie-break negates it), " +
        s"got ${labels.schema(labelCol).dataType.simpleString}")
    val lab = labels.select(col(idCol).as("id"), col(labelCol).as("__lab"))
    neighbors.filter(col(rankCol) <= k)
      .select(col("query_id"), col("id"))
      .join(lab, "id")
      .groupBy("query_id", "__lab").agg(count(lit(1)).as("__votes"))
      // argmax(votes) with min-label tie-break, window-free: max of
      // (votes, -label) picks the largest vote count, then the smallest
      // label among equal counts
      .groupBy("query_id")
      .agg(max(struct(col("__votes"), (-col("__lab")).as("__nl"))).as("__w"))
      .select(col("query_id"),
        (-col("__w.__nl")).as("pred_label"),
        col("__w.__votes").as("n_votes"))
  }

  /** Deterministic ±1 sign matrix for [[randomProject]] — SplitMix64 over
    * (seed, j·inDim+i), pure integer arithmetic, so the SAME matrix is
    * reproducible anywhere (another session, the DuckDB oracle via
    * inlined literals) without shipping it.
    */
  def signMatrix(inDim: Int, outDim: Int, seed: Long): Array[Array[Double]] = {
    require(inDim > 0 && outDim > 0, s"dims must be positive, got $inDim→$outDim")
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Array.tabulate(outDim, inDim)((j, i) =>
      if ((mix(seed * 0x100000001b3L + j.toLong * inDim + i) & 1L) == 0L) 1.0 else -1.0)
  }

  /** Extension (ANN scale path): Johnson–Lindenstrauss sign random
    * projection — reduce an embedding column to `outDim` dims as
    * out[j] = (1/√outDim) · Σ_i ±1 · v[i], the classic dense-JL map with
    * Rademacher entries (Achlioptas 2001: ±1 entries preserve pairwise
    * distances with the same JL guarantee as Gaussians, and the kernel
    * is pure fused add/subtract). The point at 100 TB: cosine top-k,
    * LSH bucketing and IVF assignment all cost O(dim) per pair — a
    * 64→16 projection cuts every downstream similarity stage ~4× (and
    * the shuffled bytes of the vectors themselves) for a bounded,
    * measurable recall loss ([[annRecall]] is the eval loop;
    * [[matryoshkaTruncate]] is the cheaper map when the embedding was
    * TRAINED nested — this one needs no such training assumption).
    *
    * Execution: ONE codegen'd [[graft.functions.MatrixProject]] pass —
    * the matrix rides the plan as a reference object (reproducible from
    * (seed, dims) via [[signMatrix]], never persisted), no join, no
    * shuffle, output built straight into an UnsafeArrayData. Ascending-i
    * fold → bit-identical cross-engine (a16 oracle).
    */
  def randomProject(df: DataFrame, vecCol: String, outCol: String,
                    outDim: Int, seed: Long = 42L): DataFrame = {
    val inDim = dimOf(df, vecCol)
    require(outDim > 0 && outDim <= inDim,
      s"outDim must be in [1, $inDim], got $outDim")
    val m = signMatrix(inDim, outDim, seed)
    val proj = org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.MatrixProject(
        org.apache.spark.sql.graftbridge.Bridge.expression(col(vecCol)),
        m, 1.0 / math.sqrt(outDim.toDouble)))
    df.withColumn(outCol, proj)
  }

  /** Extension (contrastive-training data prep): hard-negative mining —
    * for each query vector, the k most-cosine-similar corpus vectors with
    * a DIFFERENT label (the negatives that sit near the decision
    * boundary; random negatives are trivially separable and teach a
    * contrastive/embedding model little). Same execution shape as
    * [[bruteForceTopK]]: broadcast the query set, one corpus pass, native
    * bounded-heap top-k — the label inequality filters candidates BEFORE
    * ranking, so all k slots hold true negatives (no post-rank holes).
    * Requires a NON-NULL `labelCol` on BOTH frames (NULL labels fail the
    * job — they can't be "different" and would silently drop pairs);
    * output (query_id, id, cosine,
    * rk). At corpus scale feed an ANN shortlist ([[lshTopK]] /
    * `IvfIndex.topK` with k inflated by the positive rate) through the
    * same different-label filter + [[graft.operators.Views.topKWithRank]]
    * — the mining contract is index-agnostic.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, vecCol: String,
                    idCol: String, queryIdCol: String, labelCol: String,
                    k: Int): DataFrame = {
    // a NULL label can't be "a different label": under 3-valued logic it
    // would silently drop the pair — a NULL-labeled query would mine ZERO
    // negatives and unlabeled corpus rows would never be candidates. Fail
    // loudly instead (the aucByGroup convention); the guard rides the
    // join condition, so it costs one when() per candidate pair.
    val labelsOk = when(
      col(s"q.$labelCol").isNull || col(s"c.$labelCol").isNull,
      raise_error(lit(s"hardNegatives: labelCol '$labelCol' has NULL " +
        "labels — filter or label those rows first")))
      .otherwise(col(s"q.$labelCol") =!= col(s"c.$labelCol"))
    val scored = corpus.alias("c")
      .join(broadcast(queries.alias("q")), labelsOk)
      .select(col(s"q.$queryIdCol").as("query_id"), col(s"c.$idCol").as("id"),
        cosine(col(s"q.$vecCol"), col(s"c.$vecCol")).as("cosine"))
    graft.operators.Views.topKWithRank(scored, "query_id", "cosine", "id", k)
  }

  /** Recall@k of an approximate ANN result against an exact baseline —
    * the evaluation loop for [[lshTopK]]/`IvfIndex.topK` parameter
    * tuning (planes, nprobe, quantization): per query,
    * |approx ∩ exact| ÷ |exact| over each side's top-k rows. Queries
    * the approximate index missed entirely still get a row (recall 0).
    * The denominator is the baseline's ACTUAL row count, not k — a
    * corpus smaller than k would otherwise cap recall below 1 for a
    * perfect index. Inputs are k×|queries| rows (result-sized, not
    * corpus-sized), so every join here is trivially broadcastable —
    * the expensive work already happened producing them.
    */
  def annRecall(approx: DataFrame, exact: DataFrame, k: Int,
                queryCol: String = "query_id", idCol: String = "id",
                rankCol: String = "rk"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val a = approx.filter(col(rankCol) <= k).select(col(queryCol), col(idCol))
    val e = exact.filter(col(rankCol) <= k).select(col(queryCol), col(idCol))
    val hits = e.join(a, Seq(queryCol, idCol), "left_semi")
      .groupBy(queryCol).agg(count(lit(1)).as("n_hits"))
    e.groupBy(queryCol).agg(count(lit(1)).as("n_truth"))
      .join(hits, Seq(queryCol), "left_outer")
      .select(col(queryCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"), col("n_truth"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_truth")).as("recall"))
  }

  /** Symmetric per-vector int8 quantization: scale = max|x|/127, codes =
    * round-half-up(x/scale) ∈ [−127, 127]. 4× memory/shuffle reduction
    * for ANN indexes; pair with [[dequantize]] + [[cosine]] to measure
    * the recall cost. Rounding is floor(x/scale + 0.5) explicitly —
    * "round" builtins disagree across engines on ties (half-up vs
    * half-away-from-zero), floor(+0.5) is the same everywhere. Zero
    * vectors get scale 0 and all-zero codes.
    *
    * r17: delegates to the native codegen expression
    * [[graft.functions.QuantizeInt8]] (bit-identical arithmetic) — the
    * previous `aggregate`+`transform` HOF chain was CodegenFallback and
    * kept the corpus-sized sidecar projection out of whole-stage
    * codegen (the a11 JIT-shelf attribution, see the expression's doc).
    */
  def quantizeInt8(v: Column): Column =
    graft.functions.VectorFunctions.quantizeInt8(v)

  /** Reconstruct the (lossy) double vector from a [[quantizeInt8]] struct. */
  def dequantize(q: Column): Column =
    transform(q.getField("codes"), c => c.cast("double") * q.getField("scale"))

  /** Per-group embedding centroid: the element-wise mean of each group's
    * vectors, as (groupCol, centroid: array<double>) — one row per group.
    *
    * Shape: explode to (group, dim, val) → ONE (group, dim) aggregate
    * (map-side combined; shuffled bytes are O(groups × dim), never
    * O(rows × dim)) → reassemble each centroid from its dims. The
    * default sums each dimension associatively — the 100 TB path.
    * `exact = true` instead folds each dimension's values in `idCol`
    * order (the t10/c02 ordered-fold discipline): bit-identical across
    * engines and re-runs, at the cost of buffering one (id, val) list
    * per (group, dim) — the oracle-parity path, fine to ~10⁶ rows per
    * group, not the corpus default.
    */
  def groupCentroids(df: DataFrame, vecCol: String, idCol: String,
                     groupCol: String, exact: Boolean = false): DataFrame = {
    val ex = df
      .select(col(groupCol), col(idCol).as("__id"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("__dim", "__val")))
    val perDim =
      if (exact)
        ex.groupBy(col(groupCol), col("__dim")).agg(
          (expr("""aggregate(
                  |  transform(array_sort(collect_list(struct(__id, __val))), s -> s.__val),
                  |  cast(0.0 as double), (acc, x) -> acc + x)""".stripMargin)
            / count(lit(1))).as("__c"))
      else
        ex.groupBy(col(groupCol), col("__dim"))
          .agg((sum(col("__val")) / count(lit(1))).as("__c"))
    perDim.groupBy(col(groupCol)).agg(
      expr("transform(array_sort(collect_list(struct(__dim, __c))), s -> s.__c)")
        .as("centroid"))
  }

  /** Per-group centroid outliers: the `k` vectors FARTHEST (cosine
    * distance) from their OWN group's centroid — the standard
    * noisy/mislabeled-example signal over a labeled or source-tagged
    * embedding table (a row far from everything sharing its tag is a
    * labeling error, an off-topic document, or an embedding glitch).
    * Output: (groupCol, idCol, dist, rk) with rk identical to
    * `row_number over (partition by group order by dist DESC, id ASC)`.
    *
    * Scale shape: centroids are one row per group → broadcast join-back;
    * distance is one codegen'd per-row expression; ranking is the
    * bounded-heap top-k aggregate ([[graft.operators.Views.topKWithRank]])
    * — map-side partial top-k, NO window, no sort of the corpus. The
    * `exact` flag routes the centroid mean (see [[groupCentroids]]).
    */
  def centroidOutliers(df: DataFrame, vecCol: String, idCol: String,
                       groupCol: String, k: Int,
                       exact: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val cents = groupCentroids(df, vecCol, idCol, groupCol, exact)
    val scored = df
      .select(col(groupCol), col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .join(broadcast(cents), Seq(groupCol))
      .select(col(groupCol), col(idCol),
        (lit(1.0) - cosine(col("__v"), col("centroid"))).as("dist"))
    graft.operators.Views.topKWithRank(scored, groupCol, "dist", idCol, k)
  }

  /** Matryoshka truncation: keep the first k dimensions of an
    * MRL-trained embedding (prefix dims carry the coarse structure) and
    * optionally renormalize to unit length — the standard cheap-ANN /
    * storage-tiering move: search at dim k, rerank survivors at full
    * dim. Per-row expression, shuffle-free; cosine ranking in the
    * truncated space is scale-invariant, so renormalization matters only
    * for downstream consumers that assume unit vectors (e.g. int8
    * quantization, dot-product-as-cosine indexes). Zero-norm prefixes
    * stay zero vectors.
    */
  def matryoshkaTruncate(df: DataFrame, vecCol: String, k: Int,
                         renormalize: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val t = slice(col(vecCol), 1, k)
    if (!renormalize) df.withColumn(vecCol, t)
    else {
      // norm lands in its own column first: a lambda capturing the dot
      // SUBTREE would re-evaluate it per element (interpreted HOF
      // capture — this file's standing caveat); capturing an attribute
      // reference is free
      df.withColumn("__mt", t)
        .withColumn("__mn", sqrt(dot(col("__mt"), col("__mt"))))
        .withColumn(vecCol,
          when(col("__mn") === 0.0d, transform(col("__mt"), x => x.cast("double")))
            .otherwise(transform(col("__mt"), x => x.cast("double") / col("__mn"))))
        .drop("__mt", "__mn")
    }
  }

  /** Embedding-space benchmark decontamination — the semantic twin of
    * `TextAnalysis.decontaminate`'s n-gram overlap: flag corpus items
    * whose MAX cosine against any eval-set embedding reaches `threshold`
    * (catches paraphrased/reworded eval leakage that shingle overlap
    * misses). Output: (id, max_eval_cosine, contaminated).
    *
    * Scale shape: eval suites are small — broadcast them, one pass over
    * the corpus, partial-aggregated max per id (max is order-independent,
    * so no float-fold caveat). Same plan family as [[bruteForceTopK]].
    */
  def semanticDecontaminate(corpus: DataFrame, vecCol: String, idCol: String,
                            evalSet: DataFrame, threshold: Double): DataFrame = {
    // an empty eval set would cross-join to ZERO rows — a pipeline
    // keeping `!contaminated` docs would silently drop the whole corpus
    require(!evalSet.isEmpty, "semanticDecontaminate: eval set is empty")
    val scored = corpus.alias("c")
      .join(broadcast(evalSet.select(col(vecCol).as("__ev"))))
      .select(col(s"c.$idCol").as("id"),
        cosine(col(s"c.$vecCol"), col("__ev")).as("__cos"))
    scored.groupBy("id")
      .agg(max(col("__cos")).as("max_eval_cosine"))
      // NULL embeddings null-propagate to a NULL max — classify as NOT
      // contaminated (max_eval_cosine stays NULL for visibility) so
      // contaminated/!contaminated partitions the corpus (same contract
      // as c4Rules.keep)
      .withColumn("contaminated",
        coalesce(col("max_eval_cosine") >= threshold, lit(false)))
  }

  /** LSH-bucketed ANN: restrict scoring to corpus vectors whose bucket
    * matches any query bucket (multi-probe = 0: exact bucket only).
    * Trades recall for a bucket-selective scan — the 100 TB path; measure
    * recall against bruteForceTopK on a sample.
    *
    * This stateless form re-buckets the corpus on every call — right for
    * one-shot queries. A serving loop should [[buildLshIndex]] once and
    * probe it with [[lshTopKIndexed]] (measured in tools/AnnSmoke: the
    * bucket hash dominates this call's wall at 200 k × 64).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
              idCol: String, queryIdCol: String, k: Int,
              planes: Int = 10, seed: Long = 7L): DataFrame = {
    val dim = dimOf(corpus, vecCol)
    val cb = corpus.select(col(idCol).as("id"), col(vecCol).as("cv"),
      hyperplaneBucket(col(vecCol), dim, planes, seed).as("bucket"))
    lshProbe(LshIndex(planes, seed, dim, cb), queries, vecCol, queryIdCol, k,
      multiProbe = 0)
  }

  /** A prebuilt sign-LSH index: the corpus bucketed ONCE, partitioned by
    * bucket (bucketable on disk exactly like `IvfIndex.corpus`), so each
    * probe touches only matching buckets instead of re-hashing the
    * corpus per call.
    */
  final case class LshIndex(planes: Int, seed: Long, dim: Int, corpus: DataFrame)

  def buildLshIndex(corpus: DataFrame, vecCol: String, idCol: String,
                    planes: Int = 10, seed: Long = 7L): LshIndex = {
    val dim = dimOf(corpus, vecCol)
    val cb = corpus.select(col(idCol).as("id"), col(vecCol).as("cv"),
      hyperplaneBucket(col(vecCol), dim, planes, seed).as("bucket"))
      .repartition(col("bucket"))
    LshIndex(planes, seed, dim, cb)
  }

  /** Probe a [[buildLshIndex]] index with MULTI-PROBE: each query scores
    * the corpus vectors in its own bucket plus every bucket within
    * Hamming distance `multiProbe` of it (0 = exact bucket, the
    * [[lshTopK]] behavior). Sign-LSH's most likely misses are vectors
    * whose projection on one or two planes sits just across zero —
    * exactly the Hamming-1/2 neighbor buckets — so multi-probe buys
    * recall at a probes-per-query cost of 1 + p + p(p−1)/2 buckets
    * (p = planes) instead of the 2^t bucket-count blowup of adding
    * tables. Probe buckets are distinct, so no candidate is scored
    * twice; the probe frame is (queries × probes) rows — broadcast-sized
    * — and the candidate join stays an equi-join on the bucket key.
    */
  def lshTopKIndexed(index: LshIndex, queries: DataFrame, vecCol: String,
                     queryIdCol: String, k: Int, multiProbe: Int = 1): DataFrame =
    lshProbe(index, queries, vecCol, queryIdCol, k, multiProbe)

  /** Hamming-ball bit-flip masks for [[lshTopKIndexed]]: 0 (the bucket
    * itself), each single bit, each bit pair — exposed for the oracle
    * replica, which inlines the same masks.
    */
  def probeMasks(planes: Int, multiProbe: Int): Seq[Long] = {
    require(multiProbe >= 0 && multiProbe <= 2,
      s"multiProbe must be 0..2, got $multiProbe")
    val d1 = if (multiProbe >= 1) (0 until planes).map(i => 1L << i) else Nil
    val d2 = if (multiProbe >= 2)
      for (i <- 0 until planes; j <- (i + 1) until planes)
        yield (1L << i) | (1L << j)
    else Nil
    0L +: (d1 ++ d2)
  }

  /** The candidate frame [[lshTopKIndexed]] scores — the post-bucket-join
    * rows (query_id, qv, id, cv, bucket), BEFORE cosine scoring and the
    * top-k window. Exposed so instrumentation (tools/AnnSmoke's scan_frac)
    * counts the same rows the probe actually scores instead of maintaining
    * a replica of the probe selection that can silently desynchronize.
    */
  def lshCandidates(index: LshIndex, queries: DataFrame, vecCol: String,
                    queryIdCol: String, multiProbe: Int): DataFrame = {
    val qb = queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("qv"),
      hyperplaneBucket(col(vecCol), index.dim, index.planes, index.seed).as("qbucket"))
    val masks = probeMasks(index.planes, multiProbe)
    val probes = qb.select(col("query_id"), col("qv"),
      explode(array(masks.map(m => col("qbucket").bitwiseXOR(lit(m))): _*)).as("bucket"))
    index.corpus.join(broadcast(probes), "bucket")
  }

  private def lshProbe(index: LshIndex, queries: DataFrame, vecCol: String,
                       queryIdCol: String, k: Int, multiProbe: Int): DataFrame = {
    val scored = lshCandidates(index, queries, vecCol, queryIdCol, multiProbe)
      .select(col("query_id"), col("id"), cosine(col("qv"), col("cv")).as("cosine"))
    graft.operators.Views.topKWithRank(scored, "query_id", "cosine", "id", k)
  }
}
