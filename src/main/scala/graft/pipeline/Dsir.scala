package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance resampling (Xie et al. 2023, "Data Selection
  * for Language Models via Importance Resampling") — extension beyond
  * the reference: select raw-corpus documents that look like a TARGET
  * domain under bag-of-hashed-ngrams unigram models.
  *
  * Per document, the importance weight is
  *   log p_target(doc) − log p_raw(doc)
  *     = Σ_features tf_f · [ln((ct_f+α)/(T_t+αB)) − ln((cr_f+α)/(T_r+αB))]
  * where features are word unigrams + bigrams hashed into B buckets
  * (the hash IS the vocabulary — nothing corpus-sized to build or
  * broadcast), ct/cr are target/raw bucket counts, T_t/T_r totals, α
  * add-α smoothing.
  *
  * 100 TB shape: the two bucket-count tables are ONE explode +
  * partial-agg groupBy each, output ≤ B config-sized rows; the ratio
  * table (≤ B rows) broadcast-joins back to the per-(doc, bucket)
  * frequencies; the per-doc weight is one groupBy. Nothing data-scale
  * reaches the driver, and the target corpus (small by definition —
  * it's the domain sample you're steering toward) is only ever reduced
  * to its bucket table.
  *
  * Determinism: buckets come from the codegen'd portable fold
  * ([[Dedup.portableFold]]), and the per-doc float sum folds in bucket
  * order (the t10/c02 bit-stable pattern), so weights are hash-exact
  * reproducible and the ds01 gate replays the whole pipeline in DuckDB.
  */
object Dsir {

  /** (id, bucket, tf) hashed unigram+bigram occurrences of `textCol`. */
  private def bucketTf(df: DataFrame, textCol: String, idCol: String,
                       buckets: Int): DataFrame = {
    // project the token array ONCE: inlining the tokensExpr fragment as
    // both concat args re-ran the interpreted regex tokenizer twice per
    // row of the raw corpus — the exact pattern TextAnalysis measured
    // and fixed in its own operators (r14 review)
    df.select(col(idCol).as("id"),
        expr(TextAnalysis.tokensExpr(textCol)).as("__toks"))
      .select(col("id"),
        explode(concat(col("__toks"), TextAnalysis.ngramCol(col("__toks"), 2))).as("__f"))
      .select(col("id"),
        pmod(Dedup.portableFold(col("__f")), lit(buckets.toLong)).cast("int").as("bucket"))
      .groupBy("id", "bucket").agg(count(lit(1)).as("tf"))
  }

  /** Per-bucket feature counts of a corpus — the persistable, mergeable
    * LM form (counts are sums: merge shards by adding).
    */
  def bucketCounts(df: DataFrame, textCol: String, idCol: String,
                   buckets: Int = 10000): DataFrame =
    bucketTf(df, textCol, idCol, buckets)
      .groupBy("bucket").agg(sum("tf").as("cnt"))

  /** Importance weights for every `raw` document: (id, n_feats, weight).
    * Documents with no features get weight 0. `buckets` bounds both LM
    * tables and the broadcast ratio table; `alpha` is add-α smoothing
    * (must be > 0 so unseen-in-target buckets stay finite).
    */
  /** `materialize = true` (default) shares the tokenized raw frame
    * across its three consumers (persist) and returns an eagerly
    * checkpointed result so no cache outlives the call; `false` returns
    * the pure lazy plan — for plan inspection and for composing into a
    * larger DAG that manages its own materialization.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        textCol: String, idCol: String,
                        buckets: Int = 10000, alpha: Double = 1.0,
                        materialize: Boolean = true): DataFrame = {
    require(buckets > 0 && buckets <= (1 << 24),
      s"buckets must be in [1, 2^24], got $buckets")
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val tgt = bucketCounts(target, textCol, idCol, buckets)
    // the (id, bucket, tf) frame feeds the LM-count branch, the rTot
    // action, and the scoring probe — persist so the raw corpus is
    // tokenized ONCE, not three times (the SetJoin shared-frame pattern)
    val rawTf0 = bucketTf(raw, textCol, idCol, buckets)
    val rawTf =
      if (materialize)
        rawTf0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else rawTf0
    // try/finally (r15 persist audit): the loud requires below are
    // user-facing session-survivable errors — the tokenized cache must
    // release on that path too, not only before the success return
    try {
      val rawCnt = rawTf.groupBy("bucket").agg(sum("tf").as("cr"))
      // totals: two config-sized scalars (the bigramLogProb pattern)
      val tTot = tgt.select(coalesce(sum("cnt"), lit(0L))).first().getLong(0)
      val rTot = rawCnt.select(coalesce(sum("cr"), lit(0L))).first().getLong(0)
      require(rTot > 0, "importanceWeights: raw corpus has no tokens")
      require(tTot > 0, "importanceWeights: target corpus has no tokens")
      val b = buckets.toDouble
      // ratio over the raw corpus's observed buckets (a bucket no raw doc
      // hits can never contribute to a raw doc's weight)
      val ratio = rawCnt.join(tgt, Seq("bucket"), "left")
        .select(col("bucket"),
          (log((coalesce(col("cnt"), lit(0L)).cast("double") + alpha) / (tTot + alpha * b))
            - log((col("cr").cast("double") + alpha) / (rTot + alpha * b))).as("lr"))
      val scored = rawTf.join(broadcast(ratio), "bucket")
        .withColumn("__lp", col("tf").cast("double") * col("lr"))
        .groupBy("id")
        .agg(sum("tf").as("n_feats"),
          aggregate(
            sort_array(collect_list(struct(col("bucket"), col("__lp")))),
            lit(0.0), (acc, x) => acc + x.getField("__lp")).as("weight"))
      val lazyOut = raw.select(col(idCol).as("id")).join(scored, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("n_feats"), lit(0L)).as("n_feats"),
          coalesce(col("weight"), lit(0.0)).as("weight"))
      if (!materialize) lazyOut
      // materialize the (one-row-per-raw-doc) result inside the try so
      // the finally drops the tokenized cache only after the checkpoint
      // holds the data (the SetJoin pattern)
      else lazyOut.localCheckpoint(eager = true)
    } finally if (materialize) rawTf.unpersist(blocking = false)
  }

  /** Select `k` raw documents by importance. Default is the
    * deterministic argmax (top-k by weight, doc-id tie-break);
    * `gumbelSeed` switches to DSIR's Gumbel top-k — sampling ∝ exp(w) —
    * with deterministic hash-derived noise, so a retried stage draws
    * the SAME sample (the c03/c07 retry-determinism contract).
    * Selection is a global TakeOrdered of k rows — no full sort lands.
    *
    * Documents with no features are EXCLUDED: their log-ratio is an
    * empty sum (0), which would spuriously outrank every real document
    * whenever the raw corpus scores negative overall — an unscoreable
    * doc is not a top-ranked doc.
    */
  def resample(raw: DataFrame, target: DataFrame, textCol: String, idCol: String,
               k: Int, buckets: Int = 10000, alpha: Double = 1.0,
               gumbelSeed: Option[Long] = None): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = importanceWeights(raw, target, textCol, idCol, buckets, alpha)
      .filter(col("n_feats") > 0)
    val keyed = gumbelSeed match {
      case None => w.withColumn("__key", col("weight"))
      case Some(seed) =>
        // u ∈ (0, 1) from the portable fold of (seed, id) — never exactly
        // 0 or 1, so the double log is finite
        val prime = 1000000007d
        val u = (Dedup.portableFold(concat_ws("§", lit(seed.toString),
          col("id").cast("string"))).cast("double") + 1d) / (prime + 2d)
        w.withColumn("__key", col("weight") - log(-log(u)))
    }
    keyed.orderBy(col("__key").desc, col("id").asc)
      .limit(k)
      .select("id", "n_feats", "weight")
  }
}
