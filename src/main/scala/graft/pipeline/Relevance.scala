package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-relevance scoring for training-data curation: TF-IDF keyterm
  * extraction and BM25 retrieval scoring. Both build on
  * [[TextAnalysis.vocabulary]]'s exact document frequencies.
  *
  * Scale shape: term frequencies are one explode + one map-side-combined
  * groupBy on (id, token); the tf⋈df join is keyed on the token — the
  * vocabulary side is vocabulary-sized (≪ corpus), so AQE turns it into a
  * broadcast join when it fits and a shuffle join keyed by token when it
  * doesn't. No driver-side loops; N and avgdl are single aggregate
  * scalars (two jobs total, independent of corpus size).
  *
  * Determinism: tf, doc_freq, N, dl, avgdl are exact integers (avgdl a
  * single exact-int division); the only float step is ln(), evaluated on
  * identical rationals in any engine — per-query margins to rank
  * boundaries are measured and documented at each SparkEntry use.
  */
object Relevance {

  /** (id, token, tf): exact term frequencies, one row per document-term.
    *
    * r17 opt (guide §2.3): the per-(doc, token) count happens INSIDE the
    * row (TokenTfPairs — one compiled pass over the token array), so the
    * stage carries NO exchange at all; the old explode → groupBy(id,
    * token) shape shuffled every token occurrence of the corpus. Same
    * rows out (order aside — every consumer aggregates or joins).
    */
  def termFrequencies(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        explode(graft.functions.VectorFunctions.tokenTfPairs(
          expr(TextAnalysis.tokensExpr(textCol)))).as("__tt"))
      .select(col("id"), col("__tt.token").as("token"), col("__tt.tf").as("tf"))

  /** Top-k TF-IDF terms per document with a smoothed IDF
    * (ln((N+1)/(df+1)) + 1 — the sklearn formulation: never negative,
    * never divides by zero). Ties in score break to the lexicographically
    * smallest token, so the ranking is deterministic.
    *
    * `minDocFreq` prunes hapax noise BEFORE the join (a vocabulary-sized
    * filter); `k` bounds the per-doc output via one window on id.
    */
  def tfidfTopTerms(df: DataFrame, textCol: String, idCol: String,
                    k: Int, minDocFreq: Long = 1L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val n = df.count()
    val tf = termFrequencies(df, textCol, idCol)
    // doc_freq derives from tf (exactly one row per (id, token)) — a
    // second corpus tokenize+explode via vocabulary() would double the
    // most expensive pass; Catalyst reuses the tf exchange for both
    val dfq = tf.groupBy("token").agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= minDocFreq)
    val scored = tf.join(dfq, "token")
      .withColumn("score",
        col("tf") * (log((lit(n) + lit(1.0)) / (col("doc_freq") + lit(1.0))) + lit(1.0)))
    // bounded-heap rank (score DESC, token ASC — the string tie rides a
    // reversed FIELD, not a negated copy): window-identical output, but
    // the map side reduces to ≤ k terms per doc before any exchange
    val st = struct(col("score"), col("token"), col("tf"), col("doc_freq"))
    val agg = org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.BoundedTopK(
        org.apache.spark.sql.graftbridge.Bridge.expression(st), k,
        reversedFields = Seq(1)).toAggregateExpression())
    scored.groupBy("id").agg(agg.as("__tk"))
      .select(col("id"), posexplode(col("__tk")).as(Seq("__pos", "__e")))
      .select(col("id"), (col("__pos") + 1).cast("int").as("rk"),
        col("__e.token").as("token"), col("__e.tf").as("tf"),
        col("__e.doc_freq").as("doc_freq"), col("__e.score").as("score"))
  }

  /** Shared BM25 scorer over a (query_id, token) term frame: Robertson/
    * Sparck-Jones idf = ln(1 + (N − df + 0.5)/(df + 0.5)) with the usual
    * k1/b length normalization; `dl` is the whitespace token count and
    * `avgdl` the corpus mean. ONE implementation serves the single-query
    * API and the batch retrieval path so the scoring math (and the c02/
    * c06 oracles that mirror it) cannot desynchronize.
    *
    * Scale shape: one corpus tokenize pass, semi-joined down to tokens
    * any query uses (query-term frames are tiny — the broadcast prunes
    * the explode before the tf aggregate); per-term doc_freq derives from
    * those same rows. Per-(query, doc) totals fold term scores IN TOKEN
    * ORDER: float addition isn't associative, so an engine-parallel sum()
    * would be run- and engine-dependent in the last bits; the ordered
    * fold over the few-element collected list is bit-stable.
    */
  private def bm25Scores(df: DataFrame, textCol: String, idCol: String,
                         qTerms: DataFrame, k1: Double, b: Double): DataFrame = {
    // the "one corpus tokenize pass" in the scaladoc is made literal
    // here: the (id, tokens) projection is materialized ONCE and the
    // totals job, the dl frame, and the tf explode all read it — the
    // previous shape re-ran the interpreted regex tokenizer over the
    // full corpus three times per call (r14 review). The checkpoint is
    // ~token-array-sized (MEMORY_AND_DISK, spills); its blocks release
    // when the caller drops the returned frame.
    val tokd = df.select(col(idCol).as("id"),
        expr(TextAnalysis.tokensExpr(textCol)).as("__toks"))
      .localCheckpoint(eager = true)
    val head = tokd
      .select(count(lit(1)),
        coalesce(sum(TextAnalysis.tokenCountOf("__toks")), lit(0L)))
      .first()
    val n = head.getLong(0); val totTok = head.getLong(1)
    val avgdl = totTok.toDouble / n
    val dl = tokd.select(col("id"), TextAnalysis.tokenCountOf("__toks").as("dl"))
    val tf = tokd
      .select(col("id"), explode(col("__toks")).as("token"))
      .join(broadcast(qTerms.select("token").distinct()), Seq("token"), "left_semi")
      .groupBy("id", "token").agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("token").agg(count(lit(1)).as("doc_freq"))
    val idf = log(lit(1.0) +
      (lit(n.toDouble) - col("doc_freq") + lit(0.5)) / (col("doc_freq") + lit(0.5)))
    tf.join(dfq, "token")
      .join(dl, "id")
      .join(broadcast(qTerms), "token") // fan out per query AFTER scoring inputs are doc-sized
      .withColumn("__term_score",
        idf * (col("tf") * (lit(k1) + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl))))
      .groupBy("query_id", "id")
      .agg(
        // r17 opt: compiled ordered fold (see SortedStructSum) — same
        // token-order bit-stable sum, no interpreted HOF chain
        graft.functions.VectorFunctions.orderedStructSum(
          collect_list(struct(col("token"), col("__term_score")))).as("bm25"),
        count(lit(1)).as("terms_hit"))
  }

  /** BM25 scores of every document containing at least one query term —
    * the single-query primitive; delegates to [[bm25Scores]] (see there
    * for semantics and the determinism contract).
    */
  def bm25(df: DataFrame, textCol: String, idCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    // normalize terms through the SAME pipeline as corpus tokens
    // (lowercased whitespace tokens): a capitalized or multi-word term
    // would otherwise match nothing silently, and the batch path
    // (bm25Retrieve, which tokenizes query TEXT with tokensExpr) would
    // disagree with this API on identical queries (r14 review)
    val norm = queryTerms.flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
    require(norm.nonEmpty, "bm25: query terms are empty after tokenization")
    val spark = df.sparkSession
    import spark.implicits._
    val qTerms = norm.distinct.map(t => (0L, t)).toDF("query_id", "token")
    bm25Scores(df, textCol, idCol, qTerms, k1, b).drop("query_id")
  }

  /** Batch BM25 retrieval: top-k documents PER QUERY for a whole query
    * table — the RAG/eval-harness shape, where [[bm25]] is the one-query
    * primitive. Query terms are the distinct whitespace tokens of
    * `queryTextCol` (set semantics, the standard short-query treatment).
    * Corpus text is touched exactly once regardless of query count —
    * running [[bm25]] per query would scan it |queries| times.
    */
  def bm25Retrieve(df: DataFrame, textCol: String, idCol: String,
                   queries: DataFrame, queryIdCol: String, queryTextCol: String,
                   k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val qTerms = queries.select(col(queryIdCol).as("query_id"),
      explode(array_distinct(expr(TextAnalysis.tokensExpr(queryTextCol)))).as("token"))
    val scored = bm25Scores(df, textCol, idCol, qTerms, k1, b)
    graft.operators.Views.topKWithRank(scored, "query_id", "bm25", "id", k,
      extraCols = Seq("terms_hit"))
  }

  /** Token-set Jaccard retrieval: top-k docs per query by
    * |Q ∩ D| / |Q ∪ D| over DISTINCT whitespace tokens — the cheap
    * lexical-overlap retriever that complements BM25's tf/length
    * weighting in a hybrid stack. Batch shape like [[bm25Retrieve]]:
    * the corpus is tokenized once for all queries; candidates are docs
    * sharing ≥ 1 query token (the inverted-index join), so the
    * per-query bounded-heap top-k ranks candidate-sized frames, never the corpus.
    * Jaccard is a ratio of exact integers evaluated as one double
    * division — identical in any engine; ties break by id.
    */
  def jaccardRetrieve(df: DataFrame, textCol: String, idCol: String,
                      queries: DataFrame, queryIdCol: String,
                      queryTextCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val qTerms = queries.select(col(queryIdCol).as("query_id"),
      explode(array_distinct(expr(TextAnalysis.tokensExpr(queryTextCol)))).as("token"))
    val qSize = qTerms.groupBy("query_id").agg(count(lit(1)).as("qn"))
    val dTerms = df.select(col(idCol).as("id"),
      explode(array_distinct(expr(TextAnalysis.tokensExpr(textCol)))).as("token"))
    val dSize = dTerms.groupBy("id").agg(count(lit(1)).as("dn"))
    val inter = qTerms.join(dTerms, "token")
      .groupBy("query_id", "id").agg(count(lit(1)).as("inter"))
    val scored = inter.join(broadcast(qSize), "query_id").join(dSize, "id")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("qn") + col("dn") - col("inter")))
    graft.operators.Views.topKWithRank(scored, "query_id", "jaccard", "id", k,
      extraCols = Seq("inter"))
  }

  /** Reciprocal-rank fusion of N retriever rankings — the standard
    * hybrid-search combiner (Cormack et al.): per (query, doc),
    * score = Σᵢ 1 / (c + rkᵢ) over the rankings the doc appears in.
    * The sum folds in RANKING-LIST ORDER as one fixed expression tree,
    * so the float result is bit-stable across engines. Inputs are
    * (query_id, id, rk) frames — per-query top-k tables (queries × k
    * rows, config-sized): fusion is glue; the heavy lifting stays in
    * the retrievers. Output: top-k per query by (rrf DESC, id), with
    * the fused rank.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: need at least one ranking")
    require(k > 0, s"k must be positive, got $k")
    require(c >= 0, s"c must be non-negative, got $c")
    val parts = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col("query_id"), col("id"), col("rk").cast("long").as(s"__rk$i"))
    }
    val joined = parts.reduce((a, b) => a.join(b, Seq("query_id", "id"), "full"))
    val score = parts.indices
      .map(i => coalesce(lit(1.0) / (lit(c.toDouble) + col(s"__rk$i")), lit(0.0)))
      .reduce(_ + _)
    val w = Window.partitionBy("query_id").orderBy(col("rrf").desc, col("id"))
    joined.withColumn("rrf", score)
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("query_id", "id", "rrf", "rk")
  }
}
