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

  /** (id, token, tf): exact term frequencies, one row per document-term. */
  def termFrequencies(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        explode(expr(TextAnalysis.tokensExpr(textCol))).as("token"))
      .groupBy("id", "token").agg(count(lit(1)).as("tf"))

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
    val w = Window.partitionBy("id").orderBy(col("score").desc, col("token"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("id"), col("rk"), col("token"), col("tf"), col("doc_freq"), col("score"))
  }

  /** BM25 scores of every document containing at least one query term.
    * Standard Robertson/Sparck-Jones idf = ln(1 + (N − df + 0.5)/(df + 0.5))
    * with the usual k1/b length normalization; `dl` is the whitespace
    * token count and `avgdl` the corpus mean.
    *
    * The query-term seq is tiny and becomes an `isin` filter pushed into
    * the tf aggregation — the corpus pass only materializes matching
    * (id, token) rows. Per-term doc_freq is derived from those same rows
    * (a second tiny aggregate), so no full vocabulary pass is needed.
    */
  def bm25(df: DataFrame, textCol: String, idCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val head = df
      .select(count(lit(1)), coalesce(sum(TextAnalysis.tokenCount(textCol)), lit(0L)))
      .first()
    val n = head.getLong(0); val totTok = head.getLong(1)
    val avgdl = totTok.toDouble / n
    val dl = df.select(col(idCol).as("id"),
      TextAnalysis.tokenCount(textCol).as("dl"))
    val tf = termFrequencies(df, textCol, idCol)
      .filter(col("token").isin(queryTerms: _*))
    val dfq = tf.groupBy("token").agg(count(lit(1)).as("doc_freq"))
    val idf = log(lit(1.0) +
      (lit(n.toDouble) - col("doc_freq") + lit(0.5)) / (col("doc_freq") + lit(0.5)))
    // per-doc total folds the term scores IN TOKEN ORDER: float addition
    // isn't associative, so an engine-parallel sum() would be run- and
    // engine-dependent in the last bits; the ordered fold is bit-stable
    // (queryTerms is small, so the collected list is too)
    tf.join(dfq, "token")
      .join(dl, "id")
      .withColumn("__term_score",
        idf * (col("tf") * (lit(k1) + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl))))
      .groupBy("id")
      .agg(
        aggregate(
          sort_array(collect_list(struct(col("token"), col("__term_score")))),
          lit(0.0), (acc, x) => acc + x.getField("__term_score")).as("bm25"),
        count(lit(1)).as("terms_hit"))
  }

  /** Batch BM25 retrieval: top-k documents PER QUERY for a whole query
    * table — the RAG/eval-harness shape, where [[bm25]] is the one-query
    * primitive. Query terms are the distinct whitespace tokens of
    * `queryTextCol` (set semantics, the standard short-query treatment).
    *
    * Scale shape: ONE corpus tokenize pass, semi-joined down to tokens
    * any query uses (query tables are ≪ corpus — the broadcast prunes
    * the explode before the tf aggregate); doc_freq per term derives from
    * those same rows; per-(query, doc) scores fold in token order (the
    * bit-stable sum [[bm25]] uses); one window takes k per query. Corpus
    * text is touched exactly once regardless of query count — running
    * [[bm25]] per query would scan it |queries| times.
    */
  def bm25Retrieve(df: DataFrame, textCol: String, idCol: String,
                   queries: DataFrame, queryIdCol: String, queryTextCol: String,
                   k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val head = df
      .select(count(lit(1)), coalesce(sum(TextAnalysis.tokenCount(textCol)), lit(0L)))
      .first()
    val n = head.getLong(0); val totTok = head.getLong(1)
    val avgdl = totTok.toDouble / n
    val dl = df.select(col(idCol).as("id"),
      TextAnalysis.tokenCount(textCol).as("dl"))
    val qTerms = queries.select(col(queryIdCol).as("query_id"),
        explode(array_distinct(expr(TextAnalysis.tokensExpr(queryTextCol)))).as("token"))
    val tf = df
      .select(col(idCol).as("id"),
        explode(expr(TextAnalysis.tokensExpr(textCol))).as("token"))
      .join(broadcast(qTerms.select("token").distinct()), Seq("token"), "left_semi")
      .groupBy("id", "token").agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("token").agg(count(lit(1)).as("doc_freq"))
    val idf = log(lit(1.0) +
      (lit(n.toDouble) - col("doc_freq") + lit(0.5)) / (col("doc_freq") + lit(0.5)))
    val scored = tf.join(dfq, "token")
      .join(dl, "id")
      .join(broadcast(qTerms), "token") // fan out per query AFTER scoring inputs are doc-sized
      .withColumn("__term_score",
        idf * (col("tf") * (lit(k1) + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl))))
      .groupBy("query_id", "id")
      .agg(
        aggregate(
          sort_array(collect_list(struct(col("token"), col("__term_score")))),
          lit(0.0), (acc, x) => acc + x.getField("__term_score")).as("bm25"),
        count(lit(1)).as("terms_hit"))
    val w = Window.partitionBy("query_id").orderBy(col("bm25").desc, col("id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("query_id", "id", "bm25", "terms_hit", "rk")
  }
}
