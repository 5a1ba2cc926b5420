package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join (AllPairs/PPJoin-style prefix
  * filtering) — every unordered pair of documents whose token-set
  * Jaccard is ≥ the threshold, with NO false negatives (contrast
  * `Dedup.minhashDedup`, whose banded LSH trades recall for speed; this
  * operator is the ground-truth join the sketch is tuned against).
  *
  * Prefix-filter principle: order every set by one GLOBAL token order
  * (rarest-first, ties lexicographic). If J(a, b) ≥ t then
  * |a∩b| ≥ ⌈t·|a|⌉, and any ⌈t·|a|⌉ elements of `a` must hit the first
  * |a| − ⌈t·|a|⌉ + 1 of them — so the PREFIXES of a and b share a
  * token, and an inverted index on prefix tokens alone finds every
  * qualifying pair. Rare-first ordering makes those prefixes the
  * LOW-frequency tokens, keeping index postings short.
  *
  * Scale shape: explode to (id, token) once; the global order comes
  * from one token-frequency aggregate (O(vocab)); candidates are a
  * self-join ON PREFIX TOKENS ONLY (shuffle O(Σ prefix lengths), never
  * the full postings), with the cheap length filter
  * t·|a| ≤ |b| ≤ |a|/t applied inside the join; exact verification
  * joins the token-set arrays back by id — O(candidates), each checked
  * with a codegen'd array_intersect.
  */
object SetJoin {

  /** Slack on the candidate-filter bounds: ⌈t·n⌉ / ⌊n/t⌋ evaluated in
    * IEEE doubles can land one past the exact integer (e.g. 0.55 × 100
    * = 55.000000000000007 → ceil 56, wrongly excluding a valid pair).
    * The filters are conservative PRE-checks — verification is exact —
    * so each bound is slackened by ε before rounding: a too-long prefix
    * or a too-wide length window only admits extra candidates, never
    * drops a qualifying pair. ε = 1e-6 absolute covers the double
    * rounding error of t·n for n up to ~10⁹ with 10³ margin.
    */
  private val eps = 1e-6
  private def ceilSlack(x: Column): Column = ceil(x - lit(eps))
  private def floorSlack(x: Column): Column = floor(x + lit(eps))

  /** (id, s, n): distinct token set + size per doc, empty sets dropped. */
  private def tokenSets(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        array_distinct(expr(TextAnalysis.tokensExpr(textCol))).as("s"))
      .withColumn("n", size(col("s")))
      .filter(col("n") > 0)

  /** Candidate pairs from an already-built (id, s, n) sets frame — the
    * corpus is tokenized ONCE by the caller and shared across the
    * frequency, prefix, and verification branches of the DAG.
    */
  private def candidatesFromSets(sets: DataFrame, threshold: Double): DataFrame = {
    val tk = sets.select(col("id"), col("n"), explode(col("s")).as("token"))
    val freq = tk.groupBy("token").agg(count(lit(1)).as("tf"))
    val prefix = tk.join(freq, "token")
      .withColumn("rn", row_number().over(
        Window.partitionBy("id").orderBy(col("tf"), col("token"))))
      .filter(col("rn") <= col("n") - ceilSlack(lit(threshold) * col("n")) + 1)
      .select("id", "n", "token")
    prefix.as("a").join(prefix.as("b"),
        col("a.token") === col("b.token") && col("a.id") < col("b.id") &&
          col("b.n") >= ceilSlack(lit(threshold) * col("a.n")) &&
          col("b.n") <= floorSlack(col("a.n") / lit(threshold)))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** The candidate-pair frame [[exactJaccardJoin]] verifies — exposed so
    * instrumentation can report the prefix filter's pruning power
    * (candidates vs n²/2) the same way `Similarity.lshCandidates` does.
    */
  def candidates(df: DataFrame, textCol: String, idCol: String,
                 threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold in (0,1], got $threshold")
    candidatesFromSets(tokenSets(df, textCol, idCol), threshold)
  }

  /** All pairs (id_a < id_b, jaccard ≥ threshold) over the DISTINCT
    * whitespace-token sets of `textCol`. Output: (id_a, id_b, jaccard).
    */
  def exactJaccardJoin(df: DataFrame, textCol: String, idCol: String,
                       threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold in (0,1], got $threshold")
    // tokenize once; the sets frame feeds the candidate branches AND both
    // verification sides, so the regex-split scan runs a single time
    val sets = tokenSets(df, textCol, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sa = sets.select(col("id").as("id_a"), col("s").as("sa"), col("n").as("na"))
    val sb = sets.select(col("id").as("id_b"), col("s").as("sb"), col("n").as("nb"))
    val out = candidatesFromSets(sets, threshold)
      .join(sa, "id_a").join(sb, "id_b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("double"))
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
      // materialize the (result-sized) pair frame so the corpus-sized
      // sets cache can be dropped before returning — no cache outlives
      // the call beyond the result itself
      .localCheckpoint(eager = true)
    sets.unpersist(blocking = false)
    out
  }
}
