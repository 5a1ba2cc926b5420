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
    try { // release the corpus cache even when a mid-chain job throws (r14 review)
    val sa = sets.select(col("id").as("id_a"), col("s").as("sa"), col("n").as("na"))
    val sb = sets.select(col("id").as("id_b"), col("s").as("sb"), col("n").as("nb"))
    val out = candidatesFromSets(sets, threshold)
      .join(sa, "id_a").join(sb, "id_b")
      // r17 opt: native intersection count — no intersection array built
      .withColumn("inter",
        graft.functions.VectorFunctions.intersectSize(col("sa"), col("sb"))
          .cast("double"))
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
      // materialize the (result-sized) pair frame so the corpus-sized
      // sets cache can be dropped before returning — no cache outlives
      // the call beyond the result itself
      .localCheckpoint(eager = true)
    out
    } finally sets.unpersist(blocking = false)
  }

  /** EXACT edit-distance self-join: every unordered pair of rows whose
    * `strCol` values are within Levenshtein distance `maxDist`, with NO
    * false negatives. The entity-resolution sibling of
    * [[exactJaccardJoin]] — string identity instead of token sets.
    *
    * STRATEGY — two candidate generators, chosen by k:
    *
    * k ≤ 2 → DELETION NEIGHBORHOODS (FastSS): each string explodes to
    * every variant reachable by ≤ k character deletions (k=1: len+1
    * variants; k=2: O(len²)); candidates are pairs sharing a variant.
    * Complete: an alignment with ≤ k edits leaves a common subsequence
    * reachable from BOTH strings by ≤ k deletions, so true pairs always
    * collide. Variants are near-full strings, so this is robust to the
    * corpora that defeat substring signatures — zero-padded identifiers
    * whose only discriminative content is a few tail characters
    * (measured in SCALE.md: the q-gram filter drains such corpora into
    * its quadratic fallback pool; deletion postings stay true-pair
    * sized). Cost: the variant explode shuffles ~len^k × corpus rows —
    * proportional, not quadratic.
    *
    * k ≥ 3 → PARTITION FILTER (r18; PassJoin pigeonhole — Li, Deng,
    * Feng, public knowledge; kernels in
    * [[graft.functions.EditDistanceExpressions]]): split the shorter
    * string of a pair into k+1 contiguous segments — ≤ k edits cannot
    * touch all of them, so one segment appears EXACTLY in the longer
    * string within ±k of its home position. Candidates are the pairs
    * hit by one equi-join of every string's own segments against every
    * string's candidate-segment substrings (O(k³) short slices per
    * string, generated in-row); strings shorter than k+1 code points
    * (zero-length segments would match everywhere) pair only with
    * lengths ≤ 2k via a bounded all-pairs pool. Complete at every
    * step; no count bound, no gram-frequency pass, and — unlike the
    * r17 positional q-gram count filter whose Σ gf² gram-collision
    * join dominated j04 — the candidate join's output is
    * near-true-pair-sized, and segment keys stay discriminative even
    * on constant-region corpora ("Customer#000…": the varying tail
    * still lands in its own segments).
    *
    * Survivors verify with codegen'd `levenshtein`. Output:
    * (id_a, id_b, dist), id_a < id_b, dist ≤ k.
    *
    * `q` / `stopGramFraction` parameterize the q-gram machinery that
    * [[editDistanceLookup]]'s k ≥ 3 path still runs; the self-join's
    * partition filter needs no tuning and ignores them.
    */
  def editDistanceJoin(df: DataFrame, strCol: String, idCol: String,
                       maxDist: Int, q: Int = 2,
                       stopGramFraction: Double = 0.05): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(q >= 1, s"q must be >= 1, got $q")
    require(stopGramFraction > 0 && stopGramFraction <= 1,
      s"stopGramFraction in (0,1], got $stopGramFraction")
    val k = maxDist
    val strs = df.select(col(idCol).as("id"), col(strCol).cast("string").as("str"))
      .filter(col("str").isNotNull)
      .withColumn("len", length(col("str")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // try/finally (r14 review): gramStats' count and the eager result
    // checkpoint are jobs — a failure in either must still release the
    // corpus-sized cache (the Dedup.scala persist discipline)
    try {
    if (k <= 2) return deletionJoin(strs, k)
    // r18: PARTITION FILTER (PassJoin pigeonhole — see
    // functions/EditDistanceExpressions) replaces the positional q-gram
    // count filter. The q-gram shape paid Σ_gram gf² joined rows (16 M
    // on j04's sf0.1 corpus) into a pair-count aggregate plus two stats
    // joins; segments are (k+1)-fraction-of-the-string exact keys, so
    // the candidate join's output is near-true-pair-sized and there is
    // no count bound, no stop-gram accounting, and no frequency pass.
    // Candidates: some segment of the SHORTER string appears exactly in
    // the longer within ±k of its home position — the equi-join below
    // on (shorter-len, segment-index, content). Strings shorter than
    // k+1 code points own zero-length segments; they pair only with
    // lengths ≤ 2k (ed ≥ |len diff|), a bounded all-pairs pool.
    // (q/stopGramFraction only parameterize the k ≤ 2-era gram filter,
    // which editDistanceLookup still runs; they are unused here.)
    val m = k + 1
    val eligible = strs.filter(col("len") >= m)
    val segs = eligible
      .select(col("id").as("id_s"),
        explode(graft.functions.VectorFunctions.edSegments(col("str"), k)).as("sg"),
        col("len").as("l"))
      .select(col("id_s"), col("l"), col("sg.i").as("i"), col("sg.g").as("g"))
    val probes = eligible
      .select(col("id").as("id_t"),
        explode(graft.functions.VectorFunctions.edSegmentProbes(col("str"), k)).as("pb"))
      .select(col("id_t"), col("pb.l").as("l"), col("pb.i").as("i"),
        col("pb.g").as("g"))
    val mainCands = probes.join(segs, Seq("l", "i", "g"))
      .filter(col("id_s") =!= col("id_t"))
      .select(
        when(col("id_s") < col("id_t"), col("id_s")).otherwise(col("id_t")).as("id_a"),
        when(col("id_s") < col("id_t"), col("id_t")).otherwise(col("id_s")).as("id_b"))
    val shortPool = strs.filter(col("len") <= k).select(col("id"), col("len"))
    val poolCands = shortPool.as("pa")
      .join(strs.filter(col("len") <= 2 * k).select(col("id"), col("len")).as("pb"),
        col("pa.id") =!= col("pb.id") &&
          abs(col("pa.len") - col("pb.len")) <= k)
      .select(
        when(col("pa.id") < col("pb.id"), col("pa.id")).otherwise(col("pb.id")).as("id_a"),
        when(col("pa.id") < col("pb.id"), col("pb.id")).otherwise(col("pa.id")).as("id_b"))
    val va = strs.select(col("id").as("id_a"), col("str").as("stra"))
    val vb = strs.select(col("id").as("id_b"), col("str").as("strb"))
    val out = mainCands.unionAll(poolCands).distinct()
      .join(va, "id_a").join(vb, "id_b")
      // r17 opt: THRESHOLDED levenshtein — banded O(len·k) DP with early
      // exit instead of the full O(len²) matrix; returns −1 past the
      // threshold, so `between 0 and k` keeps exactly the `<= k` rows
      // with their exact distances
      .withColumn("dist", levenshtein(col("stra"), col("strb"), k))
      .filter(col("dist").between(0, k))
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
      .localCheckpoint(eager = true)
    out
    } finally strs.unpersist(blocking = false)
  }

  /** The q-gram path's gram accounting, shared by [[editDistanceJoin]]
    * and [[qgramPoolStats]]: positional q-grams minus the stop grams
    * (present in more than max(16, stopGramFraction·n) strings), plus
    * per-string totals (n grams, r rare, d dropped). `strs` must carry
    * (id, str, len).
    */
  private def gramStats(strs: DataFrame, q: Int, stopGramFraction: Double)
      : (DataFrame, DataFrame) = {
    val nStrings = strs.count()
    val stopF = math.max(16.0, stopGramFraction * nStrings)
    val grams = posGrams(strs, q)
    val freq = grams.groupBy("gram")
      .agg(count_distinct(col("id")).as("gf"))
    classifyGrams(strs, grams, freq, stopF, q)
  }

  /** Positional q-grams of a prepped (id, str, len) frame:
    * (id, len, pos, gram); a string has len − q + 1 grams (0 when short).
    */
  private def posGrams(strs: DataFrame, q: Int): DataFrame =
    strs.select(col("id"), col("len"),
      posexplode(expr(s"transform(sequence(1, greatest(len - ${q - 1}, 0)), " +
        s"i -> substring(str, i, $q))")).as(Seq("pos", "gram")))

  /** Split `grams` into the rare subset (per the `gf ≤ stopF` rule
    * against the provided frequency table — classification is a pure
    * function of the gram STRING, so any freq table keeps the count
    * bound's completeness) and the per-string accounting (n, r, d).
    */
  private def classifyGrams(strs: DataFrame, grams: DataFrame, freq: DataFrame,
                            stopF: Double, q: Int): (DataFrame, DataFrame) = {
    val rare = grams.join(freq.filter(col("gf") <= stopF), "gram")
      .select("id", "len", "pos", "gram")
    val stats = strs.select(col("id"),
        greatest(col("len") - (q - 1), lit(0)).as("n"))
      .join(rare.groupBy("id").agg(count(lit(1)).as("r")), Seq("id"), "left")
      .withColumn("r", coalesce(col("r"), lit(0L)))
      .withColumn("d", col("n") - col("r"))
    (rare, stats)
  }

  /** EXACT edit-distance LOOKUP join (two tables): every (left, right)
    * pair within Levenshtein distance `maxDist` — the batch-vs-canonical
    * entity-resolution shape (match today's ingest against the reference
    * table) that [[editDistanceJoin]]'s self-join form only reaches via
    * a wasteful union. Same two candidate strategies, same conservative-
    * at-every-step guarantee (NO false negatives):
    *
    *   - k ≤ 2: FastSS deletion neighborhoods on BOTH sides; candidates
    *     are cross-side variant collisions (the common-subsequence
    *     completeness argument is side-agnostic).
    *   - k ≥ 3: the positional q-gram count filter. Gram stop/rare
    *     classification comes from the UNION frequency (a gram frequent
    *     in either corpus would explode the join) — classification is a
    *     pure function of the gram string, so the per-pair bound holds
    *     verbatim: shared stop matches ≤ min(dL, dR), and a
    *     requirement-≤-0 pair forces BOTH strings under q·k rare grams
    *     (the editDistanceJoin scaladoc proof with sides substituted),
    *     so the quadratic fallback pool is poolL × poolR only.
    *
    * Output: (id_l, id_r, dist), dist ≤ maxDist.
    */
  def editDistanceLookup(left: DataFrame, leftStr: String, leftId: String,
                         right: DataFrame, rightStr: String, rightId: String,
                         maxDist: Int, q: Int = 2,
                         stopGramFraction: Double = 0.05,
                         materialize: Boolean = true): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(q >= 1, s"q must be >= 1, got $q")
    require(stopGramFraction > 0 && stopGramFraction <= 1,
      s"stopGramFraction in (0,1], got $stopGramFraction")
    val k = maxDist
    // materialize=false returns the LAZY plan (for plan pins) — it must
    // not persist: the prep frames are private locals, so a caller could
    // never release them (r14 review; the Dsir.importanceWeights rule).
    // The lazy mode re-executes prep per consumer, which is the point.
    def prep(df: DataFrame, s: String, i: String) = {
      val base = df.select(col(i).as("id"), col(s).cast("string").as("str"))
        .filter(col("str").isNotNull)
        .withColumn("len", length(col("str")))
      if (materialize) base.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else base
    }
    val ls = prep(left, leftStr, leftId)
    val rs = prep(right, rightStr, rightId)
    val cands =
      if (k <= 2) {
        val lv = ls.select(col("id").as("id_l"), col("len").as("ll"),
          explode(expr(variantsExpr(k))).as("vl"))
        val rv = rs.select(col("id").as("id_r"), col("len").as("lr"),
          explode(expr(variantsExpr(k))).as("vr"))
        lv.join(rv, col("vl") === col("vr") && abs(col("ll") - col("lr")) <= k)
          .select("id_l", "id_r").distinct()
      } else {
        val gl = posGrams(ls, q)
        val gr = posGrams(rs, q)
        // union doc-frequency: per-side distinct-string counts summed
        val freq = gl.select("gram", "id").distinct()
          .groupBy("gram").agg(count(lit(1)).as("gfl"))
          .join(gr.select("gram", "id").distinct()
            .groupBy("gram").agg(count(lit(1)).as("gfr")), Seq("gram"), "full")
          .select(col("gram"), (coalesce(col("gfl"), lit(0L))
            + coalesce(col("gfr"), lit(0L))).as("gf"))
        val stopF = math.max(16.0, stopGramFraction * (ls.count() + rs.count()))
        val (rareL, statsL) = classifyGrams(ls, gl, freq, stopF, q)
        val (rareR, statsR) = classifyGrams(rs, gr, freq, stopF, q)
        val ra = rareL.select(col("id").as("id_l"), col("len").as("ll"),
          col("pos").as("pl"), col("gram").as("gl"))
        val rb = rareR.select(col("id").as("id_r"), col("len").as("lr"),
          col("pos").as("pr"), col("gram").as("gr"))
        val joined = ra.join(rb,
            col("gl") === col("gr") && abs(col("ll") - col("lr")) <= k &&
              abs(col("pl") - col("pr")) <= k)
          .groupBy("id_l", "id_r").agg(count(lit(1)).as("matches"))
        val sa = statsL.select(col("id").as("id_l"), col("n").as("nl"),
          col("d").as("dl"))
        val sb = statsR.select(col("id").as("id_r"), col("n").as("nr"),
          col("d").as("dr"))
        val gramCands = joined.join(sa, "id_l").join(sb, "id_r")
          .filter(col("matches") >= greatest(
            greatest(col("nl"), col("nr")) - (q * k) - least(col("dl"), col("dr")),
            lit(1L)))
          .select("id_l", "id_r")
        val poolL = statsL.filter(col("r") <= q * k)
          .join(ls.select(col("id"), col("len")), "id")
          .select(col("id").as("id_l"), col("len").as("ll"))
        val poolR = statsR.filter(col("r") <= q * k)
          .join(rs.select(col("id"), col("len")), "id")
          .select(col("id").as("id_r"), col("len").as("lr"))
        val poolCands = poolL.join(poolR, abs(col("ll") - col("lr")) <= k)
          .select("id_l", "id_r")
        gramCands.unionAll(poolCands).distinct()
      }
    val vl = ls.select(col("id").as("id_l"), col("str").as("strl"))
    val vr = rs.select(col("id").as("id_r"), col("str").as("strr"))
    val joinedOut = cands
      .join(vl, "id_l").join(vr, "id_r")
      // r17 opt: thresholded levenshtein (see editDistanceJoin)
      .withColumn("dist", levenshtein(col("strl"), col("strr"), k))
      .filter(col("dist").between(0, k))
      .select(col("id_l"), col("id_r"), col("dist").cast("long").as("dist"))
    // materialize=false keeps the lazy DAG inspectable for plan pins
    // (eager localCheckpoint would hide it); nothing was persisted in
    // that mode, so there is nothing to leak
    if (!materialize) return joinedOut
    try joinedOut.localCheckpoint(eager = true)
    finally { ls.unpersist(blocking = false); rs.unpersist(blocking = false) }
  }

  /** Filter-health diagnostic for the k ≥ 3 q-gram path: how much of the
    * corpus drains into the quadratic all-pairs fallback pool (strings
    * with ≤ q·k rare grams). Returns (poolSize, totalStrings) — a pool
    * fraction near 1 means the corpus shape defeats the count filter
    * (the SCALE.md j03 negative result) and the join will go quadratic;
    * near 0 means the filter carries the corpus. Costs one gram-count
    * pass, no candidate join.
    */
  def qgramPoolStats(df: DataFrame, strCol: String, idCol: String,
                     maxDist: Int, q: Int = 2,
                     stopGramFraction: Double = 0.05): (Long, Long) = {
    val strs = df.select(col(idCol).as("id"), col(strCol).cast("string").as("str"))
      .filter(col("str").isNotNull)
      .withColumn("len", length(col("str")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // finally (r15 persist audit): release even when a count job throws
    try {
      val (_, stats) = gramStats(strs, q, stopGramFraction)
      val pool = stats.filter(col("r") <= q * maxDist).count()
      val total = strs.count()
      (pool, total)
    } finally strs.unpersist(blocking = false)
  }

  /** `concat(prefix before i, suffix after i)` — delete char `i` (1-based). */
  private def delAt(s: String, i: String): String =
    s"concat(substring($s, 1, $i - 1), substring($s, $i + 1, 1000000000))"

  /** All single-deletion variants of `s` (empty array for the empty
    * string — Spark's `sequence(1, 0)` DESCENDS, so the guard is load-
    * bearing).
    */
  private def d1(s: String, v: String): String =
    s"""(CASE WHEN length($s) = 0 THEN cast(array() AS array<string>)
       | ELSE transform(sequence(1, length($s)), $v -> ${delAt(s, v)}) END)""".stripMargin

  /** FastSS variant set of the prepped `str` column: the string plus
    * every variant reachable by ≤ k character deletions.
    */
  private def variantsExpr(k: Int): String = k match {
    case 1 => s"array_distinct(concat(array(str), ${d1("str", "i")}))"
    case 2 => s"""array_distinct(concat(array(str), ${d1("str", "i")},
                 |  flatten(transform(${d1("str", "i")},
                 |    s1 -> ${d1("s1", "j")}))))""".stripMargin
    case other => throw new IllegalArgumentException(
      s"deletion variants support k <= 2, got $other")
  }

  /** FastSS candidate generation + exact verify for k ≤ 2. */
  private def deletionJoin(strs: DataFrame, k: Int): DataFrame = {
    val exploded = strs
      .select(col("id"), col("len"), explode(expr(variantsExpr(k))).as("v"))
    val ea = exploded.select(col("id").as("id_a"), col("len").as("la"), col("v").as("va"))
    val eb = exploded.select(col("id").as("id_b"), col("len").as("lb"), col("v").as("vb"))
    val va = strs.select(col("id").as("id_a"), col("str").as("stra"))
    val vb = strs.select(col("id").as("id_b"), col("str").as("strb"))
    // finally: the prep cache releases whether the checkpoint lands or
    // the join throws (r15 persist audit)
    try ea.join(eb,
        col("va") === col("vb") && col("id_a") < col("id_b") &&
          abs(col("la") - col("lb")) <= k)
      .select("id_a", "id_b").distinct()
      .join(va, "id_a").join(vb, "id_b")
      // r17 opt: thresholded levenshtein (see editDistanceJoin)
      .withColumn("dist", levenshtein(col("stra"), col("strb"), k))
      .filter(col("dist").between(0, k))
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
      .localCheckpoint(eager = true)
    finally strs.unpersist(blocking = false)
  }

  /** Sorted-neighborhood record linkage (Hernández–Stolfo SNM): rank
    * all records by the blocking key (total order — ties broken by id),
    * compare each record only against its `window − 1` rank successors,
    * verify with codegen'd Levenshtein ≤ `maxDist`. Output
    * (id_a, id_b, dist) with id_a < id_b.
    *
    * This is a BLOCKING HEURISTIC, not a complete join: recall is bound
    * by sort locality (a true match whose keys sort > window ranks apart
    * is missed — use [[editDistanceJoin]] when completeness matters; the
    * j09 gate's oracle replays the window semantics exactly, and on the
    * zero-padded name corpus SNM's output is a strict subset of j03's
    * complete join). Why it earns its place at 100 TB anyway: candidate volume
    * is EXACTLY n·(window−1) regardless of key distribution — the
    * skew-proof budget no similarity filter can promise — and multi-pass
    * SNM over different key orderings is the standard ER recall repair.
    *
    * Scale shape: one distributed range-sort + zipWithIndex for the
    * global rank (the rankVocabulary pattern — no single-task window),
    * then each row lands in TWO (window−1)-sized rank buckets and
    * candidates are one equi-join on the bucket id — |r1 − r2| ≤
    * window − 1 ⇒ the buckets ⌊r/W⌋ differ by ≤ 1, so emitting
    * (⌊r/W⌋, ⌊r/W⌋+1) on the build side covers every in-window pair
    * with an equality key. No inequality join, no window function over
    * data. Null blocking keys drop before ranking (a record with no key
    * cannot be windowed against anything — route null-key records to a
    * repair pass).
    */
  def sortedNeighborhoodJoin(df: DataFrame, keyCol: String, idCol: String,
                             window: Int, maxDist: Int): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val spark = df.sparkSession
    val w = window - 1
    // rank via the untyped Row RDD so the record id keeps WHATEVER
    // orderable type it arrived with (string/UUID ids are the common
    // record-linkage case; an id-type requirement here would be
    // arbitrary). zipWithIndex over the range-sorted frame preserves the
    // sort — same distributed-rank device as rankVocabulary.
    val sorted = df.select(col(keyCol).cast("string").as("k"), col(idCol).as("id"))
      .na.drop(Seq("k"))
      .sort(asc("k"), asc("id"))
    val idType = sorted.schema("id").dataType
    val ranked = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, rnk) =>
        org.apache.spark.sql.Row(r.get(0), r.get(1), rnk)
      },
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("id", idType),
        org.apache.spark.sql.types.StructField("rnk",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val probe = ranked.select(col("k").as("ka"), col("id").as("id_x"),
      col("rnk").as("ra"), expr(s"rnk div $w").as("b"))
    // the build side is the HIGHER-ranked partner (rb > ra), so it must
    // reach DOWN: rb − ra ≤ W ⇒ ⌊ra/W⌋ ∈ {⌊rb/W⌋, ⌊rb/W⌋ − 1}
    val build = ranked.select(col("k").as("kb"), col("id").as("id_y"),
        col("rnk").as("rb"),
        explode(array(expr(s"rnk div $w"), expr(s"rnk div $w - 1"))).as("b"))
    probe.join(build, "b")
      .filter(col("rb") > col("ra") && col("rb") - col("ra") <= w)
      // r17 opt: thresholded levenshtein (see editDistanceJoin); the
      // max(1, ·) keeps the threshold form defined at maxDist = 0 — the
      // between-filter still admits only dist ≤ maxDist
      .withColumn("dist", levenshtein(col("ka"), col("kb"), math.max(1, maxDist)))
      .filter(col("dist").between(0, maxDist))
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"),
        col("dist").cast("long").as("dist"))
      .distinct()
  }
}
