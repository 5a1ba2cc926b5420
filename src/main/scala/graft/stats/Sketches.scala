package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mergeable sketch profiles (extension beyond the reference's exact
  * stats surface — StatisticsHandler.scala computes summaries with a
  * full pass per call and has no incremental story).
  *
  * The 100 TB contract: a corpus is ingested in shards; each shard is
  * profiled ONCE at write time (one aggregate pass, output = |cols|
  * config-sized rows), the per-shard profile tables are persisted next
  * to the data (see sources/Manifest), and corpus-wide statistics are
  * answered by MERGING profiles — the data itself is never rescanned.
  * That works because every field here is a bona fide commutative
  * monoid: DataSketches HLL registers merge by max, counts by sum,
  * min/max by min/max. HLL insertion and union are deterministic and
  * order-independent (registers are a max over hashed values), so for a
  * fixed dataset both the shard-merged and the whole-corpus estimate
  * are reproducible constants. They are not guaranteed EQUAL to each
  * other — DataSketches' union converts small coupon-mode (exact)
  * sketches to the HLL register array, so the merged path can differ
  * from the direct path by a hair near the coupon capacity (measured:
  * 503 vs 504 on 500 true distinct). What merging preserves exactly:
  * null_count, row_count, min/max. What it preserves within the
  * published error bound: the distinct estimate — the sk01 gate asserts
  * both claims against DuckDB-exact values.
  *
  * Everything is one `agg(...)` job: partial sketches per partition,
  * one merge, no shuffle of data rows.
  */
object Sketches {

  /** HLL_4 relative standard error for 2^lgK registers (Heule et al.,
    * HLL++; DataSketches quotes the same 1.04/sqrt(k) envelope). The
    * sk01 gate budgets 6σ — generous, but the estimate is deterministic
    * for a fixed dataset so the verdict cannot flap across runs; the
    * slack is for DATA variation across sf dirs, not RNG.
    */
  def hllRse(lgK: Int): Double = 1.04 / math.sqrt((1L << lgK).toDouble)

  private def isNumeric(dt: DataType): Boolean = dt.isInstanceOf[NumericType]

  /** One-pass mergeable profile of `cols`: one OUTPUT ROW PER COLUMN
    * with columns (col_name, ndv_sketch binary, null_count, row_count,
    * min_num, max_num, min_str, max_str). Numeric columns carry typed
    * min/max in `min_num`/`max_num` (the `_str` pair is NULL); string /
    * temporal columns carry lexicographic min/max in `min_str`/`max_str`
    * (ISO-cast for timestamps, so lexicographic == chronological).
    *
    * Sketch input is the column cast to string — canonical across types,
    * and the only cast whose distinctness matches the column's own
    * (casting doubles to long would alias values).
    *
    * Precision caveat: `min_num`/`max_num` are doubles, so 64-bit
    * integer columns with values beyond 2^53 get the nearest
    * representable double, not the exact integer — the merge stays
    * consistent (min/max of doubles), but the fields are exact only
    * within double's integer range.
    */
  def profile(df: DataFrame, cols: Seq[String] = Nil, lgK: Int = 12): DataFrame = {
    val cs = if (cols.nonEmpty) cols else df.columns.toSeq
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    cs.foreach(c => require(byName.contains(c), s"profile: no such column '$c'"))
    val aggs = cs.flatMap { c =>
      val numeric = isNumeric(byName(c))
      Seq(
        hll_sketch_agg(col(c).cast("string"), lgK).as(s"__hll_$c"),
        // coalesce: a zero-row shard must profile null_count = 0, not
        // NULL (legitimate under partitioned publishes; the
        // Stats.summaryOf rule; r14 review)
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"__nulls_$c"),
        (if (numeric) min(col(c).cast("double")) else lit(null).cast("double")).as(s"__minn_$c"),
        (if (numeric) max(col(c).cast("double")) else lit(null).cast("double")).as(s"__maxn_$c"),
        (if (numeric) lit(null).cast("string") else min(col(c).cast("string"))).as(s"__mins_$c"),
        (if (numeric) lit(null).cast("string") else max(col(c).cast("string"))).as(s"__maxs_$c"))
    } :+ count(lit(1)).as("__rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val structs = cs.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"__hll_$c").as("ndv_sketch"),
        col(s"__nulls_$c").as("null_count"),
        col("__rows").as("row_count"),
        col(s"__minn_$c").as("min_num"),
        col(s"__maxn_$c").as("max_num"),
        col(s"__mins_$c").as("min_str"),
        col(s"__maxs_$c").as("max_str"))
    }
    one.select(explode(array(structs: _*)).as("p")).select("p.*")
  }

  /** Merge any number of profile tables (all built by [[profile]], any
    * lgK mix allowed — HLL unions downsize to the smallest). Shuffles
    * O(|cols| · shards) profile rows, never data. Exact fields merge
    * exactly; the distinct estimate stays within the sketch bound of
    * the whole-corpus profile (not bit-equal — see the object doc) —
    * pinned by SketchesSpec and the sk01 gate.
    */
  def mergeProfiles(profiles: Seq[DataFrame]): DataFrame = {
    require(profiles.nonEmpty, "mergeProfiles: no profiles given")
    profiles.reduce(_ unionAll _)
      .groupBy("col_name")
      .agg(
        hll_union_agg(col("ndv_sketch"), allowDifferentLgConfigK = true).as("ndv_sketch"),
        sum("null_count").as("null_count"),
        sum("row_count").as("row_count"),
        min("min_num").as("min_num"),
        max("max_num").as("max_num"),
        min("min_str").as("min_str"),
        max("max_str").as("max_str"))
  }

  /** Human-readable view of a profile: the sketch column becomes the
    * distinct-count estimate. Config-sized input, config-sized output.
    */
  def estimate(profileDf: DataFrame): DataFrame =
    profileDf.select(
      col("col_name"),
      hll_sketch_estimate(col("ndv_sketch")).as("ndv_estimate"),
      col("null_count"), col("row_count"),
      col("min_num"), col("max_num"), col("min_str"), col("max_str"))

  /** Version-over-version drift report from two profile ESTIMATE tables
    * ([[estimate]] / Manifest.mergedProfile output) — the corpus-change
    * audit with ZERO rescans: both inputs are config-sized stats tables,
    * so the whole comparison is driver-light arithmetic regardless of
    * how many TB the profiles summarize. Per column: row/null counts,
    * null rates + delta, ndv estimates + ratio, and `range_widened`
    * (the new version's min/max escapes the old bounds; false when a
    * bound is absent on either side). Full-outer on col_name, so
    * columns ADDED or REMOVED between versions surface as rows with one
    * side null. Exact fields stay exact under this arithmetic; the ndv
    * ratio inherits the HLL error of both inputs (±2·6σ worst case at
    * the [[hllRse]] bound) — treat it as a drift SIGNAL, not a count.
    *
    * Degenerate-side contract: every derived rate/ratio is NULL (never
    * Infinity/NaN) when its denominator is absent or non-positive — a
    * column present on one side only, an all-null old column
    * (ndv_old = 0), or a 0-row side all surface as explicit nulls that
    * downstream consumers can filter with one IS NOT NULL.
    */
  def profileDrift(oldEst: DataFrame, newEst: DataFrame): DataFrame = {
    def side(df: DataFrame, s: String) = df.select(col("col_name"),
      col("row_count").as(s"rows_$s"), col("null_count").as(s"nulls_$s"),
      col("ndv_estimate").as(s"ndv_$s"),
      col("min_num").as(s"min_num_$s"), col("max_num").as(s"max_num_$s"),
      col("min_str").as(s"min_str_$s"), col("max_str").as(s"max_str_$s"))
    side(oldEst, "old").join(side(newEst, "new"), Seq("col_name"), "full")
      .withColumn("null_rate_old",
        when(col("rows_old") > 0, col("nulls_old").cast("double") / col("rows_old")))
      .withColumn("null_rate_new",
        when(col("rows_new") > 0, col("nulls_new").cast("double") / col("rows_new")))
      .withColumn("null_rate_delta", col("null_rate_new") - col("null_rate_old"))
      .withColumn("ndv_ratio",
        when(col("ndv_old") > 0, col("ndv_new") / col("ndv_old")))
      .withColumn("range_widened",
        coalesce(col("min_num_new") < col("min_num_old"), lit(false)) ||
          coalesce(col("max_num_new") > col("max_num_old"), lit(false)) ||
          coalesce(col("min_str_new") < col("min_str_old"), lit(false)) ||
          coalesce(col("max_str_new") > col("max_str_old"), lit(false)))
      .select("col_name", "rows_old", "rows_new", "nulls_old", "nulls_new",
        "null_rate_old", "null_rate_new", "null_rate_delta",
        "ndv_old", "ndv_new", "ndv_ratio", "range_widened")
  }

  /** Mergeable heavy hitters over `c`: DataSketches frequent-items via
    * `approx_top_k_accumulate` (per-shard sketch, bounded memory
    * O(maxItemsTracked) regardless of column cardinality) →
    * `approx_top_k_combine` → `approx_top_k_estimate`. Output:
    * (item string, est_count), deterministic order (count DESC, item).
    *
    * Exactness contract (what the sk02 gate leans on): when the number
    * of distinct values a sketch sees is ≤ maxItemsTracked, the sketch
    * degenerates to an exact counter, so estimates are exact counts and
    * the top-k equals the exact groupBy top-k. At corpus scale with
    * ndv > maxItemsTracked the counts become upper-bound estimates with
    * error ≤ N/maxItemsTracked — size maxItemsTracked to the tail you
    * care about, the memory stays bounded either way.
    */
  def topKSketch(df: DataFrame, c: String, k: Int,
                 maxItemsTracked: Int = 10000): DataFrame = {
    require(k > 0 && maxItemsTracked >= k,
      s"topKSketch: need 0 < k <= maxItemsTracked, got k=$k tracked=$maxItemsTracked")
    val sk = df.select(col(c).cast("string").as("__v"))
      .na.drop(Seq("__v"))
      .agg(expr(s"approx_top_k_accumulate(__v, $maxItemsTracked)").as("sk"))
    topKEstimate(sk, k, maxItemsTracked)
  }

  /** Per-shard accumulate: one sketch row per value of `shardCol` —
    * the persistable, mergeable form (store next to the shard like the
    * profile table).
    */
  def topKAccumulate(df: DataFrame, c: String, shardCol: String,
                     maxItemsTracked: Int = 10000): DataFrame =
    df.select(col(shardCol).as("shard"), col(c).cast("string").as("__v"))
      .na.drop(Seq("__v"))
      .groupBy("shard")
      .agg(expr(s"approx_top_k_accumulate(__v, $maxItemsTracked)").as("sk"))

  /** Combine shard sketches into one (drops the shard key) and estimate.
    * `combine(accumulate(shards)) == accumulate(whole)` exactly while
    * the COMBINED distinct count (the union across shards) is ≤
    * maxItemsTracked — per-shard ndv under the cap is not enough, since
    * disjoint shards can merge past it and force eviction into the
    * estimate-only regime. Beyond the exact regime the merged estimates
    * stay within the summed error bounds.
    */
  def topKCombineEstimate(sketches: DataFrame, k: Int,
                          maxItemsTracked: Int = 10000): DataFrame = {
    require(k > 0 && maxItemsTracked >= k,
      s"topKCombineEstimate: need 0 < k <= maxItemsTracked, got k=$k tracked=$maxItemsTracked")
    val sk = sketches
      .agg(expr(s"approx_top_k_combine(sk, $maxItemsTracked)").as("sk"))
    topKEstimate(sk, k, maxItemsTracked)
  }

  /** Estimate fetches EVERYTHING the sketch tracks, then cuts
    * deterministically by (count DESC, item): a partial fetch would let
    * the sketch pick an arbitrary subset of a tie group that straddles
    * the fetch boundary, breaking the deterministic-cut contract. The
    * window sorts ≤ maxItemsTracked config-sized rows — never data.
    */
  private def topKEstimate(oneSketchRow: DataFrame, k: Int, tracked: Int): DataFrame = {
    val fetch = tracked
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("est_count").desc, col("item").asc)
    oneSketchRow
      .select(explode(expr(s"approx_top_k_estimate(sk, $fetch)")).as("e"))
      .select(col("e.item").cast("string").as("item"),
        col("e.count").as("est_count"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Mergeable per-shard QUANTILE sketches (DataSketches KLL via
    * `kll_sketch_agg_bigint`) over a 64-bit integer column — the
    * quantile leg of the shard-profile story: profile each shard at
    * write time, MERGE sketches instead of rescanning the corpus. One
    * sketch row per value of `shardCol`, each O(k·log n) bytes
    * regardless of shard size.
    *
    * `k` is the KLL accuracy knob: normalized rank error ≈ 2.9%/1.7%/1%
    * at k = 128/200 (default)/400 with 99% confidence (DataSketches
    * published table). Accuracy contract, not determinism: KLL
    * compaction flips random bits, so estimates vary run-to-run INSIDE
    * the rank-error band — gates must assert the band (the q84/sk01
    * verdict pattern), never bit-equality.
    */
  def quantileAccumulate(df: DataFrame, c: String, shardCol: String,
                         k: Int = 200): DataFrame =
    df.select(col(shardCol).as("shard"), col(c).cast("long").as("__v"))
      .na.drop(Seq("__v"))
      .groupBy("shard")
      .agg(expr(s"kll_sketch_agg_bigint(__v, $k)").as("sk"))

  /** [[quantileAccumulate]] for continuous (double) columns — the
    * kll_*_double sketch family; same contract, estimates are doubles.
    */
  def quantileAccumulateDouble(df: DataFrame, c: String, shardCol: String,
                               k: Int = 200): DataFrame =
    df.select(col(shardCol).as("shard"), col(c).cast("double").as("__v"))
      .na.drop(Seq("__v"))
      .groupBy("shard")
      .agg(expr(s"kll_sketch_agg_double(__v, $k)").as("sk"))

  /** Merge shard quantile sketches and read quantile estimates at the
    * requested fractions: (fraction, est_value) rows. The merged
    * sketch's rank error stays within the per-sketch band (KLL merge is
    * error-preserving at equal k).
    */
  def quantileMergeEstimate(sketches: DataFrame, fractions: Seq[Double],
                            k: Int = 200): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(f => f >= 0.0 && f <= 1.0),
      "quantileMergeEstimate: fractions must be in [0, 1]")
    val merged = sketches.agg(expr(s"kll_merge_agg_bigint(sk, $k)").as("sk"))
    // the fraction argument must be foldable — one quantile expression
    // per requested fraction, unpivoted into (fraction, est_value) rows
    val qs = fractions.zipWithIndex.map { case (f, i) =>
      expr(s"kll_sketch_get_quantile_bigint(sk, CAST($f AS DOUBLE))").as(s"__q$i")
    }
    merged.select(qs: _*)
      .select(explode(array(fractions.zipWithIndex.map { case (f, i) =>
        struct(lit(f).as("fraction"), col(s"__q$i").as("est_value"))
      }: _*)).as("e"))
      .select(col("e.fraction").as("fraction"), col("e.est_value").as("est_value"))
  }

  /** [[quantileMergeEstimate]] for [[quantileAccumulateDouble]] shards. */
  def quantileMergeEstimateDouble(sketches: DataFrame, fractions: Seq[Double],
                                  k: Int = 200): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(f => f >= 0.0 && f <= 1.0),
      "quantileMergeEstimateDouble: fractions must be in [0, 1]")
    val merged = sketches.agg(expr(s"kll_merge_agg_double(sk, $k)").as("sk"))
    val qs = fractions.zipWithIndex.map { case (f, i) =>
      expr(s"kll_sketch_get_quantile_double(sk, CAST($f AS DOUBLE))").as(s"__q$i")
    }
    merged.select(qs: _*)
      .select(explode(array(fractions.zipWithIndex.map { case (f, i) =>
        struct(lit(f).as("fraction"), col(s"__q$i").as("est_value"))
      }: _*)).as("e"))
      .select(col("e.fraction").as("fraction"), col("e.est_value").as("est_value"))
  }
}
