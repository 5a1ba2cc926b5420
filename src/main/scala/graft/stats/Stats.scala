package graft.stats

import graft.core.DDF
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Statistics operators (SURVEY §2.5; reference:
  * flink/src/main/scala/io/ddf/flink/analytics/StatisticsHandler.scala and
  * BinningHandler.scala histogram path).
  *
  * Everything here is ONE `agg(...)` job per call — the reference's
  * accumulator side-channels (StatisticsHandler.scala:46-54) and
  * mapPartition+merge sketches become partial-aggregated Catalyst plans:
  * no driver-side merging, no extra shuffle of data rows, scales by
  * executor count.
  */
object Stats {

  /** Per-column one-pass summary (SURVEY T1). Mirrors the reference's
    * Summary fields: count (non-null), mean, variance (sample), stdev,
    * min, max, NA count.
    */
  final case class ColumnSummary(column: String, count: Long, naCount: Long,
                                 mean: Double, variance: Double, stdev: Double,
                                 min: Double, max: Double)

  def numericColumns(df: DataFrame): Seq[String] =
    df.schema.fields.collect { case f if f.dataType.isInstanceOf[NumericType] => f.name }.toSeq

  /** Summaries for ALL columns (reference getSummary indexes over the
    * full schema — StatisticsHandlerSpec:15 `summaries(9)`): numeric
    * columns get the full stats; other columns get count/NA with NaN
    * numeric fields. One aggregate pass for everything.
    */
  def summary(ddf: DDF): Seq[ColumnSummary] = summaryOf(ddf.df, ddf.df.columns.toSeq)

  def summaryOf(df: DataFrame, cols: Seq[String]): Seq[ColumnSummary] = {
    if (cols.isEmpty) return Nil
    val numeric = numericColumns(df).toSet
    val aggsAndArity = cols.map { c =>
      // coalesce: sum over ZERO rows is NULL (empty-frame summary)
      val base = Seq(count(col(c)).as(s"${c}__n"),
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"${c}__na"))
      if (numeric(c))
        base ++ Seq(
          avg(col(c)).cast(DoubleType).as(s"${c}__mean"),
          var_samp(col(c)).as(s"${c}__var"),
          stddev_samp(col(c)).as(s"${c}__sd"),
          min(col(c)).cast(DoubleType).as(s"${c}__min"),
          max(col(c)).cast(DoubleType).as(s"${c}__max"))
      else base
    }
    val aggs = aggsAndArity.flatten
    val row = df.agg(aggs.head, aggs.tail: _*).first()
    val offsets = aggsAndArity.map(_.size).scanLeft(0)(_ + _)
    cols.zipWithIndex.map { case (c, i) =>
      val b = offsets(i)
      def d(o: Int): Double = if (row.isNullAt(b + o)) Double.NaN else row.getDouble(b + o)
      if (numeric(c))
        ColumnSummary(c, row.getLong(b), row.getLong(b + 1), d(2), d(3), d(4), d(5), d(6))
      else
        ColumnSummary(c, row.getLong(b), row.getLong(b + 1),
          Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN)
    }
  }

  /** Summary as a DataFrame (column, count, na_count, mean, variance,
    * stdev, min, max) — the oracle-checkable shape.
    */
  def summaryDF(ddf: DDF, cols: Seq[String] = Nil): DataFrame = {
    val spark = ddf.spark
    import spark.implicits._
    val target = if (cols.isEmpty) numericColumns(ddf.df) else cols
    summaryOf(ddf.df, target).toDF()
  }

  private def isIntegral(df: DataFrame, c: String): Boolean =
    df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }

  /** The one-row quantile frame behind [[quantiles]], exposed so plan
    * shape is assertable (ScaleSpec): the default sketch path must show
    * a partial/final `percentile_approx` aggregation and NO sort of the
    * data — at 100 TB the sketch shuffles one t-digest per partition,
    * never the values. `exact=true` (opt-in, for goldens/oracles) uses
    * Spark's exact `percentile`, which buffers value→count per partition
    * — fine at gate scale, not the default at corpus scale.
    */
  def quantilesFrame(df: DataFrame, c: String, ps: Seq[Double], exact: Boolean = false): DataFrame = {
    val pArr = s"array(${ps.mkString(",")})"
    val fn = if (exact) "percentile" else "percentile_approx"
    // cast input to double: percentile_approx returns the INPUT type, so
    // an integral column would hand back ints
    df.na.drop(Seq(c)).agg(expr(s"$fn(cast($c as double), $pArr)").as("q"))
  }

  /** Quantiles for one column. `exact=false` → `percentile_approx`
    * (t-digest, the at-scale default — same sketch family as the
    * reference's clearspring T-Digest, StatisticsHandler.scala:60-84);
    * `exact=true` → Spark's exact `percentile` (for golden tests/oracles).
    * Integral columns floor the result (reference quirk kept:
    * StatisticsHandler.scala:150-155).
    */
  def quantiles(df: DataFrame, c: String, ps: Seq[Double], exact: Boolean = false): Seq[Double] = {
    val row = quantilesFrame(df, c, ps, exact).first()
    require(!row.isNullAt(0),
      s"quantiles: column '$c' has no non-null values")
    val raw = row.getSeq[Double](0)
    if (isIntegral(df, c)) raw.map(math.floor) else raw
  }

  def vectorQuantiles(ddf: DDF, c: String, ps: Seq[Double], exact: Boolean = false): Seq[Double] =
    quantiles(ddf.df, c, ps, exact)

  /** Five-number summary (SURVEY T2): min/max as the 1e-5/0.99999
    * pseudo-quantiles plus Q1/median/Q3 — one sketch pass per call.
    */
  final case class FiveNum(min: Double, q1: Double, median: Double, q3: Double, max: Double)
  def fiveNum(ddf: DDF, c: String, exact: Boolean = false): FiveNum = {
    val Seq(mn, q1, md, q3, mx) =
      quantiles(ddf.df, c, Seq(0.00001, 0.25, 0.5, 0.75, 0.99999), exact)
    FiveNum(mn, q1, md, q3, mx)
  }

  def vectorMean(ddf: DDF, c: String): Double =
    ddf.df.agg(avg(col(c)).cast(DoubleType)).first().getDouble(0)

  /** [variance, stdev] (SURVEY T5). */
  def vectorVariance(ddf: DDF, c: String): (Double, Double) = {
    val r = ddf.df.agg(var_samp(col(c)), stddev_samp(col(c))).first()
    (r.getDouble(0), r.getDouble(1))
  }

  /** Equal-width histogram (SURVEY T7; reference: BinningHandler.scala:
    * 184-225 + HistogramForDouble accumulator). Computed as two jobs:
    * min/max, then a codegen'd bucket-index groupBy — exact counts, no
    * accumulator side-channel, no driver merging.
    */
  def histogramDF(df: DataFrame, c: String, numBins: Int): DataFrame = {
    val r = df.na.drop(Seq(c)).agg(min(col(c)).cast(DoubleType), max(col(c)).cast(DoubleType)).first()
    require(!r.isNullAt(0) && !r.isNullAt(1),
      s"histogram: column '$c' has no non-null values")
    val (mn, mx) = (r.getDouble(0), r.getDouble(1))
    histogramFixed(df, c, numBins, mn, mx)
  }

  /** Histogram over a known [mn,mx] span — single job. The top edge is
    * closed (x == mx lands in the last bucket), matching the reference's
    * TreeMap floorKey bucketing.
    */
  def histogramFixed(df: DataFrame, c: String, numBins: Int, mn: Double, mx: Double): DataFrame = {
    val width = (mx - mn) / numBins
    val bucket =
      if (width == 0.0) lit(0)
      else least(floor((col(c).cast(DoubleType) - mn) / width), lit(numBins - 1)).cast(IntegerType)
    df.na.drop(Seq(c))
      .filter(col(c) >= mn && col(c) <= mx)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("bin_count"))
      .withColumn("bin_start", lit(mn) + col("bucket") * lit(width))
      .withColumn("bin_end", lit(mn) + (col("bucket") + 1) * lit(width))
      .select("bucket", "bin_start", "bin_end", "bin_count")
      .orderBy("bucket")
  }

  def histogram(ddf: DDF, c: String, numBins: Int): Seq[(Double, Double, Long)] =
    histogramDF(ddf.df, c, numBins).collect().toSeq
      .map(r => (r.getDouble(1), r.getDouble(2), r.getLong(3)))

  /** Simple summary (SURVEY T8): factor columns → distinct level list;
    * numeric columns → (min, max). One pass for all numerics; one
    * `groupBy` per factor column.
    */
  final case class SimpleSummary(numericRanges: Map[String, (Double, Double)],
                                 factorLevels: Map[String, Seq[String]])
  def simpleSummary(ddf: DDF): SimpleSummary = {
    val nums = numericColumns(ddf.df).filterNot(ddf.isFactor)
    val ranges: Map[String, (Double, Double)] =
      if (nums.isEmpty) Map.empty
      else {
        val aggs = nums.flatMap(c =>
          Seq(min(col(c)).cast(DoubleType).as(s"${c}__mn"), max(col(c)).cast(DoubleType).as(s"${c}__mx")))
        val row = ddf.df.agg(aggs.head, aggs.tail: _*).first()
        // all-null column → min/max are NULL → NaN range (not an NPE)
        def d(i: Int): Double = if (row.isNullAt(i)) Double.NaN else row.getDouble(i)
        nums.zipWithIndex.map { case (c, i) => c -> (d(2 * i), d(2 * i + 1)) }.toMap
      }
    val levels = ddf.factorColumns.map { c =>
      c -> ddf.df.select(col(c).cast(StringType)).na.drop().distinct()
        .collect().map(_.getString(0)).toSeq.sorted
    }.toMap
    SimpleSummary(ranges, levels)
  }

  /** Extension (training-data pipeline): weighted column summary — the
    * stats pass AFTER soft-dedup / importance weighting, where every row
    * carries a fractional multiplicity (`Dedup.softDedupWeights`,
    * `Dsir.importanceWeights`-derived sampling weights) and an unweighted
    * mean would re-inflate exactly the duplication the weights removed.
    * Frequency-weight semantics: w_mean = Σw·x/Σw, w_var = Σw·x²/Σw −
    * w_mean² (population form — weights are fractional copies, not
    * reliability weights). Rows with NULL x contribute nothing to that
    * column (their weight is excluded from its Σw); min/max are
    * unweighted by definition. NULL, negative, or NaN weights fail the
    * job loudly — each would silently poison every moment (a NULL weight
    * leaves the row counted in n/min/max yet absent from Σw). One aggregate pass for ALL
    * columns (the [[summaryOf]] shape); output one row per column:
    * (column, n, w_total, w_mean, w_var, min, max).
    */
  def weightedSummary(df: DataFrame, weightCol: String,
                      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "weightedSummary: need at least one column")
    val spark = df.sparkSession
    import spark.implicits._
    val w = col(weightCol).cast(DoubleType)
    // NaN and NULL ride the guard too: 'w < 0' is false for NaN under
    // Spark's NaN-is-greatest ordering, and a NULL weight (a failed
    // weight-join) would leave the row counted in n/min/max while
    // contributing nothing to the moments — both would silently poison
    // the summary, so both fail the job loudly
    val aggs = coalesce(
      sum(when(w.isNull || w < 0.0 || isnan(w), 1L).otherwise(0L)), lit(0L))
      .as("__neg") +:
      cols.flatMap { c =>
        val x = col(c).cast(DoubleType)
        val wx = when(x.isNotNull, w)
        Seq(count(x).as(s"${c}__n"),
          coalesce(sum(wx), lit(0.0)).as(s"${c}__wt"),
          sum(wx * x).as(s"${c}__wx"),
          sum(wx * x * x).as(s"${c}__wxx"),
          min(x).as(s"${c}__mn"), max(x).as(s"${c}__mx"))
      }
    val row = df.agg(aggs.head, aggs.tail: _*).first()
    require(row.getLong(0) == 0L,
      s"weightedSummary: ${row.getLong(0)} rows carry a NULL/negative/NaN '$weightCol'")
    def d(i: Int): Option[Double] = if (row.isNullAt(i)) None else Some(row.getDouble(i))
    val out = cols.zipWithIndex.map { case (c, j) =>
      val b = 1 + j * 6
      val wt = row.getDouble(b + 1)
      val mean = if (wt == 0.0) None else d(b + 2).map(_ / wt)
      val vr = for { m <- mean; sxx <- d(b + 3) }
        yield math.max(0.0, sxx / wt - m * m)
      (c, row.getLong(b), wt, mean, vr, d(b + 4), d(b + 5))
    }
    out.toDF("column", "n", "w_total", "w_mean", "w_var", "min", "max")
  }

  /** Extension (training-data pipeline): window-free midrank percentile
    * normalization — pr = (#strictly-below + 0.5·#ties) ÷ #non-null per
    * column, appended as `<col>_pr`. Puts heterogeneous quality signals
    * (length, LM log-prob, classifier score, novelty…) on ONE [0,1]
    * percentile scale so an ensemble can average/threshold them
    * uniformly — rank blending is how multi-signal quality filters
    * compose without unit gymnastics. NULL values keep a NULL rank.
    *
    * Shape per column (the ml09 distinct-value contract): one map-side-
    * combined distinct-value count, a cumulative over DISTINCT values
    * only (never the corpus), a broadcast 1-row total, and a value-keyed
    * join-back (broadcasts when the distinct frame fits). Quantize a
    * noisy continuous signal first if its distinct count is row-scale.
    * Ranks are exact rationals (integer counts ÷ n) — engine-exact.
    */
  def percentileRank(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "percentileRank: need at least one column")
    cols.foldLeft(df) { (acc, c) =>
      val out = s"${c}_pr"
      require(!acc.columns.contains(out),
        s"percentileRank: output column '$out' already exists")
      val cnt = acc.filter(col(c).isNotNull)
        .groupBy(col(c).as("__v")).agg(count(lit(1)).as("__k"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("__v"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val tot = cnt.agg(coalesce(sum("__k"), lit(0L)).as("__n"))
      val ranks = cnt
        .withColumn("__below", coalesce(sum(col("__k")).over(w), lit(0L)))
        .crossJoin(org.apache.spark.sql.functions.broadcast(tot))
        .select(col("__v"),
          ((col("__below").cast(DoubleType) + lit(0.5) * col("__k")) /
            col("__n")).as(out))
      acc.join(ranks, acc(c) === ranks("__v"), "left").drop("__v")
    }
  }

  /** Factor level counts for many columns in ONE pass (SURVEY T9;
    * reference: GetMultiFactor mapPartition+HashMap merge,
    * SchemaHandler.scala:90-185): explode (column, value) pairs then a
    * single groupBy — one shuffle for all factor columns together.
    */
  def multiFactorCounts(df: DataFrame, cols: Seq[String]): Map[String, Map[String, Long]] = {
    if (cols.isEmpty) return Map.empty
    val pairs = cols.map(c => struct(lit(c).as("col"), col(c).cast(StringType).as("value")))
    val exploded = df.select(explode(array(pairs: _*)).as("p"))
      .select(col("p.col"), col("p.value"))
      .na.drop(Seq("value"))
    exploded.groupBy("col", "value").count().collect()
      .groupBy(_.getString(0))
      .map { case (c, rows) => c -> rows.map(r => r.getString(1) -> r.getLong(2)).toMap }
  }

  /** Exact per-group median by middle-rank selection: rank inside each
    * group, keep the middle row (odd n) or both middle rows (even n),
    * average them through an exact decimal sum. Unlike interpolation-based
    * `percentile`, every step is integer ranking + decimal arithmetic, so
    * any engine reproduces it bit-for-bit (oracle-determinism rule: the
    * result of interpolating in doubles is engine-rounding-dependent; the
    * mean of two exact d-decimal values is not).
    *
    * `exactDecimals`: declared decimal precision of the value column.
    * Scale shape: one window shuffle (sort within groups — the honest
    * exact-median cost); use `percentile_approx` when an ε-approximation
    * is acceptable.
    */
  def groupMedian(df: DataFrame, groupCol: String, valCol: String,
                  exactDecimals: Int = 2): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col(valCol))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    df.na.drop(Seq(valCol))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .filter(col("__rn") === floor((col("__n") + 1) / lit(2)) ||
              col("__rn") === floor((col("__n") + 2) / lit(2)))
      .groupBy(groupCol)
      .agg((sum(col(valCol).cast(DecimalType(38, exactDecimals))).cast(DoubleType)
        / count(lit(1))).as("median"))
  }

  /** Per-group nearest-rank quantiles (SQL percentile_disc semantics):
    * the value at rank max(⌈p·n⌉, 1) inside each group, one column per
    * requested p (named q<p·100>). Selection, not interpolation — every
    * output is an actual data value, so results are engine-independent
    * (same reasoning as [[groupMedian]]). One window shuffle + one
    * grouped aggregate for ALL quantiles together.
    */
  def groupQuantiles(df: DataFrame, groupCol: String, valCol: String,
                     ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"quantile fractions must be in (0, 1], got $ps")
    // whole-percent ps → q25/q50/…; finer ps → permille with a suffix
    // (q125p = 12.5%), so 0.125 is never mislabeled as q13
    def label(p: Double): String = {
      val pct = p * 100
      if (pct == math.floor(pct)) s"q${pct.toInt}" else s"q${math.round(p * 1000)}p"
    }
    val labels = ps.map(label)
    require(labels.distinct.size == labels.size,
      s"quantile fractions map to duplicate column names: $ps -> $labels")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col(valCol))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    val ranked = df.na.drop(Seq(valCol))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
    val aggs = ps.zip(labels).map { case (p, lbl) =>
      // round(·, 9) before ceil: the IEEE product can land a hair above
      // the exact integer (0.95 × 100 = 95.000000000000002) and ceil
      // would bump the rank by one — the snap keeps the selection at the
      // true percentile_disc rank. The q48/q53/q54 oracles and the
      // PropertySpec serial reference apply the identical snap.
      max(when(col("__rn") ===
        greatest(ceil(round(lit(p) * col("__n"), 9)), lit(1L)), col(valCol)))
        .as(lbl)
    }
    ranked.groupBy(groupCol).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-group quantile BOUNDARIES as one slim row per group with columns
    * `__cut0 < __cut1 < …` (nearest-rank selection — actual data values).
    * `approx = false` routes through [[groupQuantiles]] (one within-group
    * window sort: the honest exact cost, and engine-independent because
    * selection never interpolates); `approx = true` is the 100 TB path —
    * a single `percentile_approx` aggregate (mergeable sketch, map-side
    * partial, NO sort/window anywhere), which also returns actual data
    * values so downstream `<=` comparisons stay consistent.
    */
  private def groupQuantileCuts(df: DataFrame, groupCol: String, valCol: String,
                                cuts: Seq[Double], approx: Boolean,
                                accuracy: Int): DataFrame = {
    val cutCols = cuts.indices.map(i => s"__cut$i")
    if (approx) {
      val arr = array(cuts.map(lit): _*)
      df.na.drop(Seq(valCol)).groupBy(groupCol)
        .agg(percentile_approx(col(valCol), arr, lit(accuracy)).as("__cs"))
        .select(col(groupCol) +:
          cuts.indices.map(i => element_at(col("__cs"), i + 1).as(cutCols(i))): _*)
    } else {
      val q = groupQuantiles(df, groupCol, valCol, cuts)
      val qCols = q.columns.filterNot(_ == groupCol) // in `cuts` order
      q.select(col(groupCol) +:
        qCols.zip(cutCols).map { case (a, b) => col(a).as(b) }: _*)
    }
  }

  /** Per-group quantile bucketing — the CCNet pattern (Wenzek et al.
    * 2020): bucket documents into head/middle/tail by an LM quality score
    * PER LANGUAGE, so one dominant language's score distribution doesn't
    * starve the others. Generic: any value column, any group column.
    *
    * `cuts` are strictly-increasing fractions in (0,1); `labels` has one
    * more entry than `cuts`, in ascending value order — a row lands in
    * `labels(i)` when its value is ≤ the group's `cuts(i)` boundary (first
    * match), else in `labels.last`. Boundaries are nearest-rank selected
    * data values (never interpolated), so with bit-identical inputs the
    * bucketing is engine-independent. Rows with a NULL value get a NULL
    * bucket (they carried no score — a gate must not silently promote
    * them to the top bucket).
    *
    * Scale shape: the boundary frame is ONE row per group → broadcast
    * join-back (no shuffle of the data side beyond what `approx = false`'s
    * within-group ranking window already pays; `approx = true` pays only
    * one mergeable-sketch aggregate — the 100 TB path). For group
    * cardinalities beyond broadcast range (millions of domains), drop to
    * [[graft.operators.Views.budgetSelectByGroup]]-style slim shapes; the
    * CCNet regime (dozens of languages) is squarely broadcast-sized.
    */
  def bucketByGroupQuantiles(df: DataFrame, valCol: String, groupCol: String,
                             cuts: Seq[Double], labels: Seq[String],
                             bucketCol: String = "bucket",
                             approx: Boolean = false,
                             accuracy: Int = 10000): DataFrame = {
    require(cuts.nonEmpty && cuts.forall(p => p > 0.0 && p < 1.0),
      s"cut fractions must be in (0, 1), got $cuts")
    require(cuts == cuts.sorted && cuts.distinct.size == cuts.size,
      s"cut fractions must be strictly increasing, got $cuts")
    require(labels.size == cuts.size + 1,
      s"need ${cuts.size + 1} labels for ${cuts.size} cuts, got ${labels.size}: $labels")
    require(labels.distinct.size == labels.size, s"duplicate bucket labels: $labels")
    require(!df.columns.contains(bucketCol),
      s"bucket column '$bucketCol' already exists in ${df.columns.toSeq}")
    val bounds = groupQuantileCuts(df, groupCol, valCol, cuts, approx, accuracy)
    val v = col(valCol)
    // NULL-value rows first (NULL bucket), then ascending cut checks; a
    // non-null value in a group present in `bounds` always has non-null
    // cuts (every rank 1..n selects a value), so `otherwise` is the top
    // bucket — and a group ABSENT from bounds had only NULL values, whose
    // rows are all caught by the isNull arm, never mislabeled.
    val bucket = cuts.indices
      .foldLeft(when(v.isNull, lit(null).cast("string"))) { (acc, i) =>
        acc.when(v <= col(s"__cut$i"), lit(labels(i)))
      }
      .otherwise(lit(labels.last))
    df.join(broadcast(bounds), Seq(groupCol), "left")
      .select(df.columns.map(col) :+ bucket.as(bucketCol): _*)
  }

  /** Per-group quantile GATE: keep rows at or above (`keepUpper = true`,
    * the quality-filter direction — the boundary value itself survives)
    * or at or below their group's nearest-rank `p`-quantile. The
    * per-group twin of a global threshold filter: thresholding a quality
    * score globally biases against whole groups (languages, sources)
    * whose score distributions sit lower — gating at each group's own
    * quantile keeps the same FRACTION everywhere. Rows with a NULL value
    * never pass (no score ⇒ no evidence). Same exact/approx split and
    * broadcast join-back shape as [[bucketByGroupQuantiles]].
    */
  def filterByGroupQuantile(df: DataFrame, valCol: String, groupCol: String,
                            p: Double, keepUpper: Boolean = true,
                            approx: Boolean = false,
                            accuracy: Int = 10000): DataFrame = {
    require(p > 0.0 && p < 1.0, s"quantile fraction must be in (0, 1), got $p")
    val bounds = groupQuantileCuts(df, groupCol, valCol, Seq(p), approx, accuracy)
    val keep = if (keepUpper) col(valCol) >= col("__cut0")
               else col(valCol) <= col("__cut0")
    df.join(broadcast(bounds), Seq(groupCol), "inner")
      .filter(keep)
      .select(df.columns.map(col): _*)
  }

  /** Tukey IQR fence [q1 − k·iqr, q3 + k·iqr] from nearest-rank
    * quartiles. `exact = true` ranks the full column (single-partition
    * window sort — fine to ~10⁷ rows and required for oracle parity);
    * the default approximate path uses the mergeable t-digest sketch and
    * is the 100 TB choice. Nearest-rank quartiles are actual data
    * values, so the exact fence is engine-independent.
    */
  def iqrBounds(df: DataFrame, c: String, k: Double = 1.5,
                exact: Boolean = false): (Double, Double) = {
    val Seq(q1, q3) =
      if (exact) {
        // cast first so the quartiles come back as doubles regardless of
        // the column's input type (no toString round-trip)
        val rows = groupQuantiles(
          df.select(col(c).cast("double").as(c)).withColumn("__g", lit(1)),
          "__g", c, Seq(0.25, 0.75)).take(1)
        // an all-NULL column still yields one group row with NULL
        // quantiles, and getAs[Double] would silently unbox that to 0.0
        // — mirror the approx branch's guard instead of returning a
        // bogus (0,0) fence
        require(rows.nonEmpty && !rows.head.isNullAt(rows.head.fieldIndex("q25")),
          s"iqrBounds: column '$c' has no non-null values")
        Seq(rows.head.getAs[Double]("q25"), rows.head.getAs[Double]("q75"))
      } else {
        val row = df.na.drop(Seq(c))
          .agg(expr(s"approx_percentile(cast($c as double), array(0.25, 0.75))")).first()
        require(!row.isNullAt(0),
          s"iqrBounds: column '$c' has no non-null values")
        row.getSeq[Double](0)
      }
    (q1 - k * (q3 - q1), q3 + k * (q3 - q1))
  }

  /** Drop rows whose `c` lies outside the IQR fence (null `c` rows are
    * dropped too — they have no defined position).
    */
  def dropOutliersIqr(df: DataFrame, c: String, k: Double = 1.5,
                      exact: Boolean = false): DataFrame = {
    val (lo, hi) = iqrBounds(df, c, k, exact)
    df.filter(col(c) >= lo && col(c) <= hi)
  }

  /** Winsorize: clamp `c` into the IQR fence instead of dropping rows
    * (nulls pass through unchanged).
    */
  def clipOutliersIqr(df: DataFrame, c: String, k: Double = 1.5,
                      exact: Boolean = false): DataFrame = {
    val (lo, hi) = iqrBounds(df, c, k, exact)
    df.withColumn(c, when(col(c) < lo, lo).when(col(c) > hi, hi).otherwise(col(c)))
  }

  /** Most frequent value per group (mode) with its count; ties break to
    * the smallest value. One partial-aggregated groupBy on (group, value)
    * — shuffled rows are O(distinct pairs) — then a window over the
    * already-aggregated counts.
    */
  def groupMode(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val counts = df.na.drop(Seq(valCol))
      .groupBy(col(groupCol), col(valCol))
      .agg(count(lit(1)).as("mode_count"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("mode_count").desc, col(valCol).asc)
    counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(groupCol), col(valCol).as("mode"), col("mode_count"))
  }

  /** Approximate distinct-value counts (HyperLogLog++) for many columns
    * in ONE aggregate pass — the sketch twin of [[multiFactorCounts]] for
    * columns whose cardinality is too high to enumerate. `rsd` is the
    * relative standard deviation (Spark default 0.05). Mergeable partial
    * sketches: one reduce, no shuffle of values.
    */
  def approxDistinctCounts(df: DataFrame, cols: Seq[String],
                           rsd: Double = 0.05): Map[String, Long] = {
    if (cols.isEmpty) return Map.empty
    val aggs = cols.map(c => approx_count_distinct(col(c), rsd).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).first()
    cols.map(c => c -> row.getAs[Long](c)).toMap
  }

  /** Per-column key-skew report — the diagnostic a join/groupBy tuner
    * reads before picking salting factors or bucket counts. One row per
    * requested column: exact row count, exact distinct count, the
    * heaviest key and its count (ties broken deterministically: highest
    * (count, key) under struct-max, i.e. count DESC then key DESC), and
    * `skew_ratio` = top_cnt / (n_rows / ndv) — how many times heavier
    * the hottest key is than a uniform key would be (1.0 = uniform,
    * ≥ partitions = a straggler at that parallelism).
    *
    * Scale shape: one map-side-combined groupBy per column (shuffles
    * O(ndv) (key, count) pairs, never rows) feeding a single-row
    * aggregate; columns are independent jobs over the same scan. NULL
    * keys participate as the sentinel "<NULL>" (a null-heavy join key is
    * exactly the skew this report exists to surface).
    */
  def skewReport(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "skewReport: need at least one column")
    val parts = cols.map { c =>
      df.groupBy(coalesce(col(c).cast(StringType), lit("<NULL>")).as("key"))
        .agg(count(lit(1)).as("cnt"))
        .agg(sum("cnt").as("n_rows"), count(lit(1)).as("ndv"),
          max(struct(col("cnt"), col("key"))).as("top"))
        .select(lit(c).as("col_name"), col("n_rows"), col("ndv"),
          col("top.key").as("top_key"), col("top.cnt").as("top_cnt"),
          (col("top.cnt").cast("double") * col("ndv") / col("n_rows"))
            .as("skew_ratio"))
    }
    parts.reduce(_.unionAll(_))
  }

  def setFactorsAndCompute(ddf: DDF, cols: Seq[String]): Unit = {
    val counts = multiFactorCounts(ddf.df, cols)
    cols.foreach { c =>
      val m = counts.getOrElse(c, Map.empty)
      ddf.setFactorInfo(c, graft.core.FactorInfo(m.keys.toSeq.sorted, m))
    }
  }

  /** Pairwise Pearson correlation matrix over `cols` in ONE aggregation
    * pass (extension of T6/A8 — the reference computes one pair per call,
    * StatisticsHandler-adjacent AggregationHandler.scala:19-43; k columns
    * would cost k(k-1)/2 full scans that way). Here one `agg(...)`
    * computes the k sums, k(k+1)/2 cross-products, and the count, and
    * every pairwise r derives from that single sufficient-statistics row
    * — the scan cost is constant in k, the shuffle is ONE partial-agg
    * row, and the k²-sized result is config-scale driver math.
    *
    * Rows with a null in ANY of `cols` are dropped first (listwise
    * deletion — the same matrix a statistics package computes, and the
    * only definition under which the matrix is positive semidefinite).
    *
    * `decimalScale`: when set, sums run through `decimal(18,scale)` /
    * `decimal(38,2*scale)` exactly (for fixed-point data such as money —
    * engine-portable, the q34 recipe); when None, double sums (fast
    * path, ~1e-15 engine-order noise). Output: (col_x, col_y, corr)
    * for x < y in `cols` order; a zero-variance column yields NaN for
    * its pairs, as corr is undefined there.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String],
                 decimalScale: Option[Int] = None): DataFrame = {
    require(cols.size >= 2, s"corrMatrix: need at least 2 columns, got $cols")
    require(cols.distinct.size == cols.size,
      s"corrMatrix: duplicate columns ${cols.diff(cols.distinct).distinct}")
    val spark = df.sparkSession
    def s1(c: String): Column = decimalScale match {
      case Some(p) => sum(col(c).cast(s"decimal(18,$p)")).cast("double")
      case None    => sum(col(c).cast("double"))
    }
    def s2(a: String, b: String): Column = decimalScale match {
      case Some(p) => sum((col(a).cast(s"decimal(18,$p)") *
        col(b).cast(s"decimal(18,$p)")).cast(s"decimal(38,${2 * p})")).cast("double")
      case None    => sum(col(a).cast("double") * col(b).cast("double"))
    }
    val pairs = for {
      i <- cols.indices; j <- i until cols.size
    } yield (cols(i), cols(j))
    val aggCols = count(lit(1)).cast("double").as("n") +:
      (cols.map(c => s1(c).as(s"s_$c")) ++
        pairs.map { case (a, b) => s2(a, b).as(s"p_${a}__$b") })
    val row = df.na.drop("any", cols)
      .agg(aggCols.head, aggCols.tail: _*).first()
    // POSITIONAL reads: the s_/p_ aliases are display-only — names like
    // "x__y" + "z" vs "x" + "y__z" alias-collide and getAs-by-name would
    // silently read the wrong pair's sum (r14 review)
    val n = row.getDouble(0)
    require(n >= 2, s"corrMatrix: need at least 2 complete rows, got ${n.toLong}")
    val sIdx = cols.zipWithIndex.map { case (c, i) => c -> (1 + i) }.toMap
    val pIdx = pairs.zipWithIndex.map { case (p, i) => p -> (1 + cols.size + i) }.toMap
    def comoment(a: String, b: String): Double = {
      val (x, y) = if (cols.indexOf(a) <= cols.indexOf(b)) (a, b) else (b, a)
      row.getDouble(pIdx((x, y))) -
        row.getDouble(sIdx(x)) * row.getDouble(sIdx(y)) / n
    }
    val out = for {
      i <- cols.indices; j <- (i + 1) until cols.size
      a = cols(i); b = cols(j)
      va = comoment(a, a); vb = comoment(b, b)
    } yield Row(a, b,
      // explicit NaN on zero variance: the cross-comoment can carry
      // rounding residue (e.g. 1e-9), and residue/0.0 reads ±Infinity
      // where the documented contract is NaN (r14 review)
      if (va == 0.0 || vb == 0.0) Double.NaN
      else comoment(a, b) / math.sqrt(va * vb))
    val schema = StructType(Seq(
      StructField("col_x", StringType, nullable = false),
      StructField("col_y", StringType, nullable = false),
      StructField("corr", DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1), schema)
  }

  /** Population Stability Index between a reference snapshot and a
    * current snapshot of the same numeric column — the standard
    * train-vs-serve / corpus-version drift monitor (PSI < 0.1 stable,
    * 0.1–0.25 moderate shift, > 0.25 major shift).
    *
    * Equal-interval bins are derived from the REFERENCE min/max (one
    * 2-value aggregate to the driver — config-sized); current-snapshot
    * values outside the reference range clamp into the edge bins, so a
    * range excursion shows up as edge-bin mass, never dropped rows. Zero
    * proportions are floored at `eps` before the log ratio (the standard
    * PSI smoothing), so a bin appearing or vanishing contributes a large
    * finite term instead of ±Infinity.
    *
    * Output: one row per bin, ALL `nBins` bins present even when empty on
    * both sides — (bin, lo, hi, ref_cnt, cur_cnt, ref_pct, cur_pct,
    * psi_term), ordered by bin; `sum(psi_term)` is the index. NULLs are
    * excluded on both sides (they are [[profileDrift]]'s null_rate job).
    *
    * Scale shape: one row-count+min/max aggregate over ref, then one
    * nBins-group hash aggregate per side (map-side partial, ≤ nBins rows
    * shuffled per partition) joined to a generated bin spine — no sort,
    * no window, no data-sized collect. A degenerate reference (min ==
    * max) uses width 1 so everything lands in bin 0.
    */
  /** Frozen equal-interval histogram of a reference corpus — the
    * training-time artifact [[graft.streaming.EventStreams.psiMonitor]]
    * scores live windows against. Two config-sized jobs: a min/max/count
    * aggregate and an nBins-row count collect. `pct` sums to 1 over the
    * non-null reference rows.
    */
  final case class HistogramSpec(lo: Double, width: Double, pct: Array[Double])

  def histogramSpec(ref: DataFrame, valueCol: String, nBins: Int): HistogramSpec = {
    require(nBins >= 2, s"histogramSpec: need at least 2 bins, got $nBins")
    val bounds = ref.na.drop(Seq(valueCol))
      .agg(min(col(valueCol).cast("double")).as("lo"),
        max(col(valueCol).cast("double")).as("hi"),
        count(lit(1)).as("n")).first()
    require(bounds.getLong(2) > 0, "histogramSpec: reference is empty")
    val lo = bounds.getDouble(0)
    val n = bounds.getLong(2).toDouble
    val width0 = (bounds.getDouble(1) - lo) / nBins
    val width = if (width0 > 0.0) width0 else 1.0
    val counts = ref.na.drop(Seq(valueCol))
      .select(least(greatest(
          floor((col(valueCol).cast("double") - lo) / width), lit(0L)),
        lit(nBins - 1L)).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    HistogramSpec(lo, width,
      Array.tabulate(nBins)(i => counts.getOrElse(i, 0L) / n))
  }

  def psiDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
               nBins: Int = 10, eps: Double = 1e-6): DataFrame = {
    require(nBins >= 2, s"psiDrift: need at least 2 bins, got $nBins")
    require(eps > 0.0, s"psiDrift: eps must be positive, got $eps")
    val spark = ref.sparkSession
    val bounds = ref.na.drop(Seq(valueCol))
      .agg(min(col(valueCol).cast("double")).as("lo"),
        max(col(valueCol).cast("double")).as("hi"),
        count(lit(1)).as("n")).first()
    require(bounds.getLong(2) > 0, "psiDrift: reference snapshot is empty")
    val lo = bounds.getDouble(0)
    val width0 = (bounds.getDouble(1) - lo) / nBins
    val width = if (width0 > 0.0) width0 else 1.0
    def binned(df: DataFrame, cntName: String) = df.na.drop(Seq(valueCol))
      .select(least(greatest(
          floor((col(valueCol).cast("double") - lo) / width), lit(0L)),
        lit(nBins - 1L)).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(cntName))
    val spine = spark.range(nBins).select(col("id").as("bin"))
    val joined = spine
      .join(binned(ref, "ref_cnt"), Seq("bin"), "left")
      .join(binned(cur, "cur_cnt"), Seq("bin"), "left")
      .select(col("bin"),
        (lit(lo) + col("bin") * width).as("lo"),
        (lit(lo) + (col("bin") + 1) * width).as("hi"),
        coalesce(col("ref_cnt"), lit(0L)).as("ref_cnt"),
        coalesce(col("cur_cnt"), lit(0L)).as("cur_cnt"))
    // totals via a broadcast 1-row cross join, not an unpartitioned
    // window — the nBins-row frame never needs a single-partition sort
    val totals = broadcast(joined.agg(
      sum(col("ref_cnt")).as("__ref_total"),
      sum(col("cur_cnt")).as("__cur_total")))
    // the empty-frame total guards below make 0/0 unreachable: ref is
    // require'd non-empty, and an empty cur floors every cur_pct at eps
    def pct(cnt: Column, total: Column) =
      greatest(when(total > 0, cnt.cast("double") / total.cast("double"))
        .otherwise(lit(0.0)), lit(eps))
    joined.crossJoin(totals)
      .withColumn("ref_pct", pct(col("ref_cnt"), col("__ref_total")))
      .withColumn("cur_pct", pct(col("cur_cnt"), col("__cur_total")))
      .drop("__ref_total", "__cur_total")
      .withColumn("psi_term",
        (col("cur_pct") - col("ref_pct")) * log(col("cur_pct") / col("ref_pct")))
      .orderBy("bin")
  }

  /** Jensen–Shannon drift between two snapshots of a CATEGORICAL column
    * — [[psiDrift]]'s sibling for string/low-cardinality columns
    * (source, language, label, or a pre-exploded token column). One row
    * per category seen on either side: (category, ref_cnt, cur_cnt,
    * ref_pct, cur_pct, js_term); `sum(js_term)` is the JS divergence in
    * nats, bounded in [0, ln 2] — no eps smoothing needed because JS's
    * zero terms are genuinely zero (0·ln(0/m) = 0 by convention, guarded
    * explicitly). A category present on only one side contributes
    * 0.5·p·ln 2 — the max per-category signal.
    *
    * Scale shape: one category-keyed hash aggregate per side (map-side
    * partial), a full outer join on category, and a broadcast 1-row
    * totals join — cost is O(category cardinality) past the scans, no
    * sort, no data-sized collect. NULL categories are excluded (they are
    * [[Sketches.profileDrift]]'s null_rate job). An empty side yields
    * the maximal 0.5·ln 2 per surviving category — by construction, not
    * an error: a vanished snapshot IS maximal drift.
    */
  def categoricalDrift(ref: DataFrame, cur: DataFrame,
                       valueCol: String): DataFrame = {
    def freq(df: DataFrame, cnt: String) = df.na.drop(Seq(valueCol))
      .groupBy(col(valueCol).as("category")).agg(count(lit(1)).as(cnt))
    val joined = freq(ref, "ref_cnt")
      .join(freq(cur, "cur_cnt"), Seq("category"), "full")
      .select(col("category"),
        coalesce(col("ref_cnt"), lit(0L)).as("ref_cnt"),
        coalesce(col("cur_cnt"), lit(0L)).as("cur_cnt"))
    val totals = broadcast(joined.agg(
      sum(col("ref_cnt")).as("__ref_total"),
      sum(col("cur_cnt")).as("__cur_total")))
    def pct(cnt: Column, total: Column) =
      when(total > 0, cnt.cast("double") / total.cast("double"))
        .otherwise(lit(0.0))
    def klTerm(p: Column, m: Column) =
      when(p > 0.0, p * log(p / m)).otherwise(lit(0.0))
    joined.crossJoin(totals)
      .withColumn("ref_pct", pct(col("ref_cnt"), col("__ref_total")))
      .withColumn("cur_pct", pct(col("cur_cnt"), col("__cur_total")))
      .withColumn("js_term", {
        val m = (col("ref_pct") + col("cur_pct")) / 2
        (klTerm(col("ref_pct"), m) + klTerm(col("cur_pct"), m)) * 0.5
      })
      .drop("__ref_total", "__cur_total")
  }
}
