package graft.operators

import graft.core.{DDF, FactorInfo}
import graft.stats.Stats
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binning (SURVEY §2.6; reference:
  * flink/src/main/scala/io/ddf/flink/analytics/BinningHandler.scala and
  * `Misc.getBinned` in utils/package.scala:177-227).
  *
  * Reference semantics preserved exactly: rows outside [b0, bLast] (and
  * boundary rows excluded by the flags) are DROPPED, not nulled; the
  * binned column is replaced by an interval-label STRING and re-classed as
  * a factor. `Bucketizer` can't express the row-dropping, so the bin is a
  * composed `when/between` expression + filter — all inside whole-stage
  * codegen, no custom operator needed (SURVEY §4.3).
  */
object Binning {

  // Locale.ROOT symbols: the default-locale DecimalFormat would print
  // "0,5" on a comma-decimal JVM — ambiguous against the interval
  // separator and non-deterministic across machines (r14 review).
  // DecimalFormat is not thread-safe either; one instance per thread.
  private val fmt = ThreadLocal.withInitial[java.text.DecimalFormat](() =>
    new java.text.DecimalFormat("#.##",
      java.text.DecimalFormatSymbols.getInstance(java.util.Locale.ROOT)))
  /** 2-decimal interval-boundary format (reference: BinningHandler.scala:
    * 64-92 uses DecimalFormat("#.##")).
    */
  def formatBound(d: Double): String = fmt.get().format(d)

  /** Interval labels, reference-exact (BinningHandler.createIntervals:
    * 64-92): right=true → "(a,b]" with "[a,b]" first when includeLowest;
    * right=false → "(a,b)" everywhere except the first AND last become
    * "[a,b)" when includeLowest. (Yes — middle labels say open-open while
    * assignment is [a,b); the reference's labels are cosmetic there and
    * its golden tests pin them.)
    */
  def labels(breaks: Seq[Double], includeLowest: Boolean, right: Boolean): Seq[String] = {
    val n = breaks.length - 1
    val base = (0 until n).map { i =>
      val a = formatBound(breaks(i)); val b = formatBound(breaks(i + 1))
      if (includeLowest && i == 0) (if (right) s"[$a,$b]" else s"[$a,$b)")
      else if (right) s"($a,$b]"
      else s"($a,$b)"
    }
    if (includeLowest && !right)
      base.updated(n - 1, s"[${formatBound(breaks(n - 1))},${formatBound(breaks(n))})")
    else base
  }

  def label(lo: Double, hi: Double, first: Boolean, lastI: Boolean,
            includeLowest: Boolean, right: Boolean): String = {
    val l = formatBound(lo); val h = formatBound(hi)
    if (right) (if (first && includeLowest) s"[$l,$h]" else s"($l,$h]")
    else if (includeLowest && (first || lastI)) s"[$l,$h)"
    else s"($l,$h)"
  }

  /** The bin-label expression for a numeric column over `breaks`; null for
    * out-of-range / boundary-excluded rows (callers filter those out).
    * Assignment semantics are reference-exact (utils/package.scala
    * getBinned row filter + getIntervalForValue):
    *  - right=true:  v ∈ (b_i, b_{i+1}]; v == b_0 kept only if includeLowest
    *  - right=false: v ∈ [b_i, b_{i+1}) when includeLowest, (b_i, b_{i+1})
    *    otherwise (boundary values dropped); v == b_last always dropped
    * Breaks may be non-decreasing (duplicate edges give point/empty
    * intervals — the reference's equal-freq path produces them).
    */
  def binLabelExpr(c: Column, breaks: Seq[Double], includeLowest: Boolean,
                   right: Boolean): Column = {
    require(breaks.length >= 2, "need at least 2 breaks")
    require(breaks.sliding(2).forall(p => p(0) <= p(1)), s"breaks must be non-decreasing: $breaks")
    require(breaks.head < breaks.last, "breaks must span a non-empty range")
    val n = breaks.length - 1
    val ls = labels(breaks, includeLowest, right)
    val cases = (0 until n).map { i =>
      val lo = breaks(i); val hi = breaks(i + 1)
      val cond =
        if (right) {
          val lower = if (i == 0 && includeLowest) c >= lo else c > lo
          lower && c <= hi
        } else {
          val lower = if (includeLowest) c >= lo else c > lo
          lower && c < hi
        }
      (cond, lit(ls(i)))
    }
    cases.foldRight(lit(null).cast("string")) { case ((cond, l), acc) => when(cond, l).otherwise(acc) }
  }

  /** CUSTOM binning (SURVEY B1): replace `colName` with its interval
    * label, drop out-of-range rows, re-class as factor with the interval
    * labels as levels.
    */
  def binningCustom(ddf: DDF, colName: String, breaks: Seq[Double],
                    includeLowest: Boolean = false, right: Boolean = true): DDF = {
    val lbl = binLabelExpr(col(colName), breaks, includeLowest, right)
    val out = ddf.df
      .withColumn(colName, lbl)
      .filter(col(colName).isNotNull)
    val res = ddf.updateOrDerive(out)
    val levels = labels(breaks, includeLowest, right)
    val counts = res.df.groupBy(colName).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    res.setFactorInfo(colName, FactorInfo(levels, counts))
    res
  }

  /** EQUALINTERVAL (SURVEY B2): numBins ≥ 2; breaks = linspace over
    * [min, max]. The reference asks its T-Digest for the 1e-5/0.99999
    * quantiles (BinningHandler.scala:95-107), which at those extremes
    * just return min/max — exact interpolation would floor the top break
    * below the max and break the reference goldens, so min/max is the
    * faithful (and cheaper) formulation.
    */
  def binningEqualInterval(ddf: DDF, colName: String, numBins: Int,
                           includeLowest: Boolean = false, right: Boolean = true): DDF = {
    // (no `exact` flag here, unlike binningEqualFreq: min/max aggregates
    // are always exact, so the distinction doesn't exist for this type)
    require(numBins >= 2, "numBins must be >= 2")
    val row = ddf.df.na.drop(Seq(colName))
      .agg(min(col(colName)).cast("double"), max(col(colName)).cast("double")).first()
    require(!row.isNullAt(0) && !row.isNullAt(1),
      s"binning: column '$colName' has no non-null values")
    val (lo, hi) = (row.getDouble(0), row.getDouble(1))
    val step = (hi - lo) / numBins
    val breaks = (0 to numBins).map(i => if (i == numBins) hi else lo + i * step)
    binningCustom(ddf, colName, breaks, includeLowest, right)
  }

  /** EQUALFREQ (SURVEY B3): breaks at quantiles i/numBins (ends = min/
    * max). Duplicate quantile breaks are KEPT — they produce the
    * reference's point intervals like "[1,1]" (its equal-freq goldens pin
    * them). `exact=true` → Spark's exact `percentile`; false →
    * `percentile_approx` (t-digest — the 100 TB path). The reference's
    * unsorted-probs loop bug (getQuantilesFromNumBins, BinningHandler.
    * scala:108-120) is NOT reproduced — for numBins=2 the results
    * coincide; beyond that its breaks are garbage.
    */
  def binningEqualFreq(ddf: DDF, colName: String, numBins: Int,
                       includeLowest: Boolean = false, right: Boolean = true,
                       exact: Boolean = false): DDF = {
    require(numBins >= 2, "numBins must be >= 2")
    val ps = (0 to numBins).map(_.toDouble / numBins)
    val qs = Stats.quantiles(ddf.df, colName, ps, exact)
    binningCustom(ddf, colName, qs, includeLowest, right)
  }
}
