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

  private val fmt = {
    val f = new java.text.DecimalFormat("#.##")
    f
  }
  /** 2-decimal interval-boundary format (reference: BinningHandler.scala:
    * 64-92 uses DecimalFormat("#.##")).
    */
  def formatBound(d: Double): String = fmt.format(d)

  /** Interval label per includeLowest/right flags (SURVEY B4). */
  def label(lo: Double, hi: Double, first: Boolean, lastI: Boolean,
            includeLowest: Boolean, right: Boolean): String = {
    val l = formatBound(lo); val h = formatBound(hi)
    if (right) (if (first && includeLowest) s"[$l,$h]" else s"($l,$h]")
    else (if (lastI && includeLowest) s"[$l,$h]" else s"[$l,$h)")
  }

  /** The bin-label expression for a numeric column over `breaks`; null for
    * out-of-range rows (callers filter those out).
    */
  def binLabelExpr(c: Column, breaks: Seq[Double], includeLowest: Boolean,
                   right: Boolean): Column = {
    require(breaks.length >= 2, "need at least 2 breaks")
    require(breaks.sliding(2).forall(p => p(0) < p(1)), s"breaks must be strictly increasing: $breaks")
    val n = breaks.length - 1
    val cases = (0 until n).map { i =>
      val lo = breaks(i); val hi = breaks(i + 1)
      val cond =
        if (right) {
          val lower = if (i == 0) (if (includeLowest) c >= lo else c > lo) else c > lo
          lower && c <= hi
        } else {
          val upper =
            if (i == n - 1) (if (includeLowest) c <= hi else c < hi)
            else c < hi
          c >= lo && upper
        }
      (cond, lit(label(lo, hi, i == 0, i == n - 1, includeLowest, right)))
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
    val levels = (0 until breaks.length - 1).map(i =>
      label(breaks(i), breaks(i + 1), i == 0, i == breaks.length - 2, includeLowest, right))
    val counts = res.df.groupBy(colName).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    res.setFactorInfo(colName, FactorInfo(levels, counts))
    res
  }

  /** EQUALINTERVAL (SURVEY B2): numBins ≥ 2; breaks = linspace over the
    * (1e-5, 0.99999) quantile span — the reference's T-Digest pseudo
    * min/max (BinningHandler.scala:95-107). `exact=true` uses Spark's
    * exact `percentile` (small data / oracle parity); false uses
    * `percentile_approx` (t-digest — the 100 TB path).
    */
  def binningEqualInterval(ddf: DDF, colName: String, numBins: Int,
                           includeLowest: Boolean = false, right: Boolean = true,
                           exact: Boolean = false): DDF = {
    require(numBins >= 2, "numBins must be >= 2")
    val Seq(lo, hi) = Stats.quantiles(ddf.df, colName, Seq(0.00001, 0.99999), exact)
    val step = (hi - lo) / numBins
    val breaks = (0 to numBins).map(i => if (i == numBins) hi else lo + i * step)
    binningCustom(ddf, colName, breaks, includeLowest, right)
  }

  /** EQUALFREQ (SURVEY B3): breaks at quantiles i/numBins. */
  def binningEqualFreq(ddf: DDF, colName: String, numBins: Int,
                       includeLowest: Boolean = false, right: Boolean = true,
                       exact: Boolean = false): DDF = {
    require(numBins >= 2, "numBins must be >= 2")
    val ps = (0 to numBins).map(_.toDouble / numBins)
    val qs = Stats.quantiles(ddf.df, colName, ps, exact).distinct
    binningCustom(ddf, colName, qs, includeLowest, right)
  }
}
