package graft.operators

import graft.core.DDF
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Projection / row-view operators (SURVEY §2.2; reference:
  * flink/src/main/scala/io/ddf/flink/content/ViewHandler.scala).
  */
object Views {

  /** Column subset (reference: core ViewHandler.project; BaseSpec.scala:57). */
  def project(ddf: DDF, cols: Seq[String]): DDF =
    ddf.derive(ddf.df.select(cols.map(col): _*))

  /** Drop columns (reference: ViewHandlerSpec.scala:12-25). */
  def removeColumns(ddf: DDF, cols: Seq[String]): DDF =
    ddf.updateOrDerive(ddf.df.drop(cols: _*))

  /** Structured filter; unlike the reference (ViewHandler.scala:43-50,
    * which rejects grep), regex filtering is supported via `rlike`.
    */
  def subset(ddf: DDF, cols: Seq[String], filterExpr: String): DDF =
    ddf.derive(ddf.df.filter(expr(filterExpr)).select(cols.map(col): _*))

  /** First n rows (reference: ViewHandlerSpec.scala:39-48). */
  def head(ddf: DDF, n: Int): Seq[Row] = ddf.df.limit(n).collect().toSeq

  /** Top-n by column. The reference funnels through its parallelism-1
    * global sort (utils/package.scala:368-394); Spark's orderBy+limit
    * plans a TakeOrderedAndProject — no global sort at all.
    */
  def top(ddf: DDF, n: Int, byCol: String, ascending: Boolean): DDF = {
    val c = if (ascending) col(byCol).asc else col(byCol).desc
    ddf.derive(ddf.df.orderBy(c).limit(n))
  }

  /** Exact-count random sample (reference: ViewHandler.scala:17-22 with
    * Poisson/Binomial tail-bound fraction math in utils/package.scala:
    * 444-546). Spark-first: over-sample by a safety factor then limit —
    * same guarantee, no custom bound math on the driver.
    */
  def sampleExact(ddf: DDF, n: Int, seed: Long = 42L): DDF = {
    val total = ddf.df.count()
    if (n >= total) ddf.copy()
    else {
      val frac = math.min(1.0, (n.toDouble / total) * 1.5 + 10.0 / total)
      ddf.derive(ddf.df.sample(withReplacement = false, frac, seed).limit(n))
    }
  }

  /** Fractional random sample (reference: ViewHandler.scala:24-41 —
    * Poisson replication with replacement / Bernoulli filter without; both
    * are exactly Spark's `sample`).
    */
  def sample(ddf: DDF, fraction: Double, withReplacement: Boolean, seed: Long): DDF =
    ddf.derive(ddf.df.sample(withReplacement, fraction, seed))
}
