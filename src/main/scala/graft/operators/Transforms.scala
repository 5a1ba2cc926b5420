package graft.operators

import graft.core.DDF
import org.apache.spark.sql.{DataFrame, Encoder, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, NumericType}

/** Transformation operators (SURVEY §2.11; reference:
  * flink/src/main/scala/io/ddf/flink/etl/TransformationHandler.scala).
  *
  * The reference's R-bridge (Rserve per-partition data.frame transforms)
  * is replaced Spark-first: expression transforms are `withColumn(expr)`
  * (codegen'd — no serialization boundary at all), and the generic
  * escape hatch is typed `mapPartitions` / `mapGroups` over Datasets.
  */
object Transforms {

  /** `SELECT *, expr AS col` column-add (SURVEY P9; reference: core
    * TransformationHandler builds that SQL over `@this`).
    */
  def transformUDF(ddf: DDF, colName: String, sqlExpr: String): DDF =
    ddf.updateOrDerive(ddf.df.withColumn(colName, expr(sqlExpr)))

  /** Base-R `transform()` mutate expressions compiled to one Catalyst
    * projection (SURVEY U1; reference: TransformationHandler.scala:70-128
    * `transformNativeRserve` — its documented usage, `"newcol = V5 / V7"`
    * style, runs unchanged here with R semantics and no R process).
    * See [[graft.sql.RTransform]] for the supported sub-language.
    */
  def transformR(ddf: DDF, rExpression: String): DDF =
    ddf.updateOrDerive(graft.sql.RTransform.transform(ddf.df, rExpression))

  /** The reference's R `transformMapReduceNative(mapDef, reduceDef)`,
    * compiled (SURVEY U2; reference: TransformationHandler.scala:16-66).
    * The keyval idiom — its only documented usage — IS a grouped
    * aggregation; see [[graft.sql.RTransform.mapReduceR]]. The
    * reference's `mapsideCombine` flag is accepted and ignored: Spark's
    * hash aggregate always partial-aggregates map-side.
    */
  def transformMapReduceR(ddf: DDF, mapFuncDef: String, reduceFuncDef: String,
                          mapsideCombine: Boolean = true): DDF =
    ddf.derive(graft.sql.RTransform.mapReduceR(ddf.df, mapFuncDef, reduceFuncDef))

  /** Min-max scale every numeric column to [0,1] (SURVEY U3; golden
    * behavior: max→1.0, TransformationHandlerSpec.scala:35-49). All
    * min/max pairs come from ONE aggregate pass; the rewrite itself is a
    * single codegen'd projection.
    */
  def scaleMinMax(ddf: DDF, cols: Seq[String] = Nil): DDF =
    scaleWith(ddf, cols) { (c, stats) =>
      val (mn, mx) = (stats(s"${c}__a"), stats(s"${c}__b"))
      if (mx == mn) lit(0.5) else (col(c).cast(DoubleType) - mn) / (mx - mn)
    }(c => Seq(min(col(c)).cast(DoubleType).as(s"${c}__a"), max(col(c)).cast(DoubleType).as(s"${c}__b")))

  /** Standard (z-score) scale (SURVEY U3). */
  def scaleStandard(ddf: DDF, cols: Seq[String] = Nil): DDF =
    scaleWith(ddf, cols) { (c, stats) =>
      val (mu, sd) = (stats(s"${c}__a"), stats(s"${c}__b"))
      if (sd == 0.0 || sd.isNaN) lit(0.0) else (col(c).cast(DoubleType) - mu) / sd
    }(c => Seq(avg(col(c)).cast(DoubleType).as(s"${c}__a"), stddev_samp(col(c)).as(s"${c}__b")))

  /** Robust (median/IQR) scale — the outlier-immune twin of
    * [[scaleStandard]] (sklearn RobustScaler semantics: (x − median) ÷
    * (q3 − q1)). Heavy tails and sentinel junk move mean/stddev
    * arbitrarily far but barely move rank statistics, so this is the
    * scaler for quality-signal columns feeding gates and classifiers.
    * Default rides the mergeable `percentile_approx` t-digest — ONE
    * partial-agg pass like the other scalers, the 100 TB path;
    * `exact = true` uses exact `percentile` (small data / oracle
    * parity). IQR 0 (constant-ish column) → 0.0, the scaleStandard
    * convention.
    */
  def scaleRobust(ddf: DDF, cols: Seq[String] = Nil, exact: Boolean = false): DDF =
    scaleWith(ddf, cols) { (c, stats) =>
      val (med, iqr) = (stats(s"${c}__a"), stats(s"${c}__b"))
      if (iqr == 0.0 || iqr.isNaN) lit(0.0)
      else (col(c).cast(DoubleType) - med) / iqr
    }(c => {
      val pct = if (exact) "percentile" else "percentile_approx"
      Seq(expr(s"$pct(`$c`, 0.5)").cast(DoubleType).as(s"${c}__a"),
        (expr(s"$pct(`$c`, 0.75)") - expr(s"$pct(`$c`, 0.25)"))
          .cast(DoubleType).as(s"${c}__b"))
    })

  /** Deterministic categorical index encoding — StringIndexer's
    * frequencyDesc contract (id 0 = most frequent category) without the
    * fitted-model object: id = rank by (count DESC, value ASC), assigned
    * via distributed sort + zipWithIndex over the DISTINCT-category
    * frame (never a single-task window — the t14 vocabulary-ranking
    * mechanism; ranking cost is O(categories), not O(rows)). NULL
    * categories keep a NULL id (compose notNull / fillNA upstream).
    * The id map joins back onto the rows — broadcast when it fits.
    */
  def indexEncode(ddf: DDF, c: String, outCol: String): DDF = {
    require(ddf.df.columns.contains(c), s"indexEncode: no column '$c'")
    require(!ddf.df.columns.contains(outCol),
      s"indexEncode: output column '$outCol' already exists")
    val counts = ddf.df.filter(col(c).isNotNull)
      .groupBy(col(c).as("__cat")).agg(count(lit(1)).as("__n"))
    val catType = ddf.df.schema(c).dataType
    val rdd = counts.sort(desc("__n"), asc("__cat")).select("__cat")
      .rdd.zipWithIndex()
      .map { case (r, i) => Row(r.get(0), i) }
    val ids = ddf.spark.createDataFrame(rdd,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__cat", catType),
        org.apache.spark.sql.types.StructField(outCol,
          org.apache.spark.sql.types.LongType))))
    val out = ddf.df.join(ids, ddf.df(c) === ids("__cat"), "left").drop("__cat")
    ddf.updateOrDerive(out)
  }

  private def scaleWith(ddf: DDF, cols: Seq[String])(
      rewrite: (String, Map[String, Double]) => org.apache.spark.sql.Column)(
      aggsFor: String => Seq[org.apache.spark.sql.Column]): DDF = {
    val numeric = ddf.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
    }.toSeq
    val target = if (cols.isEmpty) numeric else cols.filter(numeric.contains)
    if (target.isEmpty) return ddf
    val names = target.flatMap(c => Seq(s"${c}__a", s"${c}__b"))
    val aggs = target.flatMap(aggsFor)
    val row = ddf.df.agg(aggs.head, aggs.tail: _*).first()
    val stats = names.zipWithIndex.map { case (n, i) =>
      n -> (if (row.isNullAt(i)) Double.NaN else row.getDouble(i))
    }.toMap
    val out = target.foldLeft(ddf.df)((df, c) => df.withColumn(c, rewrite(c, stats)))
    ddf.updateOrDerive(out)
  }

  /** Typed map-reduce analog of the reference's R `map_reduce_native`
    * (SURVEY U2; reference: TransformationHandler.scala:16-66 — R map →
    * shuffle by string key → R reduce). Spark-first: `groupByKey` +
    * `mapGroups` on a Dataset — partial serialization only at the typed
    * boundary, shuffle on the extracted key.
    */
  def mapReduce[K: Encoder, OUT: Encoder](ddf: DDF)(keyFn: Row => K)(
      reduceFn: (K, Iterator[Row]) => OUT)(implicit tup: Encoder[(K, Row)]): DDF = {
    val ds = ddf.df.groupByKey(keyFn)(implicitly[Encoder[K]])
    val spark = ddf.spark
    val out = ds.mapGroups(reduceFn)(implicitly[Encoder[OUT]]).toDF()
    ddf.derive(out)
  }

  /** Per-partition escape hatch (replaces Rserve partition transforms). */
  def mapPartitionsRows(ddf: DDF, schema: org.apache.spark.sql.types.StructType)(
      fn: Iterator[Row] => Iterator[Row]): DDF = {
    val rdd = ddf.df.rdd.mapPartitions(fn)
    ddf.derive(ddf.spark.createDataFrame(rdd, schema))
  }
}
