package graft.operators

import graft.core.DDF
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation surface (SURVEY §2.4; reference:
  * flink/src/main/scala/io/ddf/flink/analytics/AggregationHandler.scala).
  *
  * Reference semantics preserved: rows with a null in ANY referenced
  * column are dropped before aggregating (AggregationHandler.scala:96-102
  * `getCleanTable`); supported functions are MEAN/AVG, MAX, MIN, SUM,
  * COUNT (others throw, :55-64); `alias=fn(col)` spec grammar with
  * default alias `FN_col` (:139-150). Implementation is a single
  * `groupBy().agg()` — partial (map-side) aggregation, codegen, and AQE
  * partition coalescing come from Catalyst.
  */
object Aggregations {

  /** One parsed aggregate spec: either a plain (grouping) column or
    * `alias=fn(col)` / `fn(col)`.
    */
  sealed trait FieldSpec { def referenced: Seq[String] }
  final case class GroupCol(name: String) extends FieldSpec {
    def referenced: Seq[String] = Seq(name)
  }
  final case class AggSpec(fn: String, colName: String, alias: String) extends FieldSpec {
    def referenced: Seq[String] = if (colName == "*") Nil else Seq(colName)
  }

  private val AggRe = """(?i)\s*(?:(\w+)\s*=\s*)?(\w+)\s*\(\s*(\*|[\w.]+)\s*\)\s*""".r

  /** Parse `"a, b, sum(c), m=min(d)"` (reference: AggregationHandler.scala:
    * 139-150). Default alias is `FN_col` (uppercase function name), the
    * reference's convention — parenthesised names can't be column
    * identifiers (same concession as the reference :144).
    */
  def parseSpecs(specs: String): Seq[FieldSpec] =
    specs.split(",").toIndexedSeq.map(_.trim).filter(_.nonEmpty).map {
      case AggRe(alias, fn, c) =>
        val a = Option(alias).getOrElse(
          if (c == "*") s"${fn.toUpperCase}_all" else s"${fn.toUpperCase}_$c")
        AggSpec(fn.toLowerCase, c, a)
      case plain => GroupCol(plain)
    }

  /** Supported aggregate functions (reference: AggregationHandler.scala:
    * 55-64 — anything else throws).
    */
  /** The ONE fn-name → aggregate dispatch, shared by [[aggColumn]] and
    * pivot's per-cell conditional aggregates — two parallel switches had
    * already drifted on median's formulation (r14 review). mean..count
    * are the reference set; stddev/var/median are documented extensions.
    */
  private def fnAgg(fn: String, in: Column): Column = fn match {
    case "mean" | "avg"     => avg(in)
    case "max"              => max(in)
    case "min"              => min(in)
    case "sum"              => sum(in)
    case "count"            => count(in)
    case "stddev"           => stddev_samp(in)
    case "var" | "variance" => var_samp(in)
    case "median"           => percentile(in, lit(0.5))
    case other => throw new IllegalArgumentException(s"Unsupported aggregate '$other'")
  }

  def aggColumn(spec: AggSpec): Column = {
    // COUNT(*) is count of literal 1 in the reference grammar
    // (SqlSupport.scala:248); count(lit(1)) matches that exactly.
    require(spec.colName != "*" || spec.fn == "count",
      s"'*' is only valid with count, got ${spec.fn}(*)")
    val in = if (spec.colName == "*") lit(1) else col(spec.colName)
    fnAgg(spec.fn, in).as(spec.alias)
  }

  /** Null-clean on every referenced column (reference `getCleanTable`,
    * AggregationHandler.scala:96-102).
    */
  private def cleaned(df: DataFrame, specs: Seq[FieldSpec]): DataFrame = {
    val cols = specs.flatMap(_.referenced).distinct
    if (cols.isEmpty) df else df.na.drop("any", cols)
  }

  /** `aggregate("a, b, sum(c), min(d)")` (SURVEY A2; reference:
    * AggregationHandler.scala:104-130).
    */
  def aggregate(ddf: DDF, specs: String): DDF =
    ddf.derive(aggregateDf(ddf.df, specs))

  /** DataFrame form of [[aggregate]] — same spec grammar and null-clean;
    * the streaming rollup loop (`CurationStreams.aggMaintain`) aggregates
    * raw micro-batches through this without a DDF handle.
    */
  def aggregateDf(df: DataFrame, specs: String): DataFrame = {
    val parsed = parseSpecs(specs)
    val groups = parsed.collect { case GroupCol(n) => n }
    val aggs = parsed.collect { case a: AggSpec => aggColumn(a) }
    require(aggs.nonEmpty, "aggregate() needs at least one aggregate function")
    val clean = cleaned(df, parsed)
    if (groups.isEmpty) clean.agg(aggs.head, aggs.tail: _*)
    else clean.groupBy(groups.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Driver-side map keyed by comma-joined group values (reference
    * `AggregationResult`; SURVEY A2).
    */
  def aggregateToMap(ddf: DDF, specs: String): Map[String, Seq[Any]] = {
    val parsed = parseSpecs(specs)
    val nGroups = parsed.count(_.isInstanceOf[GroupCol])
    aggregate(ddf, specs).df.collect().map { row =>
      val key = (0 until nGroups).map(i => String.valueOf(row.get(i))).mkString(",")
      key -> (nGroups until row.length).map(row.get)
    }.toMap
  }

  /** Single scalar over the whole (null-cleaned) table (SURVEY A4;
    * reference: AggregationHandler.scala:132-137).
    */
  def aggregateOnColumn(ddf: DDF, fn: String, colName: String): Any = {
    val spec = AggSpec(fn.toLowerCase, colName, "v")
    ddf.df.na.drop("any", if (colName == "*") Nil else Seq(colName))
      .agg(aggColumn(spec)).first().get(0)
  }

  /** `groupBy(cols, Seq("alias=fn(col)"))` — one-step (SURVEY A5;
    * reference: AggregationHandler.scala:173-184).
    */
  def groupBy(ddf: DDF, groupCols: Seq[String], aggSpecs: Seq[String]): DDF =
    aggregate(ddf, (groupCols ++ aggSpecs).mkString(","))

  /** Two-step groupBy: stash the grouping columns, aggregate later
    * (SURVEY A6; reference: AggregationHandler.scala:203-226 — `agg`
    * without a prior groupBy throws).
    */
  def groupByStep1(ddf: DDF, groupCols: Seq[String]): DDF = {
    val out = ddf.copy()
    out.pendingGroupCols = groupCols
    out
  }
  def groupByStep2(ddf: DDF, aggSpecs: Seq[String]): DDF = {
    require(ddf.pendingGroupCols.nonEmpty, "agg() without a prior groupBy()")
    groupBy(ddf, ddf.pendingGroupCols, aggSpecs)
  }

  /** xtabs = alias of aggregate (SURVEY A7; reference:
    * AggregationHandler.scala:163-165).
    */
  def xtabs(ddf: DDF, specs: String): DDF = aggregate(ddf, specs)

  /** Long→wide pivot (extension — the reference only reshapes the other
    * way via xtabs' long output): one output column per
    * (pivot value × aggregate), named `<value>_<alias>`.
    *
    * `pivotValues` is REQUIRED, not inferred: Spark's value-less
    * `pivot(col)` runs a separate distinct-scan job over the input and
    * caps it at `spark.sql.pivotMaxValues` — at 100 TB that is a second
    * full pass just to learn the column list, and an unbounded value
    * domain would make the output width data-dependent. With explicit
    * values Catalyst rewrites the pivot to conditional aggregates inside
    * ONE hash aggregate (single shuffle on `groupCols`, map-side
    * combined, no extra job) — same plan shape as [[aggregate]].
    *
    * Null semantics match [[aggregate]] plus SQL conditional-aggregation
    * convention per cell: rows with a null in any aggregated column are
    * dropped first; rows whose `pivotCol` value is not in `pivotValues`
    * (including null) fall outside every output column; null `groupCols`
    * values keep their group row; an EMPTY cell reads NULL for value
    * aggregates and 0 for `count` (it counts matching rows).
    *
    * Implementation note: this deliberately does NOT use Spark's
    * `RelationalGroupedDataset.pivot`, whose PivotFirst plan aggregates
    * by (group, pivot) and re-aggregates by group — two shuffles. With
    * the values known up front, one conditional aggregate per
    * (value × spec) inside a SINGLE hash aggregate does the same work
    * with one shuffle on `groupCols` and full map-side combine
    * (plan-pinned in ScaleSpec).
    */
  def pivot(ddf: DDF, groupCols: Seq[String], pivotCol: String,
            pivotValues: Seq[String], aggSpecs: Seq[String]): DDF = {
    require(groupCols.nonEmpty, "pivot() needs at least one grouping column")
    require(pivotValues.nonEmpty,
      "pivot() requires explicit pivot values — inferring them runs a " +
        "second full scan of the input (see scaladoc)")
    require(pivotValues.distinct.size == pivotValues.size,
      s"duplicate pivot values: ${pivotValues.diff(pivotValues.distinct).distinct}")
    val parsed = parseAggOnly(aggSpecs)
    require(parsed.nonEmpty, "pivot() needs at least one aggregate function")
    val clean = cleaned(ddf.df, parsed)
    def cellAgg(spec: AggSpec, v: String): Column = {
      val in =
        if (spec.colName == "*") when(col(pivotCol) === lit(v), lit(1))
        else when(col(pivotCol) === lit(v), col(spec.colName))
      fnAgg(spec.fn, in).as(s"${v}_${spec.alias}")
    }
    val aggs = for (v <- pivotValues; sp <- parsed) yield cellAgg(sp, v)
    ddf.derive(clean.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*))
  }

  /** Incremental view maintenance: merge two aggregate tables produced
    * by [[aggregate]] with the SAME specs over disjoint row sets —
    * `aggregate(A ∪ B) == mergeAggregates(aggregate(A), aggregate(B))`.
    * At 100 TB this is the difference between re-aggregating the corpus
    * nightly and folding in one partition's partials: the merge shuffles
    * O(groups), never rows. Mergeable functions only (count→sum,
    * sum→sum, min→min, max→max); mean/var need sufficient statistics
    * (keep count+sum and divide downstream) and are refused here.
    */
  def mergeAggregates(a: DataFrame, b: DataFrame, specs: String): DataFrame =
    mergeStacked(a.unionByName(b), specs)

  /** [[mergeAggregates]] over ANY number of stacked finished-aggregate
    * frames in one DataFrame (e.g. the epoch-partitioned partial store of
    * `CurationStreams.aggMaintain` read back whole): same mergeable-only
    * contract, O(partials) in → O(groups) out.
    */
  def mergeStacked(partials: DataFrame, specs: String): DataFrame = {
    val parsed = parseSpecs(specs)
    val groups = parsed.collect { case GroupCol(n) => n }
    val merged = parsed.collect { case AggSpec(fn, _, alias) =>
      (fn match {
        case "count" | "sum" => sum(col(alias))
        case "min"           => min(col(alias))
        case "max"           => max(col(alias))
        case other => throw new IllegalArgumentException(
          s"'$other' is not mergeable from finished aggregates; " +
            "keep sufficient statistics (count + sum) instead")
      }).as(alias)
    }
    require(merged.nonEmpty, "mergeAggregates() needs at least one aggregate")
    if (groups.isEmpty) partials.agg(merged.head, merged.tail: _*)
    else partials.groupBy(groups.map(col): _*).agg(merged.head, merged.tail: _*)
  }

  /** Parse agg-only spec strings (cube/groupingSets/resample grammar):
    * every comma-separated entry of every string must be `alias=fn(col)`
    * — a plain column here is a grouping column passed in the wrong
    * argument, refused rather than silently dropped.
    */
  private[graft] def parseAggOnly(aggSpecs: Seq[String]): Seq[AggSpec] =
    aggSpecs.flatMap(parseSpecs).map {
      case a: AggSpec => a
      case GroupCol(n) => throw new IllegalArgumentException(
        s"'$n' is not an aggregate spec — grouping columns go in the groupCols argument")
    }

  /** OLAP CUBE — every subset of the grouping columns in ONE pass
    * (extension; the reference has no multi-level aggregation at all —
    * its xtabs is a plain GROUP BY, AggregationHandler.scala:163-165).
    * Spark expands the cube inside a single `Expand` + hash-aggregate:
    * map-side partial aggregation still applies, so shuffled bytes are
    * O(groups × 2^k), never O(rows × 2^k). `grouping_id()` is emitted as
    * `gid` so downstream code can tell a data NULL (gid bit 0: a real
    * NULL group) from a rollup NULL (gid bit 1) — which is also why the
    * reference-style null-clean applies ONLY to the aggregated columns
    * here, never the grouping columns: dropping NULL group rows would
    * silently corrupt every subtotal, exactly what SQL CUBE does not do.
    */
  def cube(ddf: DDF, groupCols: Seq[String], aggSpecs: Seq[String]): DDF = {
    val parsed = parseAggOnly(aggSpecs)
    require(parsed.nonEmpty, "cube() needs at least one aggregate function")
    val clean = cleaned(ddf.df, parsed)
    val aggs = grouping_id().cast("int").as("gid") +: parsed.map(aggColumn)
    ddf.derive(clean.cube(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*))
  }

  /** GROUPING SETS — only the requested grouping combinations (extension;
    * same single-Expand plan shape as [[cube]], cost O(groups × |sets|)).
    * `sets` lists, per grouping set, which of `groupCols` participate
    * (empty = grand total). Null-clean covers aggregated columns only,
    * as in [[cube]].
    */
  def groupingSets(ddf: DDF, groupCols: Seq[String], sets: Seq[Seq[String]],
                   aggSpecs: Seq[String]): DDF = {
    val bad = sets.flatten.distinct.filterNot(groupCols.contains)
    require(bad.isEmpty, s"grouping-set columns not in groupCols: $bad")
    val parsed = parseAggOnly(aggSpecs)
    require(parsed.nonEmpty, "groupingSets() needs at least one aggregate function")
    val clean = cleaned(ddf.df, parsed)
    val aggs = grouping_id().cast("int").as("gid") +: parsed.map(aggColumn)
    val grouped = clean.groupingSets(sets.map(_.map(col)), groupCols.map(col): _*)
    ddf.derive(grouped.agg(aggs.head, aggs.tail: _*))
  }

  /** Pearson correlation (SURVEY A8). The reference hand-rolls sufficient
    * stats (AggregationHandler.scala:19-43); Spark's `corr` aggregate is
    * the same one-pass co-moment computation, codegen'd.
    */
  def correlation(ddf: DDF, a: String, b: String): Double = {
    val row = ddf.df.na.drop("any", Seq(a, b)).agg(corr(a, b)).first()
    // empty/all-null input: corr over zero rows is NULL — fail with the
    // column names instead of getDouble's opaque NPE (the Stats.quantiles
    // guard; r14 review)
    require(!row.isNullAt(0),
      s"correlation: no rows where both '$a' and '$b' are non-null")
    row.getDouble(0)
  }

  /** Sample covariance (SURVEY A9; reference: Welford-style merge in
    * utils/package.scala:34-119).
    */
  def covariance(ddf: DDF, a: String, b: String): Double = {
    val row = ddf.df.na.drop("any", Seq(a, b)).agg(covar_samp(a, b)).first()
    require(!row.isNullAt(0),
      s"covariance: no rows where both '$a' and '$b' are non-null " +
        s"(covar_samp also needs at least 2)")
    row.getDouble(0)
  }
}
