package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over a frame (extension — the
  * reference has no validation surface; a training-data pipeline gates
  * every publish on one of these reports). Two evaluation classes with
  * different costs, chosen per rule, never per call:
  *
  *  - ROW rules (not-null, range, regex, membership, arbitrary
  *    predicate): ALL of them evaluate in ONE scan with zero shuffles —
  *    each becomes a `sum(when(violated, 1))` in a single aggregate.
  *  - SET rules (unique key, foreign key): one shuffle each by nature
  *    (a group-count, an anti-join probe). The FK reference side streams
  *    into the join — broadcast when small.
  *
  * `report` returns (rule, violations, checked) — a gate is
  * `report(...).filter(col("violations") > 0).isEmpty`. `flag` appends a
  * `failed_rules` array column for routing bad rows to quarantine, row
  * rules only, still zero shuffles.
  */
object Validate {

  sealed trait Rule { def name: String }
  /** Row rule: `violated` is true on rows BREAKING the expectation. */
  final case class RowRule(name: String, violated: Column) extends Rule
  final case class UniqueKey(cols: Seq[String]) extends Rule {
    def name = s"unique(${cols.mkString(",")})"
  }
  final case class ForeignKey(cols: Seq[String], ref: DataFrame,
                              refCols: Seq[String]) extends Rule {
    require(cols.length == refCols.length && cols.nonEmpty,
      "foreign key needs matching column lists")
    def name = s"fk(${cols.mkString(",")})"
  }

  def notNull(c: String): RowRule = RowRule(s"not_null($c)", col(c).isNull)
  def inRange(c: String, lo: Double, hi: Double): RowRule =
    RowRule(s"in_range($c,$lo,$hi)",
      col(c).isNull || col(c) < lo || col(c) > hi)
  def matches(c: String, regex: String): RowRule =
    RowRule(s"matches($c)", col(c).isNull || !col(c).rlike(regex))
  def oneOf(c: String, values: Seq[String]): RowRule =
    RowRule(s"one_of($c)", col(c).isNull || !col(c).isInCollection(values))

  /** Embedding-column gates (extension): the pre-index publish checks an
    * embedding pipeline needs — dimension drift (a model/version switch
    * upstream), non-finite elements (NaN/±Inf poison every dot product
    * downstream, silently under IEEE), and all-zero vectors (cosine 0
    * against everything; usually an upstream encode failure). RowRules,
    * so they ride [[report]]'s single scan and [[flag]]'s zero-shuffle
    * projection. NULL vectors violate each rule (the [[notNull]]
    * convention of inRange/oneOf). The element predicates are HOF
    * `exists` — interpreted, fine for a once-per-publish gate; the hot
    * similarity math stays on the native codegen'd expressions.
    */
  def vectorDim(c: String, dim: Int): RowRule =
    RowRule(s"vector_dim($c,$dim)",
      col(c).isNull || size(col(c)) =!= dim)
  // NULL ELEMENTS violate finite: under 3-valued logic a bare
  // exists(isnan||isinf) returns NULL for [null, 1.0f] and report()'s
  // sum(when) would count it CLEAN — while every downstream dot product
  // on it returns NULL, exactly the poisoning this gate exists to catch
  // (r14 review).
  def vectorFinite(c: String): RowRule =
    RowRule(s"vector_finite($c)", col(c).isNull ||
      exists(col(c), x =>
        x.isNull || isnan(x) || abs(x) === lit(Float.PositiveInfinity)))
  // coalesce(…, true): exists returns NULL (not false) when the only
  // non-false predicate results are NULL elements — a vector with no
  // DEFINITE nonzero element is a violation, not a pass (r14 review).
  def vectorNonZero(c: String): RowRule =
    RowRule(s"vector_nonzero($c)", col(c).isNull ||
      !coalesce(exists(col(c), x => x =!= 0.0), lit(false)))

  /** Per-rule violation counts: (rule, violations, checked). All row
    * rules share one aggregate job; each set rule adds one job.
    */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rowRules = rules.collect { case r: RowRule => r }
    val rowCounts: Seq[(String, Long, Long)] = if (rowRules.isEmpty) Nil else {
      val aggs = count(lit(1)).as("__checked") +:
        rowRules.zipWithIndex.map { case (r, i) =>
          sum(when(r.violated, 1L).otherwise(0L)).as(s"__v$i") }
      val row = df.agg(aggs.head, aggs.tail: _*).first()
      val checked = row.getLong(0)
      rowRules.zipWithIndex.map { case (r, i) =>
        (r.name, if (row.isNullAt(i + 1)) 0L else row.getLong(i + 1), checked) }
    }
    // checked is computed ONCE — by the row aggregate when there is one,
    // by a single count otherwise — and shared by every set rule; a
    // per-rule df.count() would re-scan the corpus per rule
    lazy val checkedOnce: Long =
      rowCounts.headOption.map(_._3).getOrElse(df.count())
    val setCounts: Seq[(String, Long, Long)] = rules.collect {
      case u: UniqueKey =>
        // violations = rows carrying a duplicated key (all copies count)
        val dups = df.groupBy(u.cols.map(col): _*).agg(count(lit(1)).as("__n"))
          .filter(col("__n") > 1)
          .agg(coalesce(sum("__n"), lit(0L))).first().getLong(0)
        (u.name, dups, checkedOnce)
      case f: ForeignKey =>
        val refKeys = f.ref.select(f.refCols.map(col): _*).na.drop("any").distinct()
          .toDF(f.cols: _*)
        // SQL FK semantics (r14 review): a row with any NULL key
        // component is EXEMPT — NULL never matches in the anti-join, so
        // every nullable-FK row would otherwise read as an orphan.
        // Callers wanting null checks compose the separate notNull rule.
        val orphans = df.na.drop("any", f.cols)
          .join(refKeys, f.cols, "left_anti").count()
        (f.name, orphans, checkedOnce)
    }
    (rowCounts ++ setCounts).toDF("rule", "violations", "checked")
  }

  /** Append `failed_rules`: the names of every ROW rule the row breaks
    * (empty array = clean). Zero shuffles — quarantine routing is
    * `flag(df, rules).filter(size(col("failed_rules")) > 0)`.
    */
  def flag(df: DataFrame, rules: Seq[RowRule],
           outCol: String = "failed_rules"): DataFrame = {
    val names = rules.map(r => when(r.violated, lit(r.name)))
    df.withColumn(outCol,
      filter(array(names: _*), x => x.isNotNull))
  }
}
