package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension history and CDC merge (extension — the
  * reference has no temporal table support; its persist path overwrites).
  * Training-data pipelines need both: SCD2 turns an event/snapshot stream
  * into validity intervals ("what was this user's segment WHEN the
  * example was generated" — joinable point-in-time features that don't
  * leak the future), and CDC apply folds an at-least-once change feed
  * into current state.
  */
object History {

  /** Build SCD2 validity intervals from per-key timestamped observations:
    * consecutive rows (by `tsCol`, then `tieCols` for a total order)
    * whose `attrCols` are unchanged collapse into one row with
    * [valid_from, valid_to); the current segment has valid_to = NULL.
    *
    * Scale shape: one hash shuffle on the keys feeds BOTH window passes
    * and the grouped aggregate (same partitioning, one sort); shuffled
    * rows are the observations, output rows only the change points. NULL
    * attr values compare as equal to NULL (IS DISTINCT FROM semantics) —
    * a missing attribute is not an endless run of "changes".
    */
  def scd2(df: DataFrame, keyCols: Seq[String], tsCol: String,
           attrCols: Seq[String], tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "scd2 needs keys and attrs")
    val order = (col(tsCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val changed = attrCols.map(a =>
      not(col(a) <=> lag(col(a), 1).over(w))).reduce(_ || _)
    val seg = df
      .withColumn("__chg", when(changed, 1L).otherwise(0L))
      .withColumn("__seg", sum(col("__chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val grouped = seg.groupBy((keyCols :+ "__seg").map(col): _*)
      .agg(min(col(tsCol)).as("valid_from"),
        attrCols.map(a => first(col(a)).as(a)): _*)
    // chain by SEGMENT id, not valid_from: two segments of a key can
    // share a min timestamp when identical-ts observations straddle a
    // change (tieCols split them) — __seg is monotone in the row order
    // by construction, so the chaining stays total and deterministic
    val wSeg = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__seg"))
    grouped
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wSeg))
      .select((keyCols.map(col) ++ attrCols.map(col) ++
        Seq(col("valid_from"), col("valid_to"))): _*)
  }

  /** Point-in-time enrichment: join each fact row to the [[scd2]]
    * interval that was valid AT the fact's timestamp — the leak-free way
    * to attach slowly-changing attributes to training examples (joining
    * current state would leak the future into old examples).
    * Interval semantics match [[scd2]]'s construction: [valid_from,
    * valid_to), open-ended current interval; facts before a key's first
    * interval (or with no key match) keep NULL attributes (left join).
    *
    * Scale shape: an equi-join on the keys with the interval predicate
    * evaluated inside — both sides hash-partition on the keys (the
    * history side is O(change points) and broadcasts when it fits);
    * per-key interval counts are small by construction, so the per-row
    * predicate scan is bounded.
    */
  def asOfLookup(facts: DataFrame, history: DataFrame, keyCols: Seq[String],
                 factTs: String): DataFrame = {
    require(keyCols.nonEmpty, "asOfLookup needs join keys")
    val hist = history.withColumnRenamed("valid_from", "__vf")
      .withColumnRenamed("valid_to", "__vt")
    val cond = keyCols.map(k => facts(k) === hist(k)).reduce(_ && _) &&
      facts(factTs) >= hist("__vf") &&
      (hist("__vt").isNull || facts(factTs) < hist("__vt"))
    val histAttrs = hist.columns.filterNot(c =>
      keyCols.contains(c) || c == "__vf" || c == "__vt")
    // a history attribute sharing a fact column's name (the common case:
    // facts and history both derive from the same event frame) gets a
    // `_asof` suffix — emitting two identical names would make the
    // looked-up value unreadable (AMBIGUOUS_REFERENCE on first use)
    val factNames = facts.columns.toSet
    val outAttrs = histAttrs.map { c =>
      if (factNames.contains(c)) hist(c).as(s"${c}_asof") else hist(c)
    }
    facts.join(hist, cond, "left")
      .select(facts.columns.map(facts(_)) ++ outAttrs: _*)
  }

  /** Fold a CDC change feed into current state: per key, the LATEST row
    * by (tsCol, tieCols) wins — base rows participate as the oldest
    * version, `op` = 'D' drops the key, anything else ('I'/'U') replaces
    * it. Exactly the union-argmax shape: ONE shuffle over base ∪ changes,
    * no join, re-applying the same feed is idempotent.
    *
    * `base` needs `keyCols ++ valueCols`; `changes` needs
    * `keyCols ++ valueCols ++ (tsCol, opCol [, tieCols])`.
    */
  def cdcApply(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
               valueCols: Seq[String], tsCol: String, opCol: String,
               tieCols: Seq[String] = Nil): DataFrame = {
    val sel = (keyCols ++ valueCols).map(col)
    // base rows sort before every change: epoch −∞ via NULL ts + asc_nulls_first
    val b = base.select(sel: _*)
      .withColumn(tsCol, lit(null).cast(changes.schema(tsCol).dataType))
      .withColumn(opCol, lit("B"))
      .select((sel :+ col(tsCol) :+ col(opCol)) ++
        tieCols.map(t => lit(null).cast(changes.schema(t).dataType).as(t)): _*)
    val c = changes.select((sel :+ col(tsCol) :+ col(opCol)) ++ tieCols.map(col): _*)
    // a change row with a NULL ts would otherwise tie the base row's
    // NULL sentinel exactly — the trailing source rank (base 0 < change 1,
    // descending) guarantees "any change beats base" even then; multiple
    // NULL-ts changes still need tieCols for a total order (caller's
    // contract, as documented)
    val src = when(col(opCol) === "B", 0).otherwise(1)
    val order = (col(tsCol).desc_nulls_last +: tieCols.map(col(_).desc_nulls_last)) :+
      src.desc
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    b.unionByName(c)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= "D")
      .select(sel: _*)
  }

  /** Diff two corpus/table snapshots into a changeset — the inverse of
    * [[cdcApply]] (cdcApply(old, snapshotDiff(old, new), …) reproduces
    * `new`): per key, `change` = 'added' (key only in `newDf`), 'removed'
    * (only in `oldDf`), or 'changed' (present in both with any
    * `compareCols` value differing, NULL-safe). Unchanged keys — the bulk
    * of a release-over-release corpus diff — are dropped, so the output
    * is delta-sized. Emits both sides of every compared column
    * (`old_<c>` / `<c>`, new-side NULL on removals) so the changeset is
    * auditable and directly feedable to incremental downstream stages
    * (re-dedup only 'added'/'changed' docs, retract 'removed' ones from
    * an index).
    *
    * Duplicate keys on either side fail the job (raise_error): a diff
    * keyed on a non-key silently pairs arbitrary rows, so the guard rides
    * the same aggregation that pairs the sides — no extra pass.
    *
    * Scale shape: ONE hash shuffle of old ∪ new on the keys into a
    * grouped max-of-struct pair-up (no join, no window, no sort); with
    * both snapshots bucketed by the key ([[graft.sources.Bucketing]])
    * even that shuffle disappears.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs key columns")
    require(compareCols.nonEmpty, "snapshotDiff needs compare columns")
    // an overlapping column would duplicate in the tagged select and
    // surface as an opaque ambiguous-attribute analysis error downstream
    require(keyCols.intersect(compareCols).isEmpty,
      s"snapshotDiff: keyCols and compareCols must be disjoint, both contain " +
        keyCols.intersect(compareCols).mkString("[", ", ", "]"))
    val sel = (keyCols ++ compareCols).map(col)
    val tagged = oldDf.select(sel: _*).withColumn("__side", lit(0))
      .unionByName(newDf.select(sel: _*).withColumn("__side", lit(1)))
    val side = (s: Int) => sum(when(col("__side") === s, 1L).otherwise(0L))
    // max() over the side-filtered SINGLE-FIELD STRUCT both dodges
    // max's null-skipping (a present side with a NULL value is a non-null
    // struct, distinct from an absent side's NULL struct) and is
    // deterministic because the guard enforces ≤1 row per (key, side)
    val aggs = Seq(side(0).as("__no"), side(1).as("__nn")) ++
      compareCols.flatMap(c => Seq(
        max(when(col("__side") === 0, struct(col(c)))).as(s"__o_$c"),
        max(when(col("__side") === 1, struct(col(c)))).as(s"__n_$c")))
    val g = tagged.groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val dupGuard = when(col("__no") > 1L || col("__nn") > 1L,
      raise_error(concat(lit("snapshotDiff: duplicate key in "),
        when(col("__no") > 1L, lit("old")).otherwise(lit("new")),
        lit(" snapshot — keyCols must be unique per side"))))
    val changed = compareCols.map(c =>
      not(col(s"__o_$c.$c") <=> col(s"__n_$c.$c"))).reduce(_ || _)
    val change = when(col("__no") === 0L, lit("added"))
      .when(col("__nn") === 0L, lit("removed"))
      .when(changed, lit("changed"))
    g.withColumn("change", coalesce(dupGuard.cast("string"), change))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) ++ Seq(col("change")) ++
        compareCols.flatMap(c => Seq(
          col(s"__o_$c.$c").as(s"old_$c"), col(s"__n_$c.$c").as(c))): _*)
  }
}
