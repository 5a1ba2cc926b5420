package graft.operators

import graft.core.DDF
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Join + set operators (SURVEY §2.3/§2.8; reference:
  * flink/src/main/scala/io/ddf/flink/etl/JoinHandler.scala and the coGroup
  * machinery in utils/package.scala:232-364).
  *
  * The reference implements every join as a sort-merge coGroup with
  * hand-built null padding; here the join is declared and Catalyst picks
  * the physical strategy (broadcast-hash for small sides, sort-merge for
  * large, AQE skew-splitting at runtime). LEFT SEMI is a true semi-join —
  * the reference's per-match duplicate emission (utils/package.scala:
  * 296-305) is an acknowledged bug its own tests never pin (SURVEY J5).
  */
object Joins {

  val supportedTypes: Set[String] =
    Set("inner", "left_outer", "right_outer", "full_outer", "left_semi", "left_anti")

  private def normalize(joinType: String): String =
    joinType.trim.toLowerCase.replace(' ', '_') match {
      case "left" | "leftouter" | "left_outer"    => "left_outer"
      case "right" | "rightouter" | "right_outer" => "right_outer"
      case "full" | "fullouter" | "full_outer" | "outer" => "full_outer"
      case "semi" | "leftsemi" | "left_semi"      => "left_semi"
      case "anti" | "leftanti" | "left_anti"      => "left_anti"
      case "inner" | ""                           => "inner"
      case other => throw new IllegalArgumentException(s"Unsupported join type '$other'")
    }

  /** API join (reference: JoinHandler.scala:19-40): join on common columns
    * or explicit left/right key lists. Duplicate right-side key columns are
    * really deduplicated (the reference's dedup was a no-op,
    * utils/package.scala:253).
    */
  def join(
      left: DDF,
      right: DDF,
      joinType: String = "inner",
      byColumns: Seq[String] = Nil,
      byLeft: Seq[String] = Nil,
      byRight: Seq[String] = Nil,
      broadcastRight: Boolean = false
  ): DDF = {
    val jt = normalize(joinType)
    val r0 = if (broadcastRight) broadcast(right.df) else right.df
    val out =
      if (byColumns.nonEmpty) left.df.join(r0, byColumns, jt)
      else if (byLeft.nonEmpty) {
        require(byLeft.length == byRight.length, "byLeft/byRight arity mismatch")
        val l = left.df.alias("l")
        val r = r0.alias("r")
        val cond = byLeft.zip(byRight).map { case (a, b) => col(s"l.$a") === col(s"r.$b") }.reduce(_ && _)
        l.join(r, cond, jt)
      } else {
        val common = left.df.columns.toSeq.intersect(right.df.columns.toSeq)
        require(common.nonEmpty, "No common columns to join on")
        left.df.join(r0, common, jt)
      }
    left.derive(out)
  }

  /** UNION ALL with exact-schema check (reference: JoinHandler.scala:42-61
    * `merge` — throws on schema mismatch, keeps duplicates).
    */
  def merge(left: DDF, right: DDF): DDF = {
    require(
      left.schema.fields.map(f => (f.name, f.dataType)).sameElements(
        right.schema.fields.map(f => (f.name, f.dataType))),
      s"Schema mismatch: ${left.schema.simpleString} vs ${right.schema.simpleString}")
    left.derive(left.df.unionAll(right.df))
  }

  /** Extensions beyond the reference (it has no distinct/intersect/except —
    * SURVEY §2.8 "No INTERSECT / EXCEPT / DISTINCT-rows operator exists").
    */
  def distinctRows(ddf: DDF): DDF = ddf.derive(ddf.df.distinct())
  def intersect(left: DDF, right: DDF): DDF = left.derive(left.df.intersect(right.df))
  def except(left: DDF, right: DDF): DDF = left.derive(left.df.except(right.df))

  /** Skew-mitigating equi-join: spread each (possibly hot) left key over
    * `saltFactor` sub-keys and replicate the right side once per salt
    * value, so one dominant key's rows land on saltFactor reducers
    * instead of one. Output is identical to the unsalted join (the salt
    * only changes the shuffle distribution — every left row still meets
    * every matching right row exactly once).
    *
    * Scale notes: the right side grows ×saltFactor — use with a
    * dimension-sized right side (a broadcastable right side needs no
    * salting at all). AQE's skew-split covers sort-merge joins
    * automatically; salting is the explicit tool for when AQE can't help
    * (hash aggregations, pre-shuffle stages, or a single key too large
    * for one split). Right-preserving joins are rejected: replication
    * would duplicate unmatched right rows.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    val jt = normalize(joinType)
    require(Set("inner", "left_outer", "left_semi", "left_anti")(jt),
      s"saltedJoin supports left-preserving joins only, got '$joinType'")
    val salt = "__graft_salt"
    // salt must be DETERMINISTIC per row: rand() re-draws on task retry,
    // and after a shuffle-fetch failure the recomputed salts can route a
    // row to a reducer that already consumed the original output (the
    // SPARK-23207 indeterminate-shuffle hazard — rows duplicated/lost or
    // the job aborted). Hashing every left column is retry-stable; only
    // byte-identical duplicate rows share a salt.
    val sl = left.withColumn(salt,
      pmod(xxhash64(left.columns.map(col): _*), lit(saltFactor.toLong)).cast("int"))
    val sr = right.withColumn(salt, explode(array((0 until saltFactor).map(lit): _*)))
    sl.join(sr, keys :+ salt, jt).drop(salt)
  }

  /** As-of join — Spark has no native one; this one has pandas
    * `merge_asof` parity. Every left row gets the payload of the
    * matching right row sharing the partition keys (null struct when no
    * match exists), where the match is
    *   - `"backward"` (default): the LATEST right row with
    *     rightTime ≤ leftTime;
    *   - `"forward"`: the EARLIEST right row with rightTime ≥ leftTime;
    *   - `"nearest"`: whichever of the two is closer in time, ties
    *     going backward.
    * `tolerance` (optional, in the time column's `cast("double")`
    * units — seconds for timestamps, the raw value for numerics)
    * rejects matches farther than that from the left time.
    *
    * Implemented with the union + running-edge window shape: tag both
    * sides, union, one window per direction ordered by (time, side,
    * rightOrder) carrying `last`/`first(payload, ignoreNulls)` — so the
    * cost is ONE hash shuffle on the partition keys plus a
    * per-partition sort per direction (nearest needs both orderings:
    * same Exchange, two sorts). The alternative range-join rewrite
    * (join on key + time band, then argmax) fans out to |left|×|band|
    * intermediate rows and needs a second aggregation; at 100 TB the
    * window shape wins and never explodes. Ties: a right row at exactly
    * leftTime matches in every direction; among right rows at the same
    * instant the greatest `rightOrder` wins backward and the least wins
    * forward (mirror symmetry) — pass a unique id to make results fully
    * deterministic.
    *
    * Returns all left columns plus `asof` (struct of `rightPayload`).
    */
  def asofJoin(left: DataFrame, right: DataFrame, partitionCols: Seq[String],
               leftTime: String, rightTime: String,
               rightPayload: Seq[String], rightOrder: String,
               direction: String = "backward",
               tolerance: Option[Double] = None): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"asofJoin: direction must be backward|forward|nearest, got '$direction'")
    tolerance.foreach(t => require(t >= 0, s"asofJoin: negative tolerance $t"))
    // empty partition keys would build an UNPARTITIONED window — the
    // whole dataset through one sort task (the History.asOfLookup /
    // scd2 guard; r14 review). Single-series callers pass a constant
    // key column explicitly, making the scale trade visible.
    require(partitionCols.nonEmpty,
      "asofJoin: need at least one partition column (an unpartitioned " +
        "as-of would sort everything in one task — add a constant key " +
        "column deliberately for a single global series)")
    // the match carries the right TIME alongside the payload so tolerance
    // and the nearest tie-break are computable after the window
    val payType = right.select(
      struct(col(rightTime).cast("double").as("__rt"),
        struct(rightPayload.map(col): _*).as("__p")).as("p")).schema("p").dataType
    val lrowType = left.select(struct(left.columns.map(col): _*).as("r")).schema("r").dataType
    val lu = left.select(
      partitionCols.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(1).as("__isl"),
        lit(null).cast(LongType).as("__ord"),
        struct(left.columns.map(col): _*).as("__lrow"),
        lit(null).cast(payType).as("__pay")): _*)
    val ru = right.select(
      partitionCols.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__isl"),
        col(rightOrder).cast(LongType).as("__ord"),
        lit(null).cast(lrowType).as("__lrow"),
        struct(col(rightTime).cast("double").as("__rt"),
          struct(rightPayload.map(col): _*).as("__p")).as("__pay")): _*)
    // backward scan: rights at the same instant sort BEFORE the left row
    // (isl asc), so <= matches; running last picks the greatest __ord
    val wB = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col("__t").asc, col("__isl").asc, col("__ord").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward scan: rights at the same instant sort AFTER the left row
    // (isl desc), so >= matches; running first picks the least __ord
    val wF = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col("__t").asc, col("__isl").desc, col("__ord").asc_nulls_first)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val u = lu.unionByName(ru)
    val matched = direction match {
      case "backward" => u.withColumn("__mb", last(col("__pay"), ignoreNulls = true).over(wB))
      case "forward"  => u.withColumn("__mf", first(col("__pay"), ignoreNulls = true).over(wF))
      case _ => u
        .withColumn("__mb", last(col("__pay"), ignoreNulls = true).over(wB))
        .withColumn("__mf", first(col("__pay"), ignoreNulls = true).over(wF))
    }
    val lt = col("__t").cast("double")
    def within(m: Column, delta: Column): Column = tolerance match {
      case Some(tol) => when(m.isNotNull && delta <= lit(tol), m)
      case None      => m
    }
    val pick = direction match {
      case "backward" => within(col("__mb"), lt - col("__mb.__rt"))
      case "forward"  => within(col("__mf"), col("__mf.__rt") - lt)
      case _ =>
        val b = within(col("__mb"), lt - col("__mb.__rt"))
        val f = within(col("__mf"), col("__mf.__rt") - lt)
        // closer side wins; exact tie (or missing forward) goes backward
        when(b.isNull, f).when(f.isNull, b)
          .otherwise(when(lt - b.getField("__rt") <= f.getField("__rt") - lt, b)
            .otherwise(f))
    }
    matched.filter(col("__isl") === 1)
      .withColumn("__m", pick)
      .select(col("__lrow.*"), col("__m.__p").as("asof"))
  }

  /** Interval–point range join: every (point, interval) pair with
    * start ≤ t ≤ end (closed interval), equal partition keys.
    *
    * Spark plans a raw inequality join as BroadcastNestedLoop/cartesian —
    * quadratic. Here time is quantized into `bucketMs` buckets: each
    * interval explodes into the buckets it spans, points carry their one
    * bucket, and the join is a plain EQUI-join on (keys, bucket) with an
    * exact containment filter after — hash-partitioned, skew handled by
    * AQE like any other equi-join. A point meets an interval in exactly
    * one bucket, so no dedup pass is needed. Interval fan-out is
    * span/bucketMs rows: pick bucketMs near the typical interval length
    * (fan-out ~2×) — at 100 TB that's the knob between shuffle volume
    * and filter selectivity. Column names (besides `keys`) must be
    * disjoint between the two sides.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                pointTime: String, startCol: String, endCol: String,
                bucketMs: Long, maxFanout: Int = 100000): DataFrame = {
    require(bucketMs > 0, s"bucketMs must be positive, got $bucketMs")
    val bUs = lit(bucketMs * 1000L)
    def bucketOf(c: Column) = floor(unix_micros(c) / bUs).cast(LongType)
    val p = points.withColumn("__b", bucketOf(col(pointTime)))
    // fail FAST with the offending span rather than letting one dirty
    // interval (sentinel end date, swapped bounds) build a giant
    // sequence() array and OOM an executor deep into a 100 TB job.
    // abs(): sequence(bs, be) with be < bs builds a DESCENDING array of
    // |span| elements, so swapped bounds are just as explosive
    val bs = bucketOf(col(startCol)); val be = bucketOf(col(endCol))
    val guarded = when(abs(be - bs) > maxFanout, raise_error(concat(
        lit(s"rangeJoin: interval spans more than $maxFanout buckets of ${bucketMs}ms ("),
        (be - bs).cast("string"), lit(") — raise bucketMs/maxFanout or filter the row"))))
      .otherwise(sequence(bs, be))
    val iv = intervals.withColumn("__b", explode(guarded))
    p.join(iv, keys :+ "__b")
      .filter(col(startCol) <= col(pointTime) && col(pointTime) <= col(endCol))
      .drop("__b")
  }
}
