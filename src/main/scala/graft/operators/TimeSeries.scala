package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling and gap repair (extension — the reference has no
  * temporal operators at all; its closest surface is plain GROUP BY over a
  * timestamp column, SqlHandler.scala). A training-data pipeline needs
  * these for event-stream feature tables: fixed-interval densification so
  * every (key, bucket) exists, then interpolation so models never see
  * accidental nulls.
  *
  * Scale shape (100 TB): [[resample]] is one hash aggregate over the raw
  * events (shuffle O(keys × occupied buckets), map-side combined) plus a
  * per-key spine generated DISTRIBUTEDLY from each key's own [min, max]
  * bucket — `sequence()` explodes inside the task that owns the key, so
  * the driver never materializes a calendar and idle keys never pay for
  * the global time range. The densifying join keys on (key, bucket) —
  * both sides already hash-partitioned by the aggregate's shuffle.
  * [[interpolate]] is two window passes over the SAME (key, bucket)
  * sort order — Catalyst collapses them onto one sort, no extra shuffle.
  */
object TimeSeries {

  /** Bucket `tsCol` to `intervalSec`-second epochs:
    * floor(epoch/interval) × interval, origin = the 1970 epoch. NOTE:
    * engines differ on the bucket ORIGIN for intervals that don't
    * divide a day (DuckDB's `time_bucket` uses a 2000-01-03 origin) —
    * cross-engine comparisons must either use day-dividing intervals or
    * spell out the same floor(epoch/interval) arithmetic (the ts01/ts02
    * oracles do the latter).
    */
  def bucket(tsCol: Column, intervalSec: Long): Column =
    timestamp_seconds(floor(unix_timestamp(tsCol) / intervalSec) * intervalSec)

  /** Aggregate `df` into fixed `intervalSec` buckets per `keyCols`, then
    * densify: every key gets one row per bucket in ITS OWN [min, max]
    * span (no global calendar — a key active for one day contributes one
    * day of rows). Missing buckets carry `n = 0` and null aggregates.
    * `aggs` are (alias, aggColumn) pairs evaluated per (key, bucket).
    */
  def resample(df: DataFrame, tsCol: String, keyCols: Seq[String],
               intervalSec: Long, aggs: Seq[(String, Column)]): DataFrame = {
    require(aggs.nonEmpty, "resample() needs at least one aggregate")
    require(!aggs.exists(_._1 == "n"), "alias 'n' is reserved for the bucket count")
    val b = bucket(col(tsCol), intervalSec).as("bucket")
    val aggCols = count(lit(1)).as("n") +: aggs.map { case (a, c) => c.as(a) }
    // rows with a NULL timestamp are EXPLICITLY excluded — they have no
    // bucket, and leaving them to the null-group/spine mismatch would
    // drop them silently instead of by contract
    val perBucket = df.na.drop(Seq(tsCol)).groupBy((keyCols.map(col) :+ b): _*)
      .agg(aggCols.head, aggCols.tail: _*)
    // per-key spine: sequence() runs inside the key's task
    val spine = perBucket.groupBy(keyCols.map(col): _*)
      .agg(min("bucket").as("lo"), max("bucket").as("hi"))
      .select(keyCols.map(col) :+
        explode(sequence(col("lo"), col("hi"),
          expr(s"interval $intervalSec seconds"))).as("bucket"): _*)
    spine.join(perBucket, keyCols :+ "bucket", "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
  }

  /** Linearly interpolate nulls in `valueCol` along `bucketCol` within
    * each key: a gap between observations at t0 (v0) and t1 (v1) fills
    * with v0 + (v1 − v0) × (t − t0)/(t1 − t0). Leading/trailing gaps
    * (no observation on one side) fall back to the nearest observed
    * value; keys with no observations stay null. Two window passes over
    * one (key, bucket) sort.
    */
  def interpolate(df: DataFrame, bucketCol: String, keyCols: Seq[String],
                  valueCol: String, outCol: String): DataFrame = {
    val back = Window.partitionBy(keyCols.map(col): _*).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(keyCols.map(col): _*).orderBy(col(bucketCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    val obsT = when(v.isNotNull, col(bucketCol))
    val prevV = last(v, ignoreNulls = true).over(back)
    val prevT = last(obsT, ignoreNulls = true).over(back)
    val nextV = first(v, ignoreNulls = true).over(fwd)
    val nextT = first(obsT, ignoreNulls = true).over(fwd)
    // integer-second epochs: the ratio is exact double division, so the
    // result is bit-identical to any engine evaluating the same formula
    val frac = (unix_timestamp(col(bucketCol)) - unix_timestamp(prevT)).cast("double") /
      (unix_timestamp(nextT) - unix_timestamp(prevT)).cast("double")
    val filled = when(v.isNotNull, v)
      .when(prevV.isNull, nextV)
      .when(nextV.isNull, prevV)
      .otherwise(prevV + (nextV - prevV) * frac)
    df.withColumn(outCol, filled)
  }

  /** Rolling event-time aggregates: for every row, aggregate the
    * trailing `windowSec` seconds of ITS key (RANGE frame over
    * microsecond event time — peers at the exact boundary included, the
    * same closed interval DuckDB/ANSI `RANGE INTERVAL PRECEDING` uses).
    * `aggs` are (alias, aggregate-Column) pairs; the window is applied
    * here so callers pass plain `sum(...)`/`count(...)`/`max(...)`.
    *
    * One hash-shuffle on the keys + one sort — every agg shares the same
    * window spec, so Catalyst evaluates them all in a single Window exec.
    * Unlike [[resample]] this emits one row PER EVENT (features joined
    * back to the event, e.g. "user's 6 h activity at click time"), not
    * per bucket.
    */
  def rollingAgg(df: DataFrame, tsCol: String, keyCols: Seq[String],
                 windowSec: Long, aggs: Seq[(String, Column)]): DataFrame = {
    require(aggs.nonEmpty, "rollingAgg() needs at least one aggregate")
    // empty keys = unpartitioned window = one sort task for the whole
    // dataset (the asofJoin/History guard; r14 review)
    require(keyCols.nonEmpty,
      "rollingAgg: need at least one key column (an unpartitioned rolling " +
        "window would sort everything in one task — add a constant key " +
        "column deliberately for a single global series)")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowSec * 1000000L, 0L)
    aggs.foldLeft(df) { case (d, (a, c)) => d.withColumn(a, c.over(w)) }
  }

  /** Merge overlapping-or-touching [start, end) intervals per key into
    * their disjoint union — session stitching, data-coverage maps, SLA
    * uptime windows. Output: key columns + (start, end, n_merged),
    * where n_merged counts the source intervals a merged span absorbed.
    *
    * Construction (the scd2 single-shuffle shape): within each key,
    * order by (start, end); an interval OPENS a new span iff its start
    * exceeds the running max end of every predecessor; the run-sum of
    * open flags is the span id; one groupBy((key, span)) emits the
    * union. ONE key-shuffle feeds both windows and the aggregate —
    * scale cost is a per-key sort, never a global one. Zero- or
    * negative-length and NULL-endpoint intervals are rejected rows —
    * dropped, with the semantics documented here rather than guessed.
    */
  def intervalMerge(df: DataFrame, keyCols: Seq[String],
                    startCol: String, endCol: String): DataFrame = {
    require(keyCols.nonEmpty, "intervalMerge: need at least one key column")
    val ks = keyCols.map(col)
    val ord = Window.partitionBy(ks: _*)
      .orderBy(col(startCol), col(endCol))
    val valid = df.na.drop(Seq(startCol, endCol))
      .filter(col(endCol) > col(startCol))
    valid
      // running max end over STRICT predecessors (exclude self: an
      // interval must not suppress its own open flag)
      .withColumn("__pmax", max(col(endCol)).over(
        ord.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__open",
        when(col("__pmax").isNull || col(startCol) > col("__pmax"), 1L)
          .otherwise(0L))
      .withColumn("__span", sum(col("__open")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(ks :+ col("__span"): _*)
      .agg(min(col(startCol)).as("start"), max(col(endCol)).as("end"),
        count(lit(1)).as("n_merged"))
      .drop("__span")
  }

  /** Ordered-step funnel over an event log (extension — event analytics
    * the reference's GROUP BY surface can't express): for each entity,
    * greedily match `steps` in order — step i matches at the EARLIEST
    * event of that type strictly after step i-1's match in the
    * (`tsCol`, `idCol`) total order (`idCol` must be unique, so ties
    * at the same timestamp are deterministic). Returns one row per step:
    * `(step_idx, step, reached)` where `reached` counts entities whose
    * greedy match got at least that far — the classic conversion funnel.
    *
    * Shape: filter to the step types (pushed to the scan — non-step
    * events never leave it), ONE hash shuffle on `entityCol`, per-entity
    * `sort_array(collect_list(...))` + an `aggregate` HOF fold to the
    * depth reached (all inside the task that owns the entity — same
    * per-entity grain and skew contract as sessionize/s01), then a tiny
    * global roll-up of the per-entity depths (|entities| rows) into K
    * counts. No windows, no self-joins, no K-pass re-scans. Per-entity
    * memory is its OWN step-typed event count; a pathological bot entity
    * is the same hazard class as in sessionize and is the caller's
    * pre-filter to apply.
    */
  def funnel(df: DataFrame, entityCol: String, tsCol: String, idCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel: need at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel: duplicate steps ${steps.diff(steps.distinct).distinct} — " +
        "repeated step types make the greedy match ambiguous")
    val stepIdx = steps.zipWithIndex
      .map { case (s, i) => (lit(s), lit(i)) }.flatMap(p => Seq(p._1, p._2))
    val depths = df
      .filter(col(typeCol).isin(steps.map(lit): _*))
      .na.drop(Seq(entityCol, tsCol, idCol))
      .select(col(entityCol).as("__e"),
        struct(col(tsCol).as("ts"), col(idCol).as("id"),
          // literal step-label → index map, resolved per row at codegen
          element_at(map(stepIdx: _*), col(typeCol)).as("step")).as("ev"))
      .groupBy("__e")
      .agg(sort_array(collect_list(col("ev"))).as("evs"))
      // greedy fold: depth advances when the next event's step IS the
      // next step index; sorted order makes "strictly after" exact
      .select(aggregate(col("evs"), lit(0),
        (acc, ev) => when(ev.getField("step") === acc, acc + 1).otherwise(acc))
        .as("depth"))
    // coalesce: sum over ZERO entities (empty input / no step events)
    // is NULL — the funnel of an empty log is all-zero reach, not null
    val reachCols = steps.indices.map(i =>
      coalesce(sum(when(col("depth") > i, 1L).otherwise(0L)), lit(0L)).as(s"r$i"))
    val reach = depths.agg(reachCols.head, reachCols.tail: _*)
    reach.select(explode(array(steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).as("step_idx"), lit(s).as("step"),
        col(s"r$i").as("reached"))
    }: _*)).as("f")).select("f.step_idx", "f.step", "f.reached")
  }

  /** Extension (leakage-safe eval prep): ENTITY-level temporal split with
    * an embargo band — label every row 'train' / 'test' / 'embargo' by
    * its ENTITY's FIRST event time vs the cutoff, so one entity's rows
    * never straddle the boundary (a row-level `ts < cutoff` split leaks
    * entity-level signal: the same user's later behavior sits in test
    * while their earlier rows train the model). The embargo band
    * (`embargoMs` before the cutoff) is dropped from BOTH sides — the
    * purged-split discipline for serially-correlated data (de Prado,
    * "Advances in Financial Machine Learning" ch. 7): entities whose
    * history begins just before the cutoff have test-period-correlated
    * training rows. Entities with a NULL first-ts (all-null timestamps)
    * land in 'embargo' — excluded from both sides rather than silently
    * trained on — and so do rows with a NULL entity id (not an entity;
    * every input row comes back labeled, none vanish). The time twin of the cluster-aware content split
    * (`Dedup.leakageSafeSplit`, c05).
    *
    * Scale shape: one map-side-combined min-ts aggregate (output =
    * O(entities)) joined back on the entity key — broadcasts when
    * entities fit, hash-partitions otherwise; no window, no sort.
    */
  def entityTemporalSplit(df: DataFrame, entityCol: String, tsCol: String,
                          cutoff: java.sql.Timestamp,
                          embargoMs: Long = 0L): DataFrame = {
    require(embargoMs >= 0L, s"embargoMs must be >= 0, got $embargoMs")
    val embargoStart = new java.sql.Timestamp(cutoff.getTime - embargoMs)
    val firstTs = df.groupBy(col(entityCol))
      .agg(min(col(tsCol)).as("__first_ts"))
      .select(col(entityCol).as("__ent"),
        when(col(entityCol).isNull || col("__first_ts").isNull, lit("embargo"))
          .when(col("__first_ts") < lit(embargoStart), lit("train"))
          .when(col("__first_ts") < lit(cutoff), lit("embargo"))
          .otherwise(lit("test")).as("split"))
    // null-safe join: rows with a NULL entity id must still come back
    // labeled ('embargo' — not an entity, excluded from both sides), not
    // silently vanish through an inner equi-join (r14 review); groupBy
    // already pools NULL keys into one group, so <=> matches it back
    df.join(firstTs, df(entityCol) <=> firstTs("__ent")).drop("__ent")
  }
}
