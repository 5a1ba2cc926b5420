package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming extension (SURVEY §2.10 — the reference has NO
  * streaming at all; this is the Spark-first capability the `events`
  * fixture exists for). Transform functions are written against plain
  * DataFrames so the exact same code path serves batch (`spark.read`) and
  * streaming (`spark.readStream`) inputs — the Structured Streaming
  * contract.
  */
object EventStreams {

  /** Tumbling-window counts+sums per event type with a watermark for
    * state cleanup. Works on batch and streaming frames alike.
    */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      // decimal sum: `value` is an exact 2-decimal metric — decimal keeps
      // the aggregate order-independent (and oracle-matchable)
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
  }

  /** Per-window PSI drift monitor: scores each event-time window of a
    * live stream against a FROZEN reference histogram
    * ([[graft.stats.Stats.histogramSpec]], computed once at train/publish
    * time) — the standard serve-time input-drift alarm. Output one row
    * per window: (window_start, n_events, psi, drifted).
    *
    * Batch == stream: the same code path serves both (the module
    * contract). Streaming-safe by construction — the whole computation is
    * ONE windowed aggregation (the per-bin counts are conditional
    * aggregates, not a second groupBy), so it runs in append mode with a
    * watermark and never needs chained stateful operators. State per
    * window is nBins+1 longs — config-sized regardless of event volume.
    *
    * PSI convention matches [[graft.stats.Stats.psiDrift]]: eps-floored
    * proportions, reference-derived bins, out-of-range values clamped
    * into the edge bins (a range excursion reads as edge-bin drift, not
    * dropped rows). NULL values are excluded. `drifted` applies the
    * standard > 0.25 "major shift" alarm unless overridden.
    */
  def psiMonitor(events: DataFrame, valueCol: String,
                 spec: graft.stats.Stats.HistogramSpec,
                 windowLen: String = "1 hour", watermark: String = "2 hours",
                 alertThreshold: Double = 0.25,
                 eps: Double = 1e-6): DataFrame = {
    require(eps > 0.0, s"psiMonitor: eps must be positive, got $eps")
    val nBins = spec.pct.length
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    val bin = least(greatest(
        floor((col(valueCol).cast("double") - spec.lo) / spec.width), lit(0L)),
      lit(nBins - 1L))
    val aggs = count(lit(1)).as("n_events") +:
      (0 until nBins).map(i =>
        sum(when(col("__bin") === i, 1L).otherwise(0L)).as(s"__b$i"))
    val counted = src.na.drop(Seq(valueCol))
      .select(col("ts"), bin.as("__bin"))
      .groupBy(window(col("ts"), windowLen).as("w"))
      .agg(aggs.head, aggs.tail: _*)
    // reference proportions fold in as literals — the PSI is a flat,
    // codegen'd projection over the nBins count columns
    val psi = (0 until nBins).map { i =>
      val r = lit(math.max(spec.pct(i), eps))
      val p = greatest(
        col(s"__b$i").cast("double") / col("n_events").cast("double"), lit(eps))
      (p - r) * log(p / r)
    }.reduce(_ + _)
    counted.select(col("w.start").as("window_start"), col("n_events"),
        psi.as("psi"))
      .withColumn("drifted", col("psi") > alertThreshold)
  }

  /** Sliding-window per-user activity rate. */
  def slidingUserActivity(events: DataFrame, windowLen: String = "1 hour",
                          slide: String = "15 minutes"): DataFrame =
    events.groupBy(window(col("ts"), windowLen, slide).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("user_id"), col("n_events"))

  final case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                            event_type: String, value: Double)
  final case class SessionState(start: Long, lastSeen: Long, nEvents: Long)
  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                              session_end: java.sql.Timestamp, n_events: Long)

  /** Stream-static enrichment: join a (streaming or batch) event frame
    * to a static dimension table. On a stream this is Structured
    * Streaming's stream-static join — the dimension is re-read per
    * micro-batch (picking up slowly-changing updates) and joined
    * map-side when it broadcasts; no state is kept. Same code path for
    * batch, per this module's batch==stream contract.
    */
  def enrichEvents(events: DataFrame, dim: DataFrame,
                   on: Seq[String], joinType: String = "left_outer"): DataFrame =
    events.join(dim, on, joinType)

  /** Stream-stream interval join: pair left rows with right rows that
    * share the equality keys and fall inside the event-time window
    * `[leftTs + lowerMs, leftTs + upperMs]` (clicks → purchases within
    * 30 min, impressions → conversions, …). On two streaming frames this
    * is Structured Streaming's watermarked stream-stream join — the
    * range condition on the two event-time columns is what lets the
    * engine BOUND the join state (each side's buffered rows are evicted
    * once the other side's watermark passes the interval), so state
    * stays O(watermark window), not O(stream). The same code path
    * serves batch frames per this module's batch==stream contract,
    * where it degrades to a plain range-predicate equi-join.
    *
    * The two time columns must be named differently (alias one side) —
    * the joined frame carries both, and downstream range predicates
    * would otherwise be ambiguous. Equality-key columns are emitted
    * once: from the left side for inner/left joins, and as
    * `coalesce(left, right)` for right/full outer joins, where an
    * unmatched right row would otherwise surface with NULL keys.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   lowerMs: Long, upperMs: Long,
                   leftWatermark: String = "1 hour",
                   rightWatermark: String = "1 hour",
                   joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "intervalJoin requires at least one equality key")
    require(lowerMs <= upperMs,
      s"empty interval: lowerMs $lowerMs > upperMs $upperMs")
    require(leftTs != rightTs,
      "left and right time columns must have distinct names (alias one side)")
    // shared NON-key names would emit twice and make every downstream
    // reference ambiguous — refuse at plan build, not first use. The ts
    // columns get NO exemption (r14 review): a right frame that also
    // carries leftTs (the keep-the-original-column self-join shape)
    // would emit two "leftTs" output columns like any other duplicate.
    val shared = left.columns.toSet.intersect(right.columns.toSet)
      .diff(keys.toSet)
    require(shared.isEmpty,
      s"intervalJoin: columns ${shared.mkString(", ")} exist on BOTH sides but are not " +
        "equality keys — the joined frame would carry duplicate names; alias one side")
    val l = if (left.isStreaming) left.withWatermark(leftTs, leftWatermark) else left
    val r = if (right.isStreaming) right.withWatermark(rightTs, rightWatermark) else right
    // explicit side aliases: dataset-column references (`l(k)`) are
    // ambiguous when both sides derive from the SAME frame (clicks
    // joined to clicks), which is the common self-join shape here
    def lc(c: String) = col(s"__ij_l.`$c`")
    def rc(c: String) = col(s"__ij_r.`$c`")
    def plus(c: org.apache.spark.sql.Column, ms: Long) =
      if (ms >= 0) c + expr(s"INTERVAL '$ms' MILLISECOND")
      else c - expr(s"INTERVAL '${-ms}' MILLISECOND")
    val cond = keys.map(k => lc(k) === rc(k)).reduce(_ && _) &&
      rc(rightTs) >= plus(lc(leftTs), lowerMs) &&
      rc(rightTs) <= plus(lc(leftTs), upperMs)
    val rightPreserving =
      Set("right", "rightouter", "right_outer", "full", "fullouter", "full_outer", "outer")
        .contains(joinType.toLowerCase)
    val outCols = l.columns.map { c =>
      if (keys.contains(c) && rightPreserving) coalesce(lc(c), rc(c)).as(c)
      else lc(c).as(c)
    } ++ r.columns.filterNot(keys.contains).map(c => rc(c).as(c))
    l.as("__ij_l").join(r.as("__ij_r"), cond, joinType).select(outCols.toSeq: _*)
  }

  /** Exact dedup for event streams: drop re-deliveries of the same key.
    * On a streaming frame, state is scoped to the watermark horizon
    * (`dropDuplicatesWithinWatermark`) — a plain `dropDuplicates` would
    * grow its state forever on an unbounded source. The batch path is the
    * semantically-matching `dropDuplicates`. At-least-once sources
    * (Kafka, replayed logs) get exactly-once row semantics downstream.
    */
  def dedupEvents(events: DataFrame, idCols: Seq[String],
                  watermark: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(idCols)
    else events.dropDuplicates(idCols)

  /** STREAMING session window: event-time state with a watermark. Open
    * sessions live in GroupState between micro-batches; a session is
    * emitted when a later event exceeds the gap, or when the watermark
    * passes lastSeen+gap (EventTimeTimeout) — the production shape for
    * unbounded sources, where [[sessionize]]'s trailing flush would be
    * wrong (the "trailing" session may still grow).
    *
    * At scale this is one hash-shuffle on user_id per micro-batch and
    * O(open sessions) state, bounded by the watermark's state eviction.
    */
  def sessionizeStreaming(events: Dataset[EventRow], gapMs: Long,
                          watermarkDelay: String = "0 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(uid, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.lastSeen), s.nEvents))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var st = state.getOption.orNull
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              st match {
                case null => st = SessionState(t, t, 1)
                case s if t - s.lastSeen > gapMs =>
                  out += SessionOut(uid, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.lastSeen), s.nEvents)
                  st = SessionState(t, t, 1)
                case s =>
                  // min/max, NOT assignment: with watermarkDelay > 0 a
                  // later micro-batch may deliver an event older than
                  // lastSeen (or before start) — moving lastSeen backward
                  // would shrink the timeout and corrupt session_end
                  st = SessionState(math.min(s.start, t), math.max(s.lastSeen, t),
                    s.nEvents + 1)
              }
            }
            if (st != null) {
              // keep the open session in state; the timeout (or a later
              // batch) will close it
              state.update(st)
              // FlatMapGroupsWithStateExec pre-filters rows behind the
              // watermark, so surviving events have ts >= watermark and
              // lastSeen+gap+1 is normally in the future — but a timeout
              // in the past is an IllegalArgumentException that kills the
              // whole query, so clamp defensively anyway
              state.setTimeoutTimestamp(
                math.max(st.lastSeen + gapMs + 1, state.getCurrentWatermarkMs + 1))
            }
            out.iterator
          }
      }
  }

  /** BATCH session window: gap-based sessions as two window passes —
    * lag() marks session starts, a running sum numbers them, one grouped
    * aggregate emits (start, end, n). Same semantics as
    * [[sessionizeTyped]] (every session emitted, trailing one included),
    * but the whole plan is codegen'd Tungsten rows: no object
    * ser/deser per row, and a hot user key SPILLS through the window
    * sort instead of buffering the group in memory the way
    * `flatMapGroupsWithState` must. The window and the aggregate share
    * one hash partitioning on user_id — a single shuffle end to end.
    */
  def sessionize(events: Dataset[EventRow], gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val numbered = events.toDF()
      .withColumn("__prev", lag(col("ts"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          unix_millis(col("ts")) - unix_millis(col("__prev")) > gapMs, 1L)
          .otherwise(0L))
      .withColumn("__sess", sum(col("__new")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    numbered.groupBy(col("user_id"), col("__sess"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .as[SessionOut]
  }

  final case class FunnelState(depth: Int, ts: Long, id: Long)
  final case class FunnelHit(user_id: Long, step_idx: Int, step: String,
                             ts: java.sql.Timestamp)

  /** STREAMING conversion funnel — the unbounded-source counterpart of
    * `TimeSeries.funnel`: per user, greedily match `steps` in order and
    * EMIT a [[FunnelHit]] the moment a step is reached (append-mode
    * safe: depth is monotone, so each (user, step) emits at most once).
    * Per-step reach counts are then a downstream streaming aggregate of
    * this hit stream.
    *
    * Semantics vs the batch operator: within a micro-batch, events fold
    * in (ts, event_id) order, and a step matches only strictly after
    * the previous step's match position — identical to batch on an
    * in-order feed. ACROSS micro-batches the match is
    * arrival-constrained: an event that arrives after a later-timed
    * event has already advanced the funnel cannot retroactively produce
    * the earlier greedy match (depth never rewinds) — the same
    * watermark-order contract as [[sessionizeStreaming]]'s session
    * boundaries. Size `watermarkDelay` to the source's disorder.
    *
    * State is one (depth, position) triple per user who has matched at
    * least step 1 — INCLUDING completed users, whose full-depth state is
    * the tombstone that stops a later event from restarting their funnel
    * and re-emitting step hits (the at-most-once-per-(user, step)
    * contract a downstream reach count depends on). `abandonAfterMs`
    * evicts BOTH stalled and completed users once the WATERMARK passes
    * their last match + the horizon (event-time timeout, so state is
    * bounded by users active within the horizon, not all users ever
    * seen). The honest consequence of eviction: a user returning after
    * the horizon starts a NEW journey and re-emits from step 1 — for an
    * abandoned user that is the restart you want, for a completed user
    * it counts a genuine second journey; size the horizon to the
    * product's notion of "one journey". Null-timestamp events are
    * dropped (the batch operator's na.drop contract).
    */
  def funnelStreaming(events: Dataset[EventRow], steps: Seq[String],
                      watermarkDelay: String = "0 seconds",
                      abandonAfterMs: Long = 24L * 3600 * 1000): Dataset[FunnelHit] = {
    require(steps.nonEmpty, "funnelStreaming: need at least one step")
    require(steps.distinct.size == steps.size,
      s"funnelStreaming: duplicate steps ${steps.diff(steps.distinct).distinct}")
    require(abandonAfterMs > 0, "funnelStreaming: abandonAfterMs must be positive")
    import events.sparkSession.implicits._
    val stepArr = steps.toArray
    events
      .filter(col("ts").isNotNull) // batch funnel's na.drop; null.getTime NPEs the query
      .filter(col("event_type").isin(steps.map(lit): _*))
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, rows, state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // past the horizon — stalled (abandoned) or completed
            // (journey closed): drop state either way
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var st = state.getOption.getOrElse(
              FunnelState(0, Long.MinValue, Long.MinValue))
            val out = scala.collection.mutable.ArrayBuffer.empty[FunnelHit]
            sorted.foreach { e =>
              if (st.depth < stepArr.length) {
                val t = e.ts.getTime
                val after = t > st.ts || (t == st.ts && e.event_id > st.id)
                if (after && e.event_type == stepArr(st.depth)) {
                  st = FunnelState(st.depth + 1, t, e.event_id)
                  out += FunnelHit(uid, st.depth, stepArr(st.depth - 1), e.ts)
                }
              }
            }
            if (st.depth > 0) {
              // completed users KEEP their full-depth state until the
              // horizon: removing it immediately let a later event match
              // step 0 again and re-emit hits, double-counting the user
              // in any downstream reach aggregate (r14 review)
              state.update(st)
              state.setTimeoutTimestamp(
                math.max(st.ts + abandonAfterMs, state.getCurrentWatermarkMs + 1))
            }
            // depth 0: no state — users who never hit step 1 cost nothing
            out.iterator
          }
      }
  }

  /** The typed stateful formulation of [[sessionize]] (per-group fold via
    * `flatMapGroupsWithState`, NoTimeout, trailing flush) — kept as the
    * semantic cross-check for the window version and the single-group
    * reference for [[sessionizeStreaming]]'s state logic. Prefer
    * [[sessionize]] for batch work: this path deserializes every row and
    * holds each user's events in memory.
    */
  def sessionizeTyped(events: Dataset[EventRow], gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[SessionState]) =>
          // batch-style arrival: process rows in time order, emitting a
          // session whenever the gap is exceeded
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          sorted.foreach { e =>
            val t = e.ts.getTime
            st match {
              case null => st = SessionState(t, t, 1)
              case s if t - s.lastSeen > gapMs =>
                out += SessionOut(uid, new java.sql.Timestamp(s.start),
                  new java.sql.Timestamp(s.lastSeen), s.nEvents)
                st = SessionState(t, t, 1)
              case s => st = SessionState(s.start, t, s.nEvents + 1)
            }
          }
          if (st != null) {
            // flush the trailing session too (batch semantics; a streaming
            // deployment would keep it in state until timeout)
            out += SessionOut(uid, new java.sql.Timestamp(st.start),
              new java.sql.Timestamp(st.lastSeen), st.nEvents)
            state.remove()
          }
          out.iterator
      }
  }
}
