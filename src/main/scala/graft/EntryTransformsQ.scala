package graft

import graft.core.{DDF, DDFManager}
import graft.operators._
import graft.stats.{Sketches, Stats}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import EntryShared._

/** SparkEntry query rows — transform / scale / window / events rows (q60-q65, q92-q99). Split from SparkEntry.scala by family
  * (r15 verdict ask #7); composed into the pinned registry by
  * [[SparkEntry.queries]].
  */
private[graft] object EntryTransformsQ {

  // =====================================================================
  // §2.11 Transforms + window extensions
  // =====================================================================

  val qs: Seq[Q] = Seq(
    Q("q60_transform_udf",
      (s, d) => {
        val m = mgr(s, d)
        // all factors are exact 2-decimal → 6-decimal exact product in
        // decimal arithmetic; double round() would tie-break differently
        // per engine
        Transforms.transformUDF(m.getDDFByName("lineitem"), "profit",
          """cast(cast(l_extendedprice as decimal(10,2))
            | * cast(1 - l_discount as decimal(4,2))
            | * cast(1 + l_tax as decimal(4,2)) as double)""".stripMargin)
          .df.select("l_orderkey", "l_linenumber", "profit")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  cast(cast(l_extendedprice AS decimal(10,2))
             |   * cast(1 - l_discount AS decimal(4,2))
             |   * cast(1 + l_tax AS decimal(4,2)) AS double) AS profit
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("q61_scale_minmax",
      (s, d) => {
        val m = mgr(s, d)
        val li = m.register(m.getDDFByName("lineitem").df
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"))
        Transforms.scaleMinMax(li, Seq("l_quantity", "l_extendedprice"))
          .df.select(col("l_orderkey"), col("l_linenumber"),
            round(col("l_quantity"), 6).as("qty_s"),
            round(col("l_extendedprice"), 6).as("price_s"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""WITH mm AS (SELECT cast(min(l_quantity) AS double) AS qmn,
             |  cast(max(l_quantity) AS double) AS qmx,
             |  cast(min(l_extendedprice) AS double) AS pmn,
             |  cast(max(l_extendedprice) AS double) AS pmx FROM lineitem)
             |SELECT l_orderkey, l_linenumber,
             |  round((l_quantity - qmn) / (qmx - qmn), 6) AS qty_s,
             |  round((l_extendedprice - pmn) / (pmx - pmn), 6) AS price_s
             |FROM lineitem, mm ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("q62_window_rank",
      (s, d) => {
        val m = mgr(s, d)
        m.sql2ddf(
          """select o_orderstatus, o_orderkey, o_totalprice, rk from (
            |  select o_orderstatus, o_orderkey, o_totalprice,
            |    row_number() over (partition by o_orderstatus
            |                       order by o_totalprice desc, o_orderkey) as rk
            |  from orders) where rk <= 3
            |order by o_orderstatus, rk""".stripMargin).df
      },
      Some("""SELECT o_orderstatus, o_orderkey, o_totalprice, rk FROM (
             |  SELECT o_orderstatus, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_orderstatus
             |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
             |  FROM orders) WHERE rk <= 3
             |ORDER BY o_orderstatus, rk""".stripMargin)),

    Q("q63_window_runsum",
      (s, d) => {
        val m = mgr(s, d)
        // running sum over exact decimals → deterministic in both engines
        m.sql2ddf(
          """select o_custkey, o_orderkey,
            |  cast(sum(cast(o_totalprice as decimal(18,2)))
            |    over (partition by o_custkey order by o_orderkey) as double) as run_total
            |from orders order by o_custkey, o_orderkey""".stripMargin).df
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  cast(sum(cast(o_totalprice AS decimal(18,2)))
             |    OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS double) AS run_total
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),

    Q("q64_events_hourly",
      (s, d) => {
        val m = mgr(s, d)
        m.getDDFByName("events").df
          .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .orderBy("hour_epoch", "event_type")
      },
      Some(s"""SELECT cast(epoch(date_trunc('hour', ts)) AS bigint) AS hour_epoch,
              |  event_type, count(*) AS n, ${dsumSql("value")} AS sum_value
              |FROM events GROUP BY 1, 2 ORDER BY hour_epoch, event_type""".stripMargin)),

    Q("ts01_resample_gapfill",
      (s, d) => {
        // fixed 6 h buckets per user, densified over each user's own
        // [min, max] span — gap buckets carry n=0 / null sum
        val ev = loadEvents(s, d).where(col("user_id") < 5)
        TimeSeries.resample(ev, "ts", Seq("user_id"), 21600L,
          Seq("sum_v" -> dsum(col("value"))))
          .orderBy("user_id", "bucket")
      },
      Some(s"""WITH pb AS (
              |  SELECT user_id, (to_timestamp(floor(epoch(ts) / 21600) * 21600))::TIMESTAMP AS bucket,
              |         count(*) AS n, ${dsumSql("value")} AS sum_v
              |  FROM events WHERE user_id < 5 GROUP BY 1, 2),
              |spine AS (
              |  SELECT user_id,
              |    unnest(generate_series(min(bucket), max(bucket),
              |                           INTERVAL '21600 seconds')) AS bucket
              |  FROM pb GROUP BY user_id)
              |SELECT s.user_id, s.bucket, coalesce(pb.n, 0) AS n, pb.sum_v
              |FROM spine s LEFT JOIN pb USING (user_id, bucket)
              |ORDER BY user_id, bucket""".stripMargin)),

    Q("ts02_interpolate",
      (s, d) => {
        // densify per-user 6 h max(value), then linear-interpolate the
        // gap buckets; edges clamp to the nearest observation
        val ev = loadEvents(s, d).where(col("user_id") < 5)
        val dense = TimeSeries.resample(ev, "ts", Seq("user_id"), 21600L,
          Seq("v" -> max(col("value"))))
        TimeSeries.interpolate(dense, "bucket", Seq("user_id"), "v", "v_i")
          .select("user_id", "bucket", "v_i")
          .orderBy("user_id", "bucket")
      },
      Some("""WITH pb AS (
             |  SELECT user_id, (to_timestamp(floor(epoch(ts) / 21600) * 21600))::TIMESTAMP AS bucket,
             |         max(value) AS v
             |  FROM events WHERE user_id < 5 GROUP BY 1, 2),
             |spine AS (
             |  SELECT user_id,
             |    unnest(generate_series(min(bucket), max(bucket),
             |                           INTERVAL '21600 seconds')) AS bucket
             |  FROM pb GROUP BY user_id),
             |dense AS (
             |  SELECT s.user_id, s.bucket, pb.v
             |  FROM spine s LEFT JOIN pb USING (user_id, bucket)),
             |i AS (
             |  SELECT user_id, bucket, v,
             |    last_value(v IGNORE NULLS) OVER w_back AS pv,
             |    last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
             |      OVER w_back AS pt,
             |    first_value(v IGNORE NULLS) OVER w_fwd AS nv,
             |    first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
             |      OVER w_fwd AS nt
             |  FROM dense WINDOW
             |    w_back AS (PARTITION BY user_id ORDER BY bucket
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |    w_fwd AS (PARTITION BY user_id ORDER BY bucket
             |              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |SELECT user_id, bucket,
             |  CASE WHEN v IS NOT NULL THEN v
             |       WHEN pv IS NULL THEN nv
             |       WHEN nv IS NULL THEN pv
             |       ELSE pv + (nv - pv) *
             |            ((epoch(bucket) - epoch(pt)) / (epoch(nt) - epoch(pt)))
             |  END AS v_i
             |FROM i ORDER BY user_id, bucket""".stripMargin)),

    Q("h01_scd2",
      (s, d) => {
        // per-user event_type validity intervals — point-in-time feature
        // history; tie on event_id gives the window a total order
        val ev = loadEvents(s, d).where(col("user_id") < 3)
        History.scd2(ev, Seq("user_id"), "ts", Seq("event_type"), Seq("event_id"))
          .orderBy("user_id", "valid_from")
      },
      Some("""WITH e AS (SELECT user_id, ts, event_type, event_id
             |  FROM events WHERE user_id < 3),
             |m AS (SELECT *, CASE WHEN event_type IS DISTINCT FROM
             |    lag(event_type) OVER w THEN 1 ELSE 0 END AS chg
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg FROM m),
             |g AS (SELECT user_id, seg, min(ts) AS valid_from,
             |    min(event_type) AS event_type
             |  FROM s GROUP BY user_id, seg)
             |SELECT user_id, event_type, valid_from,
             |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY seg)
             |    AS valid_to
             |FROM g ORDER BY user_id, valid_from""".stripMargin)),

    Q("h02_cdc_apply",
      (s, d) => {
        val m = mgr(s, d)
        // fold the order feed into customer state: latest order per
        // customer wins; status 'P' deletes; untouched customers keep
        // their base balance. One shuffle over base ∪ changes, no join.
        val base = m.getDDFByName("customer").df
          .select(col("c_custkey").as("k"), col("c_acctbal").as("v"))
        val changes = m.getDDFByName("orders").df
          .select(col("o_custkey").as("k"), col("o_totalprice").as("v"),
            col("o_orderdate").as("t"),
            when(col("o_orderstatus") === "P", "D").otherwise("U").as("op"),
            col("o_orderkey").as("seq"))
        History.cdcApply(base, changes, Seq("k"), Seq("v"), "t", "op", Seq("seq"))
          .orderBy("k")
      },
      Some("""WITH b AS (SELECT c_custkey AS k, c_acctbal AS v,
             |    NULL AS t, 'B' AS op, NULL AS seq FROM customer),
             |c AS (SELECT o_custkey AS k, o_totalprice AS v, o_orderdate AS t,
             |    CASE WHEN o_orderstatus = 'P' THEN 'D' ELSE 'U' END AS op,
             |    o_orderkey AS seq FROM orders),
             |u AS (SELECT * FROM b UNION ALL SELECT * FROM c),
             |r AS (SELECT *, row_number() OVER (PARTITION BY k
             |    ORDER BY t DESC NULLS LAST, seq DESC NULLS LAST) AS rn FROM u)
             |SELECT k, v FROM r WHERE rn = 1 AND op != 'D' ORDER BY k""".stripMargin)),

    Q("h03_asof_lookup",
      (s, d) => {
        // point-in-time feature: the event_type regime each user was in
        // 3 HOURS BEFORE each event — joins the scd2 interval table, so
        // no future leaks into the feature
        val ev = loadEvents(s, d).where(col("user_id") < 3)
        val hist = History.scd2(ev, Seq("user_id"), "ts",
          Seq("event_type"), Seq("event_id"))
        val facts = ev.select(col("user_id"), col("event_id"),
          (col("ts") - expr("INTERVAL 3 HOURS")).as("t3"))
        History.asOfLookup(facts, hist, Seq("user_id"), "t3")
          .select(col("user_id"), col("event_id"),
            col("event_type").as("regime_3h_ago"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH e AS (SELECT user_id, ts, event_type, event_id
             |  FROM events WHERE user_id < 3),
             |m AS (SELECT *, CASE WHEN event_type IS DISTINCT FROM
             |    lag(event_type) OVER w THEN 1 ELSE 0 END AS chg
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg FROM m),
             |g AS (SELECT user_id, seg, min(ts) AS valid_from,
             |    min(event_type) AS event_type
             |  FROM s GROUP BY user_id, seg),
             |h AS (SELECT user_id, event_type, valid_from,
             |    lead(valid_from) OVER (PARTITION BY user_id ORDER BY seg) AS valid_to
             |  FROM g),
             |f AS (SELECT user_id, event_id, ts - INTERVAL 3 HOUR AS t3 FROM e)
             |SELECT f.user_id, f.event_id, h.event_type AS regime_3h_ago
             |FROM f LEFT JOIN h ON f.user_id = h.user_id
             |  AND f.t3 >= h.valid_from
             |  AND (h.valid_to IS NULL OR f.t3 < h.valid_to)
             |ORDER BY f.user_id, f.event_id""".stripMargin)),

    Q("ts04_interval_merge",
      (s, d) => {
        // per-user activity coverage: each event claims [ts, ts+30 min);
        // intervalMerge unions them into disjoint activity spans (the
        // session-stitching / uptime primitive). Output in epoch millis
        // so the hash compare is timestamp-dialect-proof (e02's choice).
        // Exact-tie rows are interchangeable, so the window construction
        // is permutation-invariant — replayed verbatim in DuckDB.
        val ev = loadEvents(s, d)
          .select(col("user_id"), col("ts").as("s"),
            (col("ts") + expr("INTERVAL 30 MINUTES")).as("e"))
        TimeSeries.intervalMerge(ev, Seq("user_id"), "s", "e")
          .select(col("user_id"),
            unix_millis(col("start")).as("start_ms"),
            unix_millis(col("end")).as("end_ms"), col("n_merged"))
          .orderBy("user_id", "start_ms")
      },
      Some("""WITH iv AS (SELECT user_id, ts AS s,
             |    ts + INTERVAL 30 MINUTE AS e FROM events),
             |w AS (SELECT user_id, s, e,
             |    max(e) OVER (PARTITION BY user_id ORDER BY s, e
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
             |  FROM iv),
             |o AS (SELECT *, CASE WHEN pmax IS NULL OR s > pmax
             |    THEN 1 ELSE 0 END AS opened FROM w),
             |sp AS (SELECT *, sum(opened) OVER (PARTITION BY user_id
             |    ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span
             |  FROM o)
             |SELECT user_id, epoch_ms(min(s))::BIGINT AS start_ms,
             |  epoch_ms(max(e))::BIGINT AS end_ms, count(*)::BIGINT AS n_merged
             |FROM sp GROUP BY user_id, span
             |ORDER BY user_id, start_ms""".stripMargin)),

    Q("ts03_rolling_window",
      (s, d) => {
        // per-event trailing-6h features (RANGE frame over microsecond
        // event time, closed boundary) — one row per event, one Window
        val ev = loadEvents(s, d).where(col("user_id") < 3)
        TimeSeries.rollingAgg(ev, "ts", Seq("user_id"), 21600L,
          Seq("roll_sum" -> sum(col("value").cast("decimal(18,2)")),
            "roll_n" -> count(lit(1))))
          .select(col("user_id"), col("event_id"),
            col("roll_sum").cast("double").as("roll_sum"), col("roll_n"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
              |  cast(sum(cast(value as decimal(18,2))) OVER w as double) AS roll_sum,
              |  count(*) OVER w AS roll_n
              |FROM events WHERE user_id < 3
              |WINDOW w AS (PARTITION BY user_id ORDER BY ts
              |  RANGE BETWEEN INTERVAL '21600 seconds' PRECEDING AND CURRENT ROW)
              |ORDER BY user_id, event_id""".stripMargin))
  )
}
