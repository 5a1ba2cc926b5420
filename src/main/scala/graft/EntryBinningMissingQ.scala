package graft

import graft.core.{DDF, DDFManager}
import graft.operators._
import graft.stats.{Sketches, Stats}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import EntryShared._

/** SparkEntry query rows — binning and missing-data rows (q50-q59, q70-q71). Split from SparkEntry.scala by family
  * (r15 verdict ask #7); composed into the pinned registry by
  * [[SparkEntry.queries]].
  */
private[graft] object EntryBinningMissingQ {

  val qs: Seq[Q] = Seq(
    Q("q48_group_quantiles",
      (s, d) => {
        val m = mgr(s, d)
        // nearest-rank (percentile_disc) per group: selected data values,
        // engine-independent — no double interpolation
        Stats.groupQuantiles(m.getDDFByName("lineitem").df, "l_returnflag",
            "l_quantity", Seq(0.25, 0.5, 0.95))
          .orderBy("l_returnflag")
      },
      Some("""WITH f AS (SELECT l_returnflag, l_quantity FROM lineitem
             |  WHERE l_quantity IS NOT NULL),
             |r AS (SELECT l_returnflag, l_quantity,
             |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
             |    count(*) OVER (PARTITION BY l_returnflag) AS n FROM f)
             |SELECT l_returnflag,
             |  max(CASE WHEN rn = greatest(ceil(round(0.25 * n, 9))::BIGINT, 1) THEN l_quantity END) AS q25,
             |  max(CASE WHEN rn = greatest(ceil(round(0.5 * n, 9))::BIGINT, 1) THEN l_quantity END) AS q50,
             |  max(CASE WHEN rn = greatest(ceil(round(0.95 * n, 9))::BIGINT, 1) THEN l_quantity END) AS q95
             |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q("q49_group_mode",
      (s, d) => {
        val m = mgr(s, d)
        Stats.groupMode(m.getDDFByName("lineitem").df, "l_returnflag", "l_quantity")
          .orderBy("l_returnflag")
      },
      Some("""WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS mode_count
             |  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2),
             |r AS (SELECT l_returnflag, l_quantity, mode_count,
             |    row_number() OVER (PARTITION BY l_returnflag
             |      ORDER BY mode_count DESC, l_quantity ASC) AS rn FROM c)
             |SELECT l_returnflag, l_quantity AS mode, mode_count
             |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin)),

    Q("q97_group_quantile_gate",
      (s, d) => {
        val m = mgr(s, d)
        // per-group quantile gate: keep lineitem rows at/above their
        // returnflag's q75 extendedprice. The boundary is a nearest-rank
        // SELECTED decimal value, so the gate is engine-exact; at scale
        // the approx=true twin swaps the within-group ranking window for
        // one mergeable percentile_approx aggregate.
        Stats.filterByGroupQuantile(
            m.getDDFByName("lineitem").df
              .select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"),
            "l_extendedprice", "l_returnflag", 0.75)
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""WITH f AS (SELECT l_returnflag, l_extendedprice FROM lineitem
             |  WHERE l_extendedprice IS NOT NULL),
             |r AS (SELECT l_returnflag, l_extendedprice,
             |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
             |    count(*) OVER (PARTITION BY l_returnflag) AS n FROM f),
             |b AS (SELECT l_returnflag,
             |    max(CASE WHEN rn = greatest(ceil(round(0.75 * n, 9))::BIGINT, 1)
             |        THEN l_extendedprice END) AS cut
             |  FROM r GROUP BY l_returnflag)
             |SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, l.l_extendedprice
             |FROM lineitem l JOIN b USING (l_returnflag)
             |WHERE l.l_extendedprice >= b.cut
             |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin)),

    Q("q98_weighted_summary",
      (s, d) => {
        val m = mgr(s, d)
        // post-soft-dedup stats: rows carry fractional multiplicities
        // (here an arithmetic half-step weight — every w is an exact
        // binary fraction, so the weighted sums are order-independent)
        val li = m.getDDFByName("lineitem").df
          .withColumn("w", ((col("l_orderkey") % 5) + 1) / lit(2.0))
        Stats.weightedSummary(li, "w", Seq("l_quantity", "l_discount"))
          .select(col("column"), col("n"),
            round(col("w_total"), 6).as("w_total"),
            round(col("w_mean"), 6).as("w_mean"),
            round(col("w_var"), 6).as("w_var"),
            round(col("min"), 6).as("min"), round(col("max"), 6).as("max"))
          .orderBy("column")
      },
      Some("""WITH t AS (SELECT ((l_orderkey % 5) + 1) / 2.0 AS w,
             |    l_quantity AS q, l_discount AS dc FROM lineitem)
             |SELECT * FROM (
             |  SELECT 'l_quantity' AS "column", count(q)::BIGINT AS n,
             |    round(sum(w), 6) AS w_total,
             |    round(sum(w * q) / sum(w), 6) AS w_mean,
             |    round(sum(w * q * q) / sum(w)
             |          - (sum(w * q) / sum(w)) * (sum(w * q) / sum(w)), 6) AS w_var,
             |    round(min(q), 6) AS min, round(max(q), 6) AS max FROM t
             |  UNION ALL
             |  SELECT 'l_discount', count(dc)::BIGINT,
             |    round(sum(w), 6),
             |    round(sum(w * dc) / sum(w), 6),
             |    round(sum(w * dc * dc) / sum(w)
             |          - (sum(w * dc) / sum(w)) * (sum(w * dc) / sum(w)), 6),
             |    round(min(dc), 6), round(max(dc), 6) FROM t
             |) ORDER BY "column"""".stripMargin)),

    Q("q99_robust_scale",
      (s, d) => {
        val m = mgr(s, d)
        // median/IQR scaling (exact percentile path for oracle parity;
        // the corpus default is the mergeable percentile_approx sketch).
        // l_quantity's integral grid makes the interpolated quartiles
        // exact in both engines.
        val slim = m.getDDFByName("lineitem").derive(
          m.getDDFByName("lineitem").df
            .select("l_orderkey", "l_linenumber", "l_quantity"))
        operators.Transforms.scaleRobust(slim,
            Seq("l_quantity"), exact = true).df
          .select(col("l_orderkey"), col("l_linenumber"),
            round(col("l_quantity"), 6).as("l_quantity"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""WITH b AS (SELECT quantile_cont(l_quantity, 0.5) AS med,
             |    quantile_cont(l_quantity, 0.75) - quantile_cont(l_quantity, 0.25)
             |      AS iqr FROM lineitem)
             |SELECT l_orderkey, l_linenumber,
             |  round(CASE WHEN iqr = 0 THEN 0.0
             |             ELSE (l_quantity - med) / iqr END, 6) AS l_quantity
             |FROM lineitem, b
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("q100_percentile_blend",
      (s, d) => {
        val m = mgr(s, d)
        // multi-signal quality ensembling: rank-normalize two signals to
        // [0,1] percentile space (window-free midrank ECDF over distinct
        // values) and average — every rank is an exact rational
        val li = m.getDDFByName("lineitem").df
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        Stats.percentileRank(li, Seq("l_quantity", "l_extendedprice"))
          .select(col("l_orderkey"), col("l_linenumber"),
            round(col("l_quantity_pr"), 7).as("q_pr"),
            round(col("l_extendedprice_pr"), 7).as("p_pr"),
            // round 7, not 6: at this table's rank denominators a
            // 7-decimal tie is arithmetically impossible (10^7·x =
            // n·(2m+1) has no integer solution for n = 2·|lineitem|),
            // while a 6-decimal tie occurred and flipped engines
            round((col("l_quantity_pr") + col("l_extendedprice_pr")) / 2, 7)
              .as("blend"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""WITH q AS (SELECT l_quantity AS v, count(*) AS k FROM lineitem
             |    WHERE l_quantity IS NOT NULL GROUP BY 1),
             |qr AS (SELECT v,
             |    (coalesce(sum(k) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
             |       PRECEDING AND 1 PRECEDING), 0) + 0.5 * k)
             |      / (sum(k) OVER ()) AS pr FROM q),
             |p AS (SELECT l_extendedprice AS v, count(*) AS k FROM lineitem
             |    WHERE l_extendedprice IS NOT NULL GROUP BY 1),
             |pr2 AS (SELECT v,
             |    (coalesce(sum(k) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
             |       PRECEDING AND 1 PRECEDING), 0) + 0.5 * k)
             |      / (sum(k) OVER ()) AS pr FROM p)
             |SELECT l.l_orderkey, l.l_linenumber,
             |  round(qr.pr, 7) AS q_pr, round(pr2.pr, 7) AS p_pr,
             |  round((qr.pr + pr2.pr) / 2, 7) AS blend
             |FROM lineitem l
             |JOIN qr ON l.l_quantity = qr.v
             |JOIN pr2 ON l.l_extendedprice = pr2.v
             |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin)),

    Q("q53_drop_outliers",
      (s, d) => {
        val m = mgr(s, d)
        // Tukey fence from nearest-rank quartiles (exact path — actual
        // data values, so the fence is engine-independent)
        Stats.dropOutliersIqr(
            m.getDDFByName("events").df.select("event_id", "value"),
            "value", k = 1.5, exact = true)
          .orderBy("event_id")
      },
      Some(s"""WITH r AS (SELECT value AS v, row_number() OVER (ORDER BY value) AS rn,
              |    count(*) OVER () AS n FROM events WHERE value IS NOT NULL),
              |b AS (SELECT
              |  max(CASE WHEN rn = greatest(ceil(round(0.25 * n, 9))::BIGINT, 1) THEN v END) AS q1,
              |  max(CASE WHEN rn = greatest(ceil(round(0.75 * n, 9))::BIGINT, 1) THEN v END) AS q3 FROM r)
              |SELECT event_id, value FROM events, b
              |WHERE value >= q1 - 1.5 * (q3 - q1) AND value <= q3 + 1.5 * (q3 - q1)
              |ORDER BY event_id""".stripMargin)),

    Q("q54_clip_outliers",
      (s, d) => {
        val m = mgr(s, d)
        // winsorize: clamp into the fence instead of dropping (k = 0.5
        // so the fixture actually clips ~1.4k rows)
        Stats.clipOutliersIqr(
            m.getDDFByName("events").df.select("event_id", "value"),
            "value", k = 0.5, exact = true)
          .orderBy("event_id")
      },
      Some(s"""WITH r AS (SELECT value AS v, row_number() OVER (ORDER BY value) AS rn,
              |    count(*) OVER () AS n FROM events WHERE value IS NOT NULL),
              |b AS (SELECT
              |  max(CASE WHEN rn = greatest(ceil(round(0.25 * n, 9))::BIGINT, 1) THEN v END) AS q1,
              |  max(CASE WHEN rn = greatest(ceil(round(0.75 * n, 9))::BIGINT, 1) THEN v END) AS q3 FROM r)
              |SELECT event_id,
              |  CASE WHEN value < q1 - 0.5 * (q3 - q1) THEN q1 - 0.5 * (q3 - q1)
              |       WHEN value > q3 + 0.5 * (q3 - q1) THEN q3 + 0.5 * (q3 - q1)
              |       ELSE value END AS value
              |FROM events, b ORDER BY event_id""".stripMargin)),

    Q("q50_binning_custom",
      (s, d) => {
        val m = mgr(s, d)
        Binning.binningCustom(m.getDDFByName("lineitem"), "l_quantity",
          qBreaks, includeLowest = true, right = true)
          .df.groupBy("l_quantity").agg(count(lit(1)).as("n"))
          .withColumnRenamed("l_quantity", "bin").orderBy("bin")
      },
      Some {
        val c = binOracleCase("l_quantity", qBreaks, includeLowest = true, right = true)
        s"""SELECT bin, count(*) AS n FROM
           |  (SELECT $c AS bin FROM lineitem) WHERE bin IS NOT NULL
           |GROUP BY bin ORDER BY bin""".stripMargin
      }),

    Q("q51_binning_left",
      (s, d) => {
        val m = mgr(s, d)
        // right=false, includeLowest=false: [a,b) intervals, x==max dropped
        Binning.binningCustom(m.getDDFByName("lineitem"), "l_quantity",
          qBreaks, includeLowest = false, right = false)
          .df.groupBy("l_quantity").agg(count(lit(1)).as("n"))
          .withColumnRenamed("l_quantity", "bin").orderBy("bin")
      },
      Some {
        val c = binOracleCase("l_quantity", qBreaks, includeLowest = false, right = false)
        s"""SELECT bin, count(*) AS n FROM
           |  (SELECT $c AS bin FROM lineitem) WHERE bin IS NOT NULL
           |GROUP BY bin ORDER BY bin""".stripMargin
      }),

    Q("q52_binning_eqfreq",
      (s, d) => {
        val m = mgr(s, d)
        // bin INDEX output: quantile breaks can't be string-formatted
        // statically; index semantics are engine-independent
        val df = m.getDDFByName("orders").df
        val breaks = Stats.quantiles(df, "o_totalprice", Seq(0.0, 0.25, 0.5, 0.75, 1.0), exact = true)
        val c = col("o_totalprice")
        val idx = when(c >= breaks(0) && c <= breaks(1), 0)
          .when(c > breaks(1) && c <= breaks(2), 1)
          .when(c > breaks(2) && c <= breaks(3), 2)
          .when(c > breaks(3) && c <= breaks(4), 3)
        df.select(idx.as("bin"), col("o_orderkey"))
          .filter(col("bin").isNotNull)
          .groupBy("bin").agg(count(lit(1)).as("n"))
          .orderBy("bin")
      },
      Some("""WITH q AS (SELECT quantile_cont(o_totalprice, 0.25) AS q1,
             |  quantile_cont(o_totalprice, 0.5) AS q2,
             |  quantile_cont(o_totalprice, 0.75) AS q3,
             |  min(o_totalprice) AS q0, max(o_totalprice) AS q4 FROM orders)
             |SELECT CASE
             |  WHEN o_totalprice >= q0 AND o_totalprice <= q1 THEN 0
             |  WHEN o_totalprice > q1 AND o_totalprice <= q2 THEN 1
             |  WHEN o_totalprice > q2 AND o_totalprice <= q3 THEN 2
             |  WHEN o_totalprice > q3 AND o_totalprice <= q4 THEN 3 END AS bin,
             |  count(*) AS n
             |FROM orders, q GROUP BY bin ORDER BY bin""".stripMargin)),

    Q("q55_dropna_rows",
      (s, d) => {
        val m = mgr(s, d)
        // tables ship null-free: synthesize nulls via nullif, identically
        // in the oracle (SURVEY M1)
        val li = m.getDDFByName("lineitem").df.select(
          col("l_orderkey"), col("l_linenumber"),
          nullif(col("l_returnflag"), lit("N")).as("rf"),
          nullif(col("l_linestatus"), lit("F")).as("ls"))
        val ddf = m.register(li)
        MissingData.dropNARows(ddf, how = "any", cols = Seq("rf", "ls"))
          .df.orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, nullif(l_returnflag, 'N') AS rf,
             |  nullif(l_linestatus, 'F') AS ls
             |FROM lineitem
             |WHERE nullif(l_returnflag, 'N') IS NOT NULL
             |  AND nullif(l_linestatus, 'F') IS NOT NULL
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("q56_dropna_thresh",
      (s, d) => {
        val m = mgr(s, d)
        val li = m.getDDFByName("lineitem").df.select(
          col("l_orderkey"), col("l_linenumber"),
          nullif(col("l_returnflag"), lit("N")).as("rf"),
          nullif(col("l_linestatus"), lit("F")).as("ls"))
        val ddf = m.register(li)
        // thresh=1 → keep rows with ≥1 non-null among (rf, ls)
        MissingData.dropNARows(ddf, thresh = Some(1), cols = Seq("rf", "ls"))
          .df.orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, nullif(l_returnflag, 'N') AS rf,
             |  nullif(l_linestatus, 'F') AS ls
             |FROM lineitem
             |WHERE nullif(l_returnflag, 'N') IS NOT NULL
             |   OR nullif(l_linestatus, 'F') IS NOT NULL
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("q57_dropna_cols",
      (s, d) => {
        val m = mgr(s, d)
        val li = m.getDDFByName("lineitem").df.select(
          col("l_orderkey"), col("l_linenumber"),
          nullif(col("l_returnflag"), lit("N")).as("rf"),
          col("l_quantity"))
        // rf contains nulls → dropped by the ANY policy; the oracle states
        // the statically-known survivor set (deterministic fixture)
        MissingData.dropNAColumns(m.register(li), how = "any")
          .df.orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("q58_fillna",
      (s, d) => {
        val m = mgr(s, d)
        val li = m.getDDFByName("lineitem").df.select(
          col("l_orderkey"), col("l_linenumber"),
          nullif(col("l_quantity"), lit(1.0)).as("qty"))
        MissingData.fillNAValue(m.register(li), 0.0, Seq("qty"))
          .df.orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  coalesce(nullif(l_quantity, 1.0), 0.0) AS qty
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("q59_fillna_mean",
      (s, d) => {
        val m = mgr(s, d)
        val li = m.getDDFByName("lineitem").df.select(
          col("l_orderkey"), col("l_linenumber"),
          nullif(col("l_quantity"), lit(1.0)).as("qty"))
        MissingData.fillNAWithAggregate(m.register(li), "mean", Seq("qty"),
            exactDecimals = Some(2))
          .df.select(col("l_orderkey"), col("l_linenumber"), round(col("qty"), 4).as("qty"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      // mean over 2-decimal values: exact decimal sum / count on both sides
      Some(s"""WITH m AS (SELECT ${dsumSql("nullif(l_quantity, 1.0)")}
              |  / count(nullif(l_quantity, 1.0)) AS fill FROM lineitem)
              |SELECT l_orderkey, l_linenumber,
              |  round(coalesce(nullif(l_quantity, 1.0), fill), 4) AS qty
              |FROM lineitem, m ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("q70_ffill_global",
      (s, d) => {
        val m = mgr(s, d)
        // GLOBAL forward-fill over a UNIQUE ordering. The testdata's
        // (l_orderkey, l_linenumber) pairs are NOT unique, so uniqueness
        // is manufactured by GROUP BY — a directional fill is only
        // deterministic over a total order, and the per-group value is
        // an exact decimal sum (order-independent cross-engine).
        // Exercises the round-6 scale path: range-partition on ord,
        // in-partition fill, per-partition carry fix-up — no
        // unpartitioned WindowExec anywhere (ScaleSpec-pinned).
        val li = m.getDDFByName("lineitem").df
          .groupBy((col("l_orderkey") * 10 + col("l_linenumber")).as("ord"))
          .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("q"))
          .select(col("ord"), nullif(col("q"), lit(25.0)).as("qty"))
        MissingData.fillDirectional(m.register(li), "ffill", "ord", Seq("qty"))
          .df.orderBy("ord")
      },
      Some(s"""WITH b AS (
              |  SELECT l_orderkey * 10 + l_linenumber AS ord,
              |    ${dsumSql("l_quantity")} AS q
              |  FROM lineitem GROUP BY 1)
              |SELECT ord,
              |  last_value(nullif(q, 25.0) IGNORE NULLS)
              |    OVER (ORDER BY ord
              |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS qty
              |FROM b ORDER BY ord""".stripMargin)),

    Q("q71_bfill_bykey",
      (s, d) => {
        val m = mgr(s, d)
        // per-group backward fill: the partitionCols path (hash-
        // partitioned window, fills never leak across groups). Same
        // GROUP BY uniqueness discipline as q70: (grp, ord) is the
        // grouping key, so the within-group order is total.
        val li = m.getDDFByName("lineitem").df
          .groupBy(col("l_returnflag").as("grp"),
            (col("l_orderkey") * 10 + col("l_linenumber")).as("ord"))
          .agg(sum(col("l_discount").cast("decimal(18,2)")).cast("double").as("dd"))
          .select(col("grp"), col("ord"), nullif(col("dd"), lit(0.05)).as("disc"))
        MissingData.fillDirectional(m.register(li), "bfill", "ord", Seq("disc"),
            partitionCols = Seq("grp"))
          .df.orderBy("grp", "ord")
      },
      Some(s"""WITH b AS (
              |  SELECT l_returnflag AS grp,
              |    l_orderkey * 10 + l_linenumber AS ord,
              |    ${dsumSql("l_discount")} AS dd
              |  FROM lineitem GROUP BY 1, 2)
              |SELECT grp, ord,
              |  first_value(nullif(dd, 0.05) IGNORE NULLS)
              |    OVER (PARTITION BY grp ORDER BY ord
              |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS disc
              |FROM b ORDER BY grp, ord""".stripMargin))
  )
}
