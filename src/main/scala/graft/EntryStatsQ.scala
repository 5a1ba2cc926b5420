package graft

import graft.core.{DDF, DDFManager}
import graft.operators._
import graft.stats.{Sketches, Stats}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import EntryShared._

/** SparkEntry query rows — stats / quantiles / summary rows (q40-q4x, q84-q100). Split from SparkEntry.scala by family
  * (r15 verdict ask #7); composed into the pinned registry by
  * [[SparkEntry.queries]].
  */
private[graft] object EntryStatsQ {

  // =====================================================================
  // §2.5 Statistics
  // =====================================================================

  val qs: Seq[Q] = Seq(
    Q("q40_summary",
      (s, d) => {
        val m = mgr(s, d)
        // one-pass per-column summary; mean/variance derived from exact
        // decimal sums so the oracle matches bit-for-bit
        val li = m.getDDFByName("lineitem").df
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val parts = cols.map { c =>
          li.agg(
            count(col(c)).as("n"),
            sum(when(col(c).isNull, 1L).otherwise(0L)).as("na_count"),
            dsum(col(c)).as("sx"),
            dsum2(col(c), col(c)).as("sxx"),
            min(col(c)).cast("double").as("mn"),
            max(col(c)).cast("double").as("mx"))
            .select(lit(c).as("col_name"), col("n"), col("na_count"),
              round(col("sx") / col("n"), 6).as("mean"),
              round((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1), 6).as("variance"),
              col("mn"), col("mx"))
        }
        parts.reduce(_ unionAll _).orderBy("col_name")
      },
      Some {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        cols.map { c =>
          s"""SELECT '$c' AS col_name, count($c) AS n,
             |  cast(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS bigint) AS na_count,
             |  round(${dsumSql(c)} / count($c), 6) AS mean,
             |  round((${dsum2Sql(c, c)} - ${dsumSql(c)} * ${dsumSql(c)} / count($c))
             |        / (count($c) - 1), 6) AS variance,
             |  cast(min($c) AS double) AS mn, cast(max($c) AS double) AS mx
             |FROM lineitem""".stripMargin
        }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
      }),

    Q("q41_quantiles",
      (s, d) => {
        val m = mgr(s, d)
        val li = m.getDDFByName("lineitem").df
        val ps = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
        val cols = Seq("l_quantity", "l_extendedprice")
        import s.implicits._
        val rows = for (c <- cols; (p, v) <- ps.zip(Stats.quantiles(li, c, ps, exact = true)))
          yield (c, p, BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        rows.toDF("col_name", "p", "q").orderBy("col_name", "p")
      },
      Some {
        val ps = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
        val qs = for (c <- Seq("l_quantity", "l_extendedprice"); p <- ps)
          yield s"SELECT '$c' AS col_name, cast($p AS double) AS p, round(quantile_cont($c, $p), 4) AS q FROM lineitem"
        qs.mkString("", "\nUNION ALL\n", "\nORDER BY col_name, p")
      }),

    Q("q42_quantiles_integral",
      (s, d) => {
        // integral columns floor the quantile (reference quirk, SURVEY T3)
        val m = mgr(s, d)
        val li = m.getDDFByName("lineitem").df
        val ps = Seq(0.25, 0.5, 0.75)
        import s.implicits._
        val vs = Stats.quantiles(li, "l_orderkey", ps, exact = true)
        ps.zip(vs).map { case (p, v) => (p, v.toLong) }.toDF("p", "q")
          .orderBy("p")
      },
      Some("""SELECT p, cast(floor(q) AS bigint) AS q FROM (
             |  SELECT 0.25 AS p, quantile_cont(l_orderkey, 0.25) AS q FROM lineitem
             |  UNION ALL SELECT 0.5, quantile_cont(l_orderkey, 0.5) FROM lineitem
             |  UNION ALL SELECT 0.75, quantile_cont(l_orderkey, 0.75) FROM lineitem)
             |ORDER BY p""".stripMargin)),

    Q("q43_histogram",
      (s, d) => {
        val m = mgr(s, d)
        Stats.histogramDF(m.getDDFByName("lineitem").df, "l_extendedprice", 20)
          .select(col("bucket"), round(col("bin_start"), 4).as("bin_start"),
            round(col("bin_end"), 4).as("bin_end"), col("bin_count"))
          .orderBy("bucket")
      },
      Some("""WITH mm AS (SELECT cast(min(l_extendedprice) AS double) AS mn,
             |                    cast(max(l_extendedprice) AS double) AS mx
             |             FROM lineitem),
             |b AS (SELECT cast(least(floor((l_extendedprice - mn) / ((mx - mn) / 20)), 19) AS int) AS bucket,
             |             mn, mx
             |      FROM lineitem, mm)
             |SELECT bucket, round(mn + bucket * ((mx - mn) / 20), 4) AS bin_start,
             |       round(mn + (bucket + 1) * ((mx - mn) / 20), 4) AS bin_end,
             |       count(*) AS bin_count
             |FROM b GROUP BY bucket, mn, mx ORDER BY bucket""".stripMargin)),

    Q("q84_approx_quantiles",
      (s, d) => {
        // the AT-SCALE quantile path: percentile_approx (t-digest-family
        // sketch, the reference's own choice — StatisticsHandler.scala:
        // 60-84 uses clearspring T-Digest compression=100). Raw sketch
        // values are engine-specific, so the PORTABLE claim checked here
        // is the accuracy contract — stated in the sketch's OWN terms
        // (round-9 advice: a flat 1%-relative band could flap on
        // partition/merge order): the sketch guarantees rank error
        // ≤ N/accuracy, so the approx value must land between the exact
        // quantiles at p ∓ (2/accuracy + 2/N) — 2× the sketch bound for
        // merge slack, plus two absolute ranks because `percentile`
        // interpolates at position 1+p(N−1) while the sketch targets
        // rank ⌈pN⌉ and returns an OBSERVED value (a systematic ≤1-rank
        // offset that dominates at small N: at sf0.001's 6 k rows the
        // pure 2/accuracy band is ±1.2 ranks and flapped) — further
        // widened by the column's value granularity (quantities are
        // integers, prices cents). The oracle is the all-true verdict
        // table — a sketch drift breaks the hash, not just a tolerance
        // in a spec.
        val m = mgr(s, d)
        val li = m.getDDFByName("lineitem").df
        val ps = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
        val step = Map("l_quantity" -> 1.0, "l_extendedprice" -> 0.01)
        import s.implicits._
        val rows = for (c <- Seq("l_quantity", "l_extendedprice")) yield {
          val n = li.na.drop(Seq(c)).count()
          val rankSlack = 2.0 / 10000 + 2.0 / n
          val approx = Stats.quantiles(li, c, ps) // default = sketch
          val lo = Stats.quantiles(li, c, ps.map(p => math.max(0.0, p - rankSlack)), exact = true)
          val hi = Stats.quantiles(li, c, ps.map(p => math.min(1.0, p + rankSlack)), exact = true)
          ps.indices.map { i =>
            (c, ps(i), approx(i) >= lo(i) - step(c) && approx(i) <= hi(i) + step(c))
          }
        }
        rows.flatten.toDF("col_name", "p", "within_tol")
          .orderBy("col_name", "p")
      },
      Some {
        val ps = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
        val qs = for (c <- Seq("l_extendedprice", "l_quantity"); p <- ps)
          yield s"SELECT '$c' AS col_name, cast($p AS double) AS p, true AS within_tol"
        qs.mkString("", "\nUNION ALL\n", "\nORDER BY col_name, p")
      }),

    Q("q85_quantiles_sketch",
      (s, d) => {
        // the sketch path ALONE, for the bench: one pass over lineitem
        // producing two percentile_approx digests — no exact comparison
        // work in the timed region. Raw sketch output depends on merge
        // order, so this row is rows-only at the gate (like q06/d02);
        // q84 is its oracle-exact accuracy twin.
        val m = mgr(s, d)
        val li = m.getDDFByName("lineitem").df
        val ps = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
        Stats.quantilesFrame(li, "l_quantity", ps)
          .crossJoin(Stats.quantilesFrame(li, "l_extendedprice", ps)
            .withColumnRenamed("q", "q2"))
          .select(explode(concat(col("q"), col("q2"))).as("qv"))
      },
      None),

    Q("q44_factor_levels",
      (s, d) => {
        val m = mgr(s, d)
        val df = m.getDDFByName("customer").df
        val pairs = Seq("c_mktsegment", "c_nationkey").map(c =>
          struct(lit(c).as("col_name"), col(c).cast("string").as("level")))
        df.select(explode(array(pairs: _*)).as("p"))
          .select(col("p.col_name"), col("p.level"))
          .groupBy("col_name", "level").agg(count(lit(1)).as("n"))
          .orderBy("col_name", "level")
      },
      Some("""SELECT col_name, level, count(*) AS n FROM (
             |  SELECT 'c_mktsegment' AS col_name, c_mktsegment AS level FROM customer
             |  UNION ALL
             |  SELECT 'c_nationkey', cast(c_nationkey AS varchar) FROM customer)
             |GROUP BY col_name, level ORDER BY col_name, level""".stripMargin)),

    Q("q45_simple_summary",
      (s, d) => {
        val m = mgr(s, d)
        val df = m.getDDFByName("part").df
        val numeric = df.agg(
          min(col("p_size")).cast("double").as("mn_size"),
          max(col("p_size")).cast("double").as("mx_size"),
          min(col("p_retailprice")).as("mn_price"),
          max(col("p_retailprice")).as("mx_price"))
        // levels as a sorted joined STRING, not an array: array cells are
        // unhashable in the pandas-based correctness gates (r01/r02 q45 err)
        val brands = df.select(col("p_brand")).distinct()
          .agg(array_join(sort_array(collect_list("p_brand")), ",").as("levels"))
        numeric.crossJoin(brands)
      },
      Some("""SELECT cast(min(p_size) AS double) AS mn_size,
             |  cast(max(p_size) AS double) AS mx_size,
             |  min(p_retailprice) AS mn_price, max(p_retailprice) AS mx_price,
             |  (SELECT array_to_string(list(DISTINCT p_brand ORDER BY p_brand), ',')
             |   FROM part) AS levels
             |FROM part""".stripMargin)),

    Q("sk01_sketch_profile",
      (s, d) => {
        // mergeable HLL column profiles (Sketches.profile): the 100 TB
        // stats path — profile shards once at write, merge profiles, never
        // rescan the corpus. Exact fields (row/null counts, min/max) are
        // hash-checked against DuckDB directly; the HLL distinct estimate
        // is engine-specific, so its PORTABLE claim is a verdict pair in
        // the sketch's own terms (the q84 pattern): ndv_ok = whole-corpus
        // estimate within 6σ of the exact distinct count (deterministic
        // for fixed data — HLL has no RNG, registers are order-independent
        // maxima); merge_ok = shard-merged estimate within the same band
        // of the whole-corpus estimate (union may leave coupon-exact mode,
        // so bit-equality is NOT the contract — Sketches scaladoc).
        val m = mgr(s, d)
        val li = m.getDDFByName("lineitem").df
        val cols = Seq("l_orderkey", "l_quantity", "l_returnflag", "l_linestatus")
        val whole = Sketches.estimate(Sketches.profile(li, cols))
        val merged = Sketches.estimate(Sketches.mergeProfiles(Seq(
          Sketches.profile(li.filter(col("l_orderkey") % 2 === 0), cols),
          Sketches.profile(li.filter(col("l_orderkey") % 2 =!= 0), cols))))
        val exact = li.select(cols.map(c =>
          count_distinct(col(c)).as(s"__ndv_$c")): _*)
        val tol = 6 * Sketches.hllRse(12)
        val w = whole.as("w")
          .join(merged.select(col("col_name"), col("ndv_estimate").as("ndv_merged")).as("g"), "col_name")
          .crossJoin(exact)
        w.select(
          col("col_name"), col("row_count"), col("null_count"),
          col("min_num"), col("max_num"), col("min_str"), col("max_str"),
          (abs(col("ndv_estimate") -
            coalesce(cols.map(c => when(col("col_name") === c, col(s"__ndv_$c"))): _*))
            <= greatest(lit(1.0),
              coalesce(cols.map(c => when(col("col_name") === c, col(s"__ndv_$c"))): _*) * tol))
            .as("ndv_ok"),
          (abs(col("ndv_merged") - col("ndv_estimate"))
            <= greatest(lit(2.0), col("ndv_estimate") * tol)).as("merge_ok"))
          .orderBy("col_name")
      },
      Some {
        val mk = Seq(
          ("l_orderkey", true), ("l_quantity", true),
          ("l_returnflag", false), ("l_linestatus", false)).map { case (c, num) =>
          val minNum = if (num) s"cast(min($c) AS double)" else "cast(NULL AS double)"
          val maxNum = if (num) s"cast(max($c) AS double)" else "cast(NULL AS double)"
          val minStr = if (num) "cast(NULL AS varchar)" else s"min($c)"
          val maxStr = if (num) "cast(NULL AS varchar)" else s"max($c)"
          s"""SELECT '$c' AS col_name, count(*) AS row_count,
             |  count(*) - count($c) AS null_count,
             |  $minNum AS min_num, $maxNum AS max_num,
             |  $minStr AS min_str, $maxStr AS max_str,
             |  true AS ndv_ok, true AS merge_ok
             |FROM lineitem""".stripMargin
        }
        mk.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
      }),

    Q("sk02_heavy_hitters",
      (s, d) => {
        // mergeable heavy hitters through the SHARD path: per-shard
        // approx_top_k_accumulate sketches (the persistable form) are
        // combined and estimated. At gate scale the COMBINED ndv across
        // shards (2 000 distinct parts in the union — the quantity that
        // governs exactness, not per-shard ndv) is far under
        // maxItemsTracked, so the sketch is in its
        // exact-counter regime and the result is hash-exact vs the
        // DuckDB groupBy top-k; ties cut by (count DESC, item) on both
        // sides. At corpus scale the same plan holds bounded memory and
        // the counts become ≤ N/maxItemsTracked-error estimates.
        val m = mgr(s, d)
        val li = m.getDDFByName("lineitem").df
        val sketches = Sketches.topKAccumulate(
          li.withColumn("shard", col("l_suppkey") % 4),
          "l_partkey", "shard", maxItemsTracked = 10000)
        Sketches.topKCombineEstimate(sketches, k = 20, maxItemsTracked = 10000)
      },
      Some("""SELECT cast(l_partkey AS varchar) AS item, count(*) AS est_count
             |FROM lineitem GROUP BY l_partkey
             |ORDER BY est_count DESC, item LIMIT 20""".stripMargin)),

    Q("sk03_profile_drift",
      (s, d) => {
        // corpus-version drift from PROFILES ALONE (Sketches.profileDrift
        // / Manifest.profileDrift): old = 3/4 of events with a sparse
        // null pattern, new = all events with a denser one — rows, null
        // rate, ndv, and range all drift, and the report derives from
        // two config-sized stats tables, never a rescan. Exact fields
        // (counts, rates, range_widened from exact min/max) hash-check
        // against DuckDB; the HLL ndv estimates get sk01-style 6σ
        // verdict booleans against exact distinct counts.
        val m = mgr(s, d)
        val ev = m.getDDFByName("events").df
        val cols = Seq("user_id", "event_type", "value_n")
        val old = ev.filter(col("event_id") % 4 =!= 0)
          .select(col("user_id"), col("event_type"),
            expr("CASE WHEN event_id % 9 = 0 THEN CAST(NULL AS double) " +
              "ELSE value END").as("value_n"))
        val nw = ev.select(col("user_id"), col("event_type"),
          expr("CASE WHEN event_id % 6 = 0 THEN CAST(NULL AS double) " +
            "ELSE value END").as("value_n"))
        val drift = Sketches.profileDrift(
          Sketches.estimate(Sketches.profile(old, cols)),
          Sketches.estimate(Sketches.profile(nw, cols)))
        // exact distinct counts for the verdicts — gate-side exactness
        // check (sk01 pattern), not part of the operator
        val exacts = old.select(cols.map(c =>
            count_distinct(col(c)).as(s"__o_$c")): _*)
          .crossJoin(nw.select(cols.map(c =>
            count_distinct(col(c)).as(s"__n_$c")): _*))
        val tol = 6 * Sketches.hllRse(12)
        def pick(p: String) = coalesce(cols.map(c =>
          when(col("col_name") === c, col(s"__${p}_$c"))): _*)
        drift.crossJoin(exacts).select(
          col("col_name"), col("rows_old"), col("rows_new"),
          col("nulls_old"), col("nulls_new"),
          round(col("null_rate_delta"), 6).as("null_rate_delta"),
          col("range_widened"),
          (abs(col("ndv_old") - pick("o")) <=
            greatest(lit(1.0), pick("o") * tol)).as("ndv_old_ok"),
          (abs(col("ndv_new") - pick("n")) <=
            greatest(lit(1.0), pick("n") * tol)).as("ndv_new_ok"))
          .orderBy("col_name")
      },
      Some {
        val mk = Seq("user_id", "event_type", "value_n").map { c =>
          s"""SELECT '$c' AS col_name, ro AS rows_old, rn AS rows_new,
             |  ro - (SELECT count($c) FROM o) AS nulls_old,
             |  rn - (SELECT count($c) FROM n) AS nulls_new,
             |  round(CAST(rn - (SELECT count($c) FROM n) AS DOUBLE) / rn
             |    - CAST(ro - (SELECT count($c) FROM o) AS DOUBLE) / ro, 6)
             |    AS null_rate_delta,
             |  coalesce((SELECT min($c) FROM n) < (SELECT min($c) FROM o), false)
             |    OR coalesce((SELECT max($c) FROM n) > (SELECT max($c) FROM o), false)
             |    AS range_widened,
             |  true AS ndv_old_ok, true AS ndv_new_ok
             |FROM r""".stripMargin
        }
        s"""WITH o AS (SELECT user_id, event_type,
           |    CASE WHEN event_id % 9 = 0 THEN NULL ELSE value END AS value_n
           |  FROM events WHERE event_id % 4 <> 0),
           |n AS (SELECT user_id, event_type,
           |    CASE WHEN event_id % 6 = 0 THEN NULL ELSE value END AS value_n
           |  FROM events),
           |r AS (SELECT (SELECT count(*) FROM o)::BIGINT AS ro,
           |             (SELECT count(*) FROM n)::BIGINT AS rn)
           |${mk.mkString("\nUNION ALL\n")}
           |ORDER BY col_name""".stripMargin
      }),

    Q("sk06_psi_drift",
      (s, d) => {
        // distributional drift (PSI) between two corpus snapshots of the
        // same numeric column — ref = first half of documents by id, cur
        // = second half; bins derive from the REFERENCE min/max, so any
        // cur excursion lands in the edge bins. Counts are exact ints,
        // proportions one IEEE division each; ln gets the t10 round-6
        // treatment
        val m = mgr(s, d)
        val docs = m.getDDFByName("documents").df
        Stats.psiDrift(docs.filter(col("doc_id") < 250),
            docs.filter(col("doc_id") >= 250), "n_chars", nBins = 10)
          .select(col("bin"), col("ref_cnt"), col("cur_cnt"),
            round(col("ref_pct"), 6).as("ref_pct"),
            round(col("cur_pct"), 6).as("cur_pct"),
            round(col("psi_term"), 6).as("psi_term"))
          .orderBy("bin")
      },
      Some("""WITH ref AS (SELECT n_chars::DOUBLE AS v FROM documents
             |    WHERE doc_id < 250 AND n_chars IS NOT NULL),
             |cur AS (SELECT n_chars::DOUBLE AS v FROM documents
             |    WHERE doc_id >= 250 AND n_chars IS NOT NULL),
             |b AS (SELECT min(v) AS lo,
             |    CASE WHEN (max(v) - min(v)) / 10 > 0
             |         THEN (max(v) - min(v)) / 10 ELSE 1.0 END AS w
             |  FROM ref),
             |rb AS (SELECT least(greatest(floor((v - lo) / w), 0), 9)::BIGINT AS bin,
             |    count(*) AS ref_cnt FROM ref, b GROUP BY 1),
             |cb AS (SELECT least(greatest(floor((v - lo) / w), 0), 9)::BIGINT AS bin,
             |    count(*) AS cur_cnt FROM cur, b GROUP BY 1),
             |spine AS (SELECT unnest(range(10))::BIGINT AS bin),
             |j AS (SELECT bin, coalesce(ref_cnt, 0)::BIGINT AS ref_cnt,
             |    coalesce(cur_cnt, 0)::BIGINT AS cur_cnt
             |  FROM spine LEFT JOIN rb USING (bin) LEFT JOIN cb USING (bin)),
             |p AS (SELECT bin, ref_cnt, cur_cnt,
             |    greatest(ref_cnt::DOUBLE / (SELECT sum(ref_cnt)::DOUBLE FROM j), 1e-6) AS rp,
             |    greatest(cur_cnt::DOUBLE / (SELECT sum(cur_cnt)::DOUBLE FROM j), 1e-6) AS cp
             |  FROM j)
             |SELECT bin, ref_cnt, cur_cnt,
             |  round(rp, 6) AS ref_pct, round(cp, 6) AS cur_pct,
             |  round((cp - rp) * ln(cp / rp), 6) AS psi_term
             |FROM p ORDER BY bin""".stripMargin)),

    Q("sk07_categorical_drift",
      (s, d) => {
        // sk06's categorical sibling: JS divergence of the source mix
        // between the two corpus halves. Dropping src19 from cur makes
        // the category sets genuinely differ (a one-sided category
        // exercises the 0.5·p·ln2 max-signal branch), counts are exact
        // ints, each pct one IEEE division, ln rounded per the t10 rule
        val m = mgr(s, d)
        val docs = m.getDDFByName("documents").df
        Stats.categoricalDrift(
            docs.filter(col("doc_id") < 250), docs.filter(col("doc_id") >= 250)
              .filter(col("source") =!= "src19"), "source")
          .select(col("category"), col("ref_cnt"), col("cur_cnt"),
            round(col("ref_pct"), 6).as("ref_pct"),
            round(col("cur_pct"), 6).as("cur_pct"),
            round(col("js_term"), 6).as("js_term"))
          .orderBy("category")
      },
      Some("""WITH r AS (SELECT source AS category, count(*) AS ref_cnt
             |    FROM documents WHERE doc_id < 250 AND source IS NOT NULL
             |    GROUP BY 1),
             |c AS (SELECT source AS category, count(*) AS cur_cnt
             |    FROM documents
             |    WHERE doc_id >= 250 AND source <> 'src19' AND source IS NOT NULL
             |    GROUP BY 1),
             |j AS (SELECT coalesce(r.category, c.category) AS category,
             |    coalesce(ref_cnt, 0)::BIGINT AS ref_cnt,
             |    coalesce(cur_cnt, 0)::BIGINT AS cur_cnt
             |  FROM r FULL JOIN c ON r.category = c.category),
             |t AS (SELECT sum(ref_cnt)::BIGINT AS rt, sum(cur_cnt)::BIGINT AS ct
             |  FROM j),
             |p AS (SELECT category, ref_cnt, cur_cnt,
             |    CASE WHEN rt > 0 THEN ref_cnt::DOUBLE / rt::DOUBLE ELSE 0.0 END AS p,
             |    CASE WHEN ct > 0 THEN cur_cnt::DOUBLE / ct::DOUBLE ELSE 0.0 END AS q
             |  FROM j, t)
             |SELECT category, ref_cnt, cur_cnt,
             |  round(p, 6) AS ref_pct, round(q, 6) AS cur_pct,
             |  round(0.5 * ((CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2)) ELSE 0.0 END)
             |             + (CASE WHEN q > 0 THEN q * ln(q / ((p + q) / 2)) ELSE 0.0 END)),
             |    6) AS js_term
             |FROM p ORDER BY category""".stripMargin)),

    Q("sk04_skew_report",
      (s, d) => {
        // Exact key-skew diagnostic over join-key-shaped columns: the
        // near-constant flag, a uniform fk, the bounded line number, and
        // free text (near-unique). Tie rule for the hottest key is
        // deterministic both sides: (count, key)-max.
        val m = mgr(s, d)
        val cols = Seq("l_returnflag", "l_suppkey", "l_linenumber", "l_linestatus")
        Stats.skewReport(m.getDDFByName("lineitem").df, cols)
          .withColumn("skew_ratio", round(col("skew_ratio"), 6))
          .orderBy("col_name")
      },
      Some {
        val mk = Seq("l_returnflag", "l_suppkey", "l_linenumber", "l_linestatus").map { c =>
          s"""SELECT '$c' AS col_name, sum(cnt)::BIGINT AS n_rows,
             |  count(*)::BIGINT AS ndv,
             |  (SELECT key FROM g_$c ORDER BY cnt DESC, key DESC LIMIT 1) AS top_key,
             |  (SELECT cnt FROM g_$c ORDER BY cnt DESC, key DESC LIMIT 1) AS top_cnt,
             |  round((SELECT cnt FROM g_$c ORDER BY cnt DESC, key DESC LIMIT 1)::DOUBLE
             |    * count(*) / sum(cnt), 6) AS skew_ratio
             |FROM g_$c""".stripMargin
        }
        val gs = Seq("l_returnflag", "l_suppkey", "l_linenumber", "l_linestatus").map { c =>
          s"""g_$c AS MATERIALIZED (
             |  SELECT coalesce($c::VARCHAR, '<NULL>') AS key, count(*)::BIGINT AS cnt
             |  FROM lineitem GROUP BY 1)""".stripMargin
        }
        s"""WITH ${gs.mkString(",\n")}
           |SELECT * FROM (${mk.mkString("\nUNION ALL\n")})
           |ORDER BY col_name""".stripMargin
      }),

    Q("sk05_quantile_profile",
      (s, d) => {
        // Mergeable KLL quantile profiles — the quantile leg of the
        // shard-profile story (sk01 = ndv/min/max leg): accumulate a
        // sketch per shard, MERGE instead of rescanning, read quartiles.
        // KLL compaction flips random bits, so the contract is the
        // ACCURACY BAND, not bit-equality (q84/sk01 pattern): each
        // estimate's exact rank must sit within ±5% of its fraction
        // (≈3× the published 1.7% 99%-confidence error at k=200), for
        // BOTH the shard-merged and the single-pass sketch; the oracle
        // pins the verdicts true plus the exact row count.
        val m = mgr(s, d)
        val li = m.getDDFByName("lineitem").df
        val nRows = li.count()
        val fracs = Seq(0.25, 0.5, 0.75)
        def ranks(sketches: DataFrame, okCol: String): DataFrame =
          li.select(col("l_orderkey"))
            .crossJoin(broadcast(
              Sketches.quantileMergeEstimate(sketches, fracs)))
            .groupBy("fraction")
            .agg((sum(when(col("l_orderkey") <= col("est_value"), 1L)
              .otherwise(0L)).cast("double") / nRows).as("__rank"))
            .select(col("fraction"),
              (abs(col("__rank") - col("fraction")) <= lit(0.05)).as(okCol))
        val sharded = Sketches.quantileAccumulate(
          li.withColumn("__shard", pmod(col("l_orderkey"), lit(2))),
          "l_orderkey", "__shard")
        val whole = Sketches.quantileAccumulate(
          li.withColumn("__shard", lit(0)), "l_orderkey", "__shard")
        ranks(sharded, "rank_ok_merged")
          .join(ranks(whole, "rank_ok_whole"), "fraction")
          .withColumn("n_rows", lit(nRows))
          .select("fraction", "n_rows", "rank_ok_merged", "rank_ok_whole")
          .orderBy("fraction")
      },
      Some("""SELECT fraction, (SELECT count(*)::BIGINT FROM lineitem) AS n_rows,
             |  true AS rank_ok_merged, true AS rank_ok_whole
             |FROM (VALUES (0.25), (0.5), (0.75)) t(fraction)
             |ORDER BY fraction""".stripMargin)),

    Q("q89_group_ndv_approx",
      (s, d) => {
        // per-group approximate distinct counts (HLL++, rsd 2%) beside
        // the exact — the grouped form of Stats.approxDistinctCounts.
        // HLL++ is deterministic for fixed data (register maxima, no
        // RNG), but its value is engine-specific, so the verdict-boolean
        // contract applies: |est − exact| ≤ 6·rsd·exact, oracle pins the
        // verdicts true and checks the exact counts hash-exactly.
        val m = mgr(s, d)
        m.getDDFByName("lineitem").df
          .groupBy("l_returnflag")
          .agg(count_distinct(col("l_orderkey")).as("exact_ndv"),
            approx_count_distinct(col("l_orderkey"), 0.02).as("__est"))
          .select(col("l_returnflag"), col("exact_ndv"),
            (abs(col("__est") - col("exact_ndv")).cast("double")
              <= greatest(lit(1.0), lit(6 * 0.02) * col("exact_ndv"))).as("ndv_ok"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(DISTINCT l_orderkey)::BIGINT AS exact_ndv,
             |  true AS ndv_ok
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))
  )
}
