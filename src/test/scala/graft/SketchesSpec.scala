package graft

import graft.stats.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = (1 to 500).map { i =>
    (i.toLong, s"w${i % 37}", if (i % 10 == 0) null else java.lang.Double.valueOf(i % 83))
  }.toDF("id", "word", "v")

  test("profile: exact fields (nulls, rows, min/max) and ndv inside the HLL bound") {
    val p = Sketches.estimate(Sketches.profile(corpus, Seq("id", "word", "v")))
      .collect().map(r => r.getString(0) -> r).toMap

    val id = p("id")
    assert(id.getAs[Long]("null_count") == 0L)
    assert(id.getAs[Long]("row_count") == 500L)
    assert(id.getAs[Double]("min_num") == 1.0 && id.getAs[Double]("max_num") == 500.0)
    assert(id.isNullAt(id.fieldIndex("min_str")) && id.isNullAt(id.fieldIndex("max_str")))

    val w = p("word")
    assert(w.getAs[Long]("null_count") == 0L)
    assert(w.getAs[String]("min_str") == "w0" && w.getAs[String]("max_str") == "w9")
    assert(w.isNullAt(w.fieldIndex("min_num")))

    val v = p("v")
    assert(v.getAs[Long]("null_count") == 50L)

    // 6σ of the published RSE at lgK=12 — and the estimate is
    // deterministic for fixed data, so this cannot flap
    val tol = 6 * Sketches.hllRse(12)
    for ((c, exact) <- Seq(("id", 500.0), ("word", 37.0), ("v", 82.0))) {
      val est = p(c).getAs[Long]("ndv_estimate").toDouble
      assert(math.abs(est - exact) <= math.max(1.0, exact * tol),
        s"$c: est $est vs exact $exact outside ${exact * tol}")
    }
  }

  test("mergeProfiles(shards): exact fields identical to profile(whole); estimate in bound") {
    val a = corpus.filter($"id" % 2 === 0)
    val b = corpus.filter($"id" % 2 =!= 0)
    val merged = Sketches.estimate(
      Sketches.mergeProfiles(Seq(Sketches.profile(a), Sketches.profile(b))))
    val whole = Sketches.estimate(Sketches.profile(corpus))
    // exact fields (everything but the sketch estimate) merge EXACTLY
    def exactFields(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.toSeq.drop(2)).toMap
    assert(exactFields(merged) == exactFields(whole))
    // the union path may leave coupon-exact mode (see Sketches doc), so
    // the estimates agree within the bound, not bit-wise
    val m = merged.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wm = whole.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tol = 6 * Sketches.hllRse(12)
    for ((c, est) <- m) {
      val w = wm(c).toDouble
      assert(math.abs(est - w) <= math.max(2.0, w * tol), s"$c: merged $est whole $w")
    }
  }

  test("mergeProfiles tolerates mixed lgK (downsizes, still in bound)") {
    val a = corpus.filter($"id" <= 250)
    val b = corpus.filter($"id" > 250)
    val est = Sketches.estimate(Sketches.mergeProfiles(Seq(
        Sketches.profile(a, Seq("id"), lgK = 12),
        Sketches.profile(b, Seq("id"), lgK = 10))))
      .collect().head.getAs[Long]("ndv_estimate").toDouble
    assert(math.abs(est - 500.0) <= 500.0 * 6 * Sketches.hllRse(10), s"est $est")
  }

  test("topKSketch == exact groupBy top-k in the exact regime; ties cut deterministically") {
    // freq(w_j) differs by residue class; ndv=37 << tracked, so counts exact
    val got = Sketches.topKSketch(corpus, "word", k = 5, maxItemsTracked = 100)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exact = corpus.groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"word".asc).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == exact.toSeq, s"got ${got.toSeq} exact ${exact.toSeq}")
  }

  test("topK shard accumulate + combine == single-pass sketch") {
    val sketches = Sketches.topKAccumulate(
      corpus.withColumn("shard", $"id" % 4), "word", "shard", maxItemsTracked = 100)
    assert(sketches.count() == 4)
    val combined = Sketches.topKCombineEstimate(sketches, k = 5, maxItemsTracked = 100)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val single = Sketches.topKSketch(corpus, "word", k = 5, maxItemsTracked = 100)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(combined.toSeq == single.toSeq)
  }

  test("plan: profile is ONE aggregate over the data — no sort, no join, no data shuffle of rows") {
    val plan = Sketches.profile(corpus, Seq("id", "word"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortExec") && !plan.toLowerCase.contains("join"), plan)
    // partial + final hash aggregate pair, nothing else touching data
    assert("HashAggregate|SortAggregate|ObjectHashAggregate".r
      .findAllIn(plan).size >= 2, plan)
  }

  test("guards: unknown column, bad k") {
    intercept[IllegalArgumentException](Sketches.profile(corpus, Seq("nope")))
    intercept[IllegalArgumentException](Sketches.topKSketch(corpus, "word", 0))
    intercept[IllegalArgumentException](
      Sketches.topKSketch(corpus, "word", k = 50, maxItemsTracked = 10))
  }

  test("profileDrift: exact fields, range widening, and added/removed columns") {
    import spark.implicits._
    val old = Seq((1L, "a", 5.0), (2L, "b", 7.0), (3L, "a", 9.0))
      .toDF("id", "tag", "v")
    val nw = Seq((1L, Some(5.0), "x"), (2L, Some(11.0), "y"),
        (3L, None: Option[Double], "z"), (4L, Some(2.0), "w"))
      .toDF("id", "v", "extra")
    val drift = Sketches.profileDrift(
        Sketches.estimate(Sketches.profile(old)),
        Sketches.estimate(Sketches.profile(nw)))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    // shared numeric column: rows 3→4, one new null, range widened both ends
    val v = drift("v")
    assert(v.getAs[Long]("rows_old") == 3 && v.getAs[Long]("rows_new") == 4)
    assert(v.getAs[Long]("nulls_old") == 0 && v.getAs[Long]("nulls_new") == 1)
    assert(v.getAs[Boolean]("range_widened"), "2.0 < 5.0 and 11.0 > 9.0")
    assert(math.abs(v.getAs[Double]("null_rate_delta") - 0.25) < 1e-12)
    // id: superset range on the high end only
    assert(drift("id").getAs[Boolean]("range_widened"))
    // removed column: new side all-null; added column: old side all-null
    assert(drift("tag").isNullAt(drift("tag").fieldIndex("rows_new")))
    assert(drift("extra").isNullAt(drift("extra").fieldIndex("rows_old")))
    assert(!drift("extra").getAs[Boolean]("range_widened"))
  }

  test("profileDrift degenerate denominators yield nulls, never Infinity/NaN (r12 ADVICE fix)") {
    import spark.implicits._
    // old side: an ALL-NULL column (ndv_old = 0) and a normal column;
    // new side: the all-null column now populated, plus an added column —
    // one-side-only columns and zero denominators all hit the guards
    val old = Seq((1L, None: Option[Double]), (2L, None: Option[Double]))
      .toDF("id", "dead")
    val nw = Seq((1L, Some(3.0), "x"), (2L, Some(4.0), "y"))
      .toDF("id", "dead", "extra")
    val drift = Sketches.profileDrift(
        Sketches.estimate(Sketches.profile(old)),
        Sketches.estimate(Sketches.profile(nw)))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    // ndv_old = 0 for the all-null column → ratio must be NULL, not Inf
    val dead = drift("dead")
    assert(dead.isNullAt(dead.fieldIndex("ndv_ratio")),
      s"ndv_old=0 must yield null ratio, got ${dead.getAs[Any]("ndv_ratio")}")
    // one-side-only column: rates/deltas on the absent side are null
    val extra = drift("extra")
    assert(extra.isNullAt(extra.fieldIndex("null_rate_old")))
    assert(extra.isNullAt(extra.fieldIndex("null_rate_delta")))
    assert(extra.isNullAt(extra.fieldIndex("ndv_ratio")))
    // no cell anywhere is Infinity or NaN
    drift.values.foreach { r =>
      Seq("null_rate_old", "null_rate_new", "null_rate_delta", "ndv_ratio")
        .foreach { c =>
          if (!r.isNullAt(r.fieldIndex(c))) {
            val d = r.getAs[Double](c)
            assert(!d.isInfinite && !d.isNaN, s"$c of ${r.getAs[String]("col_name")} = $d")
          }
        }
    }
  }

  test("KLL quantile profile: shard-merge and single-pass both inside the rank band") {
    import spark.implicits._
    // 1..10000 in two disjoint parity shards: true quartiles 2500/5000/7500
    val df = spark.range(1, 10001).toDF("v")
      .withColumn("shard", pmod(col("v"), lit(2)))
    def est(shards: org.apache.spark.sql.DataFrame): Map[Double, Long] =
      Sketches.quantileMergeEstimate(shards, Seq(0.25, 0.5, 0.75))
        .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val merged = est(Sketches.quantileAccumulate(df, "v", "shard"))
    val single = est(Sketches.quantileAccumulate(
      df.withColumn("shard", lit(0)), "v", "shard"))
    for ((f, want) <- Seq(0.25 -> 2500L, 0.5 -> 5000L, 0.75 -> 7500L)) {
      // ±5% of rank on uniform 1..10k = ±500 in value
      assert(math.abs(merged(f) - want) <= 500, s"merged q$f = ${merged(f)}")
      assert(math.abs(single(f) - want) <= 500, s"single q$f = ${single(f)}")
    }
    // nulls are ignored, not counted as zeros
    val withNulls = Seq(Some(1L), None, Some(3L), None, Some(2L)).toDF("v")
      .withColumn("shard", lit(0))
    val m = est(Sketches.quantileAccumulate(withNulls, "v", "shard"))
    assert(m(0.5) >= 1L && m(0.5) <= 3L)
    intercept[IllegalArgumentException](
      Sketches.quantileMergeEstimate(df.limit(0), Seq(1.5)))
    // double twin: uniform [0, 1) in two shards, median within the band
    val dd = spark.range(10000).toDF("i")
      .withColumn("v", col("i").cast("double") / 10000.0)
      .withColumn("shard", pmod(col("i"), lit(2)))
    val dq = Sketches.quantileMergeEstimateDouble(
        Sketches.quantileAccumulateDouble(dd, "v", "shard"), Seq(0.5))
      .first().getDouble(1)
    assert(math.abs(dq - 0.5) <= 0.05, s"double median $dq")
  }
}
