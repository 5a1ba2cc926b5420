package graft

import graft.core.DDFManager
import graft.stats.Stats
import org.apache.spark.sql.functions.col

class StatsSpec extends SparkTestBase {

  private lazy val m = DDFManager(spark)

  test("one-pass summary: count/na/mean/variance/min/max") {
    import spark.implicits._
    val ddf = m.register(Seq(Some(1.0), Some(2.0), Some(3.0), None).toDF("x"))
    val s = Stats.summary(ddf).head
    assert(s.count == 3 && s.naCount == 1)
    assert(s.mean == 2.0 && s.variance == 1.0 && s.min == 1.0 && s.max == 3.0)
  }

  test("exact quantiles with linear interpolation; integral floor quirk (T3)") {
    import spark.implicits._
    val ddf = m.register((1 to 100).map(_.toDouble).toDF("x"))
    val qs = Stats.quantiles(ddf.df, "x", Seq(0.25, 0.5, 0.75), exact = true)
    assert(qs == Seq(25.75, 50.5, 75.25))
    val ints = m.register((1 to 100).toDF("i"))
    val qi = Stats.quantiles(ints.df, "i", Seq(0.5), exact = true)
    assert(qi == Seq(50.0)) // floor(50.5)
  }

  test("fiveNum spans the distribution") {
    import spark.implicits._
    val ddf = m.register((1 to 1000).map(_.toDouble).toDF("x"))
    val fn = Stats.fiveNum(ddf, "x", exact = true)
    assert(fn.min <= 2 && fn.max >= 999 && fn.median == 500.5)
  }

  test("histogram: exact counts, closed top edge (T7)") {
    import spark.implicits._
    val ddf = m.register((1 to 100).map(_.toDouble).toDF("x"))
    val h = Stats.histogram(ddf, "x", 4)
    assert(h.map(_._3).sum == 100)
    assert(h.size == 4)
    // max value lands in last bucket, not beyond
    assert(h.last._3 == 25)
  }

  test("multi-factor counts in one pass (T9)") {
    import spark.implicits._
    val ddf = m.register(Seq(("a", "x"), ("a", "y"), ("b", "x")).toDF("f1", "f2"))
    val counts = Stats.multiFactorCounts(ddf.df, Seq("f1", "f2"))
    assert(counts("f1") == Map("a" -> 2L, "b" -> 1L))
    assert(counts("f2") == Map("x" -> 2L, "y" -> 1L))
  }

  test("simple summary: numeric ranges + factor levels (T8)") {
    import spark.implicits._
    val ddf = m.register(Seq((1.0, "u"), (9.0, "v"), (5.0, "u")).toDF("n", "f"))
    ddf.setAsFactor("f")
    val ss = Stats.simpleSummary(ddf)
    assert(ss.numericRanges("n") == (1.0, 9.0))
    assert(ss.factorLevels("f") == Seq("u", "v"))
  }

  test("simple summary survives an all-null numeric column (round-1 advice: no NPE)") {
    import spark.implicits._
    val ddf = m.register(Seq(
      (Option.empty[Double], 1.0), (None, 3.0)).toDF("allnull", "ok"))
    val ss = Stats.simpleSummary(ddf)
    assert(ss.numericRanges("ok") == (1.0, 3.0))
    val (mn, mx) = ss.numericRanges("allnull")
    assert(mn.isNaN && mx.isNaN)
  }

  test("groupMedian: odd picks middle, even averages the two middles exactly") {
    import spark.implicits._
    val df = Seq(
      ("a", 1.0), ("a", 7.0), ("a", 3.0),                 // odd: median 3.0
      ("b", 10.10), ("b", 10.15), ("b", 20.0), ("b", 30.0), // even: (10.15+20)/2
      ("c", 5.0)                                           // singleton
    ).toDF("g", "v")
    val m = Stats.groupMedian(df, "g", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("a") == 3.0)
    assert(m("b") == (10.15 + 20.0) / 2)
    assert(m("c") == 5.0)
    // nulls are excluded before ranking
    val withNull = Seq(("a", Some(1.0)), ("a", None), ("a", Some(9.0)))
      .toDF("g", "v")
    assert(Stats.groupMedian(withNull, "g", "v").first().getDouble(1) == 5.0)
  }

  test("groupQuantiles: nearest-rank selection per group") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 10.0)).toDF("g", "v")
    val q = Stats.groupQuantiles(df, "g", "v", Seq(0.25, 0.5, 1.0))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // n=4: ceil(.25*4)=1 → 1.0; ceil(.5*4)=2 → 2.0; ceil(1*4)=4 → 4.0
    assert(q("a") == ((1.0, 2.0, 4.0)))
    assert(q("b") == ((10.0, 10.0, 10.0)), "singleton group: every quantile is the value")
    intercept[IllegalArgumentException] { Stats.groupQuantiles(df, "g", "v", Seq(0.0)) }
  }

  test("bucketByGroupQuantiles: CCNet head/middle/tail per group; NULL score → NULL bucket") {
    import spark.implicits._
    val df = ((1 to 9).map(v => ("a", Option(v.toDouble))) ++
      Seq(("b", Option(1.0)), ("b", Option(2.0)), ("b", Option(3.0)),
        ("a", Option.empty[Double]))).toDF("g", "v")
    val out = Stats.bucketByGroupQuantiles(df, "v", "g",
      Seq(1.0 / 3, 2.0 / 3), Seq("tail", "middle", "head"))
    assert(out.columns.toSeq == Seq("g", "v", "bucket"))
    val got = out.collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getDouble(1)) ->
        (if (r.isNullAt(2)) null else r.getString(2))).toMap
    // a: n=9 → cut ranks ceil(3)=3, ceil(6)=6 → boundaries 3.0 and 6.0
    assert(got(("a", 1.0)) == "tail" && got(("a", 3.0)) == "tail")
    assert(got(("a", 4.0)) == "middle" && got(("a", 6.0)) == "middle")
    assert(got(("a", 7.0)) == "head" && got(("a", 9.0)) == "head")
    // b: n=3 → boundaries 1.0 and 2.0
    assert(got(("b", 1.0)) == "tail" && got(("b", 2.0)) == "middle" &&
      got(("b", 3.0)) == "head")
    // a NULL score carries no evidence — never promoted to a bucket
    assert(got(("a", null)) == null)
    intercept[IllegalArgumentException] {
      Stats.bucketByGroupQuantiles(df, "v", "g", Seq(2.0 / 3, 1.0 / 3),
        Seq("t", "m", "h")) // cuts not increasing
    }
    intercept[IllegalArgumentException] {
      Stats.bucketByGroupQuantiles(df, "v", "g", Seq(0.5), Seq("only")) // label arity
    }
    intercept[IllegalArgumentException] {
      Stats.bucketByGroupQuantiles(df, "v", "g", Seq(0.5), Seq("x", "x")) // dup labels
    }
    intercept[IllegalArgumentException] {
      Stats.bucketByGroupQuantiles(df, "v", "g", Seq(0.5), Seq("lo", "hi"),
        bucketCol = "v") // collides with an input column
    }
  }

  test("filterByGroupQuantile: per-group gate keeps the boundary value; NULLs never pass") {
    import spark.implicits._
    val df = ((1 to 8).map(v => ("a", Option(v.toDouble))) ++
      (10 to 13).map(v => ("b", Option(v.toDouble))) ++
      Seq(("a", Option.empty[Double]))).toDF("g", "v")
    // p=0.5: a (n=8) → cut rank 4 → 4.0, keep ≥4 → 5 rows;
    //        b (n=4) → cut rank 2 → 11.0, keep ≥11 → 3 rows
    val up = Stats.filterByGroupQuantile(df, "v", "g", 0.5)
    assert(up.columns.toSeq == Seq("g", "v"))
    assert(up.count() == 8)
    assert(up.filter(col("g") === "a").agg(org.apache.spark.sql.functions.min("v"))
      .first().getDouble(0) == 4.0)
    // lower tail: a ≤4 → 4 rows; b ≤11 → 2 rows; the NULL row passes neither
    assert(Stats.filterByGroupQuantile(df, "v", "g", 0.5, keepUpper = false)
      .count() == 6)
    intercept[IllegalArgumentException] {
      Stats.filterByGroupQuantile(df, "v", "g", 1.0)
    }
  }

  test("bucketByGroupQuantiles approx path: same totals, order-consistent buckets") {
    import spark.implicits._
    val df = (1 to 300).map(v => (s"g${v % 3}", v.toDouble)).toDF("g", "v")
    val labels = Seq("tail", "middle", "head")
    val out = Stats.bucketByGroupQuantiles(df, "v", "g",
      Seq(1.0 / 3, 2.0 / 3), labels, approx = true).collect()
    assert(out.length == 300 && out.forall(r => !r.isNullAt(2)))
    // within each group every tail value < every middle value < every head
    // value (the sketch boundary is an actual data value, so the partition
    // is clean even if its rank differs ±ε from nearest-rank)
    val byG = out.groupBy(_.getString(0))
    byG.values.foreach { rows =>
      val byB = rows.groupBy(_.getString(2)).map { case (b, rs) =>
        b -> (rs.map(_.getDouble(1)).min, rs.map(_.getDouble(1)).max)
      }
      assert(labels.forall(byB.contains), s"missing a bucket: ${byB.keySet}")
      assert(byB("tail")._2 < byB("middle")._1 && byB("middle")._2 < byB("head")._1)
      // 100 docs per group, uniform values → each bucket within ±2 of 33
      val sizes = rows.groupBy(_.getString(2)).map(_._2.length)
      assert(sizes.forall(s => s >= 31 && s <= 36), s"skewed buckets: $sizes")
    }
  }

  test("IQR outliers: drop removes fence violations, clip clamps them") {
    import spark.implicits._
    // q1 = 2, q3 = 4 (nearest-rank over 1..4 plus the outlier 100):
    // n=5 → ceil(.25*5)=2 → 2.0; ceil(.75*5)=4 → 4.0; fence = [-1, 7]
    val df = Seq(1.0, 2.0, 3.0, 4.0, 100.0).toDF("v")
    val kept = Stats.dropOutliersIqr(df, "v", k = 1.5, exact = true)
      .collect().map(_.getDouble(0)).sorted
    assert(kept.toSeq == Seq(1.0, 2.0, 3.0, 4.0))
    val clipped = Stats.clipOutliersIqr(df, "v", k = 1.5, exact = true)
      .collect().map(_.getDouble(0)).sorted
    assert(clipped.toSeq == Seq(1.0, 2.0, 3.0, 4.0, 7.0), "100 clamps to q3 + 1.5*iqr = 7")
    // approximate path stays within the same ballpark on clean data
    val approxKept = Stats.dropOutliersIqr(df, "v", k = 1.5).count()
    assert(approxKept >= 3 && approxKept <= 5)
  }

  test("iqrBounds: integral column widens cleanly; all-null column fails loudly") {
    import spark.implicits._
    val ints = Seq(1, 2, 3, 4).toDF("v")
    val (lo, hi) = Stats.iqrBounds(ints, "v", k = 1.5, exact = true)
    // nearest-rank q1 = 1, q3 = 3 → fence [-2, 6]
    assert(lo == -2.0 && hi == 6.0)
    val empty = Seq.empty[Option[Double]].toDF("v")
    val allNull = Seq[Option[Double]](None, None).toDF("v")
    for (bad <- Seq(empty, allNull); ex <- Seq(true, false)) {
      val e = intercept[IllegalArgumentException] {
        Stats.iqrBounds(bad, "v", exact = ex)
      }
      assert(e.getMessage.contains("no non-null values"))
    }
  }

  test("groupMode: most frequent value per group, ties to smallest") {
    import spark.implicits._
    val df = Seq(("a", 2.0), ("a", 2.0), ("a", 1.0),
      ("b", 5.0), ("b", 7.0), // tie at count 1 → smallest value wins
      ("c", 9.0)).toDF("g", "v")
    val m = Stats.groupMode(df, "g", "v")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(m("a") == ((2.0, 2L)))
    assert(m("b") == ((5.0, 1L)))
    assert(m("c") == ((9.0, 1L)))
  }

  test("approxDistinctCounts: one-pass HLL within rsd of exact") {
    import spark.implicits._
    val df = (1 to 10000).map(i => (i.toLong, (i % 97).toLong)).toDF("uniq", "mod97")
    val approx = Stats.approxDistinctCounts(df, Seq("uniq", "mod97"), rsd = 0.02)
    assert(math.abs(approx("uniq") - 10000.0) / 10000.0 < 0.06)
    assert(math.abs(approx("mod97") - 97.0) / 97.0 < 0.06)
    assert(Stats.approxDistinctCounts(df, Nil).isEmpty)
  }

  test("quantiles/histogram on an all-null column fail with a clear message") {
    import spark.implicits._
    val ddf = m.register(Seq(Option.empty[Double], None).toDF("allnull"))
    val e1 = intercept[IllegalArgumentException] {
      Stats.quantiles(ddf.df, "allnull", Seq(0.5))
    }
    assert(e1.getMessage.contains("allnull"))
    val e2 = intercept[IllegalArgumentException] {
      Stats.histogramDF(ddf.df, "allnull", 4)
    }
    assert(e2.getMessage.contains("allnull"))
    val e3 = intercept[IllegalArgumentException] {
      graft.operators.Binning.binningEqualInterval(ddf, "allnull", 4)
    }
    assert(e3.getMessage.contains("allnull"))
  }

  test("correlation and covariance agree with closed form") {
    import spark.implicits._
    val ddf = m.register(Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0)).toDF("x", "y"))
    assert(math.abs(graft.operators.Aggregations.correlation(ddf, "x", "y") - 1.0) < 1e-12)
    assert(math.abs(graft.operators.Aggregations.covariance(ddf, "x", "y") - 2.0) < 1e-12)
  }

  test("skewReport: exact counts, NULL sentinel key, deterministic tie-break") {
    import spark.implicits._
    val df = Seq(
      (Some("a"), 1), (Some("a"), 2), (Some("a"), 3),   // a ×3 — hottest
      (Some("b"), 4), (Some("b"), 5), (None, 6), (None, 7)).toDF("k", "v")
    val rows = graft.stats.Stats.skewReport(df, Seq("k", "v")).collect()
      .map(r => r.getString(0) -> r).toMap
    val k = rows("k")
    assert(k.getLong(1) == 7 && k.getLong(2) == 3)        // n_rows, ndv (a, b, <NULL>)
    assert(k.getString(3) == "a" && k.getLong(4) == 3)    // top key ×3
    assert(math.abs(k.getDouble(5) - 3.0 * 3 / 7) < 1e-12)
    val v = rows("v")                                     // all unique → ties
    assert(v.getLong(2) == 7 && v.getLong(4) == 1)
    assert(v.getString(3) == "7", "tie-break = (count, key)-max → highest key string")
    assert(v.getDouble(5) == 1.0)                         // uniform
    // null-heavy column: the sentinel must surface as the hot key
    val nh = Seq((None: Option[String], 1), (None, 2), (Some("x"), 3))
      .toDF("j", "v")
    val r = graft.stats.Stats.skewReport(nh, Seq("j")).collect().head
    assert(r.getString(3) == "<NULL>" && r.getLong(4) == 2)
  }

  test("corrMatrix: one-pass pairwise matrix, listwise deletion") {
    import spark.implicits._
    // y = 2x (r = 1), z = -x (r = -1), so corr(y,z) = -1 as well
    val df = Seq(
      (1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0), (4.0, 8.0, -4.0)
    ).toDF("x", "y", "z")
    val out = Stats.corrMatrix(df, Seq("x", "y", "z"))
      .orderBy("col_x", "col_y").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(out.length == 3)
    assert(out.forall { case (_, _, c) => math.abs(math.abs(c) - 1.0) < 1e-12 })
    assert(out.find(p => p._1 == "x" && p._2 == "y").get._3 > 0)
    assert(out.find(p => p._1 == "x" && p._2 == "z").get._3 < 0)
    assert(out.find(p => p._1 == "y" && p._2 == "z").get._3 < 0)

    // a null in ANY column drops the whole row (listwise): the outlier
    // row that would break y=2x is removed by its null z
    val withNull = df.unionAll(
      Seq((10.0, -99.0, Option.empty[Double])).toDF("x", "y", "z"))
    val xy = Stats.corrMatrix(withNull, Seq("x", "y", "z"))
      .filter($"col_x" === "x" && $"col_y" === "y").collect().head.getDouble(2)
    assert(math.abs(xy - 1.0) < 1e-12)

    // decimal-exact path agrees on 2-decimal data
    val exact = Stats.corrMatrix(df, Seq("x", "y"), decimalScale = Some(2))
      .collect().head.getDouble(2)
    assert(math.abs(exact - 1.0) < 1e-12)

    // zero-variance column: undefined correlation surfaces as NaN — also
    // when the CROSS-comoment carries float residue that would otherwise
    // read residue/0.0 = ±Infinity (r14 review)
    val konst = df.withColumn("k", org.apache.spark.sql.functions.lit(5.0))
    val kc = Stats.corrMatrix(konst, Seq("x", "k")).collect().head.getDouble(2)
    assert(kc.isNaN)
    val residue = Seq((0.1, 7.0), (0.2, 7.0), (0.3, 7.0))
      .toDF("b", "k2") // k2 constant; sums of 0.1-family doubles carry residue
    val kc2 = Stats.corrMatrix(residue, Seq("b", "k2")).collect().head.getDouble(2)
    assert(kc2.isNaN, s"zero variance must be NaN, not Infinity: $kc2")

    // alias-collision safety: names containing '__' must not cross-read
    // each other's pair sums (positional access) — (x, y__z) vs (x__y, z)
    val tricky = Seq(
      (1.0, 2.0, 3.0, -1.0), (2.0, 4.0, 5.0, -2.0),
      (3.0, 6.0, 9.0, -3.0), (4.0, 8.0, 11.0, -4.0)
    ).toDF("x", "y__z", "x__y", "z")
    val tout = Stats.corrMatrix(tricky, Seq("x", "y__z", "x__y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(tout(("x", "y__z")) - 1.0) < 1e-12, s"got $tout")
    assert(math.abs(tout(("x", "z")) + 1.0) < 1e-12)

    intercept[IllegalArgumentException](Stats.corrMatrix(df, Seq("x")))
    intercept[IllegalArgumentException](Stats.corrMatrix(df, Seq("x", "x")))
    intercept[IllegalArgumentException]( // <2 complete rows
      Stats.corrMatrix(df.limit(1), Seq("x", "y")))
  }

  test("psiDrift: zero on identity, clamped excursions, spine completeness") {
    import spark.implicits._
    val ref = (0 until 100).map(_.toDouble).toDF("v")
    // identical snapshots: every term is exactly (p-p)*ln(1) = 0
    val same = Stats.psiDrift(ref, ref, "v", nBins = 5).collect()
    assert(same.length == 5 && same.forall(_.getAs[Double]("psi_term") == 0.0))
    assert(same.map(_.getAs[Long]("bin")).toSeq == (0L until 5L))
    // out-of-range current values clamp into the EDGE bins, not dropped
    val cur = Seq(-500.0, -500.0, 1e6, 1e6, 1e6).toDF("v")
    val clamped = Stats.psiDrift(ref, cur, "v", nBins = 5)
      .collect().map(r => r.getAs[Long]("bin") -> r.getAs[Long]("cur_cnt")).toMap
    assert(clamped(0L) == 2L && clamped(4L) == 3L &&
      clamped.values.sum == 5L, s"got $clamped")
    // a genuine shift reads positive; all bins present even when empty
    val shifted = Stats.psiDrift(ref, ref.select((col("v") + 60).as("v")), "v",
      nBins = 5)
    val rows = shifted.collect()
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Double]("psi_term")).sum > 0.25, "major shift")
    // NULLs excluded, not binned
    val withNulls = (Seq.fill(3)(Option.empty[Double]) ++
      (0 until 100).map(d => Some(d.toDouble))).toDF("v")
    val nn = Stats.psiDrift(withNulls, withNulls, "v", nBins = 4).collect()
    assert(nn.map(_.getAs[Long]("ref_cnt")).sum == 100L)
    // degenerate reference (min == max): width 1, everything in bin 0
    val const = Seq.fill(10)(7.0).toDF("v")
    val deg = Stats.psiDrift(const, const, "v", nBins = 3).collect()
    assert(deg.find(_.getAs[Long]("bin") == 0L).get.getAs[Long]("ref_cnt") == 10L)
    intercept[IllegalArgumentException](
      Stats.psiDrift(ref.limit(0), ref, "v", nBins = 5))
    intercept[IllegalArgumentException](Stats.psiDrift(ref, ref, "v", nBins = 1))
  }

  test("categoricalDrift: identity zero, disjoint = ln 2, one-sided half") {
    import spark.implicits._
    val ref = Seq("a", "a", "b", "b", "c", "c").toDF("k")
    // identical mixes: JS divergence is exactly zero
    val same = Stats.categoricalDrift(ref, ref, "k").collect()
    assert(same.length == 3 && same.forall(_.getAs[Double]("js_term") == 0.0))
    // disjoint category sets: the theoretical maximum, ln 2
    val cur = Seq("x", "y").toDF("k")
    val dis = Stats.categoricalDrift(ref, cur, "k").collect()
    assert(dis.length == 5)
    assert(math.abs(dis.map(_.getAs[Double]("js_term")).sum - math.log(2)) < 1e-12)
    // a category on one side only carries 0.5·p·ln2
    val oneSided = Stats.categoricalDrift(ref, Seq("a", "b", "c", "c").toDF("k"), "k")
      .collect().map(r => r.getAs[String]("category") -> r).toMap
    assert(oneSided("a").getAs[Long]("cur_cnt") == 1L)
    // an empty current side reads as maximal drift, not an error
    val gone = Stats.categoricalDrift(ref, cur.limit(0), "k").collect()
    assert(math.abs(gone.map(_.getAs[Double]("js_term")).sum - 0.5 * math.log(2)) < 1e-12)
    assert(gone.forall(_.getAs[Double]("cur_pct") == 0.0))
    // NULL categories excluded on both sides
    val withNull = Seq(Some("a"), Some("b"), None).toDF("k")
    assert(Stats.categoricalDrift(withNull, withNull, "k").count() == 2)
  }

  test("weightedSummary: frequency-weight moments, NULL exclusion, negative-weight guard") {
    import spark.implicits._
    // weights are integer multiplicities here, so the weighted stats must
    // equal the UNweighted stats of the physically-replicated frame
    val rows = Seq((2.0, 1.0), (4.0, 3.0), (10.0, 2.0))
    val df = rows.toDF("x", "w")
    val out = Stats.weightedSummary(df, "w", Seq("x")).collect()(0)
    val expanded = rows.flatMap { case (x, w) => Seq.fill(w.toInt)(x) }
    val em = expanded.sum / expanded.size
    val ev = expanded.map(v => (v - em) * (v - em)).sum / expanded.size
    assert(out.getString(0) == "x" && out.getLong(1) == 3)
    assert(out.getDouble(2) == 6.0)                        // w_total
    assert(math.abs(out.getDouble(3) - em) < 1e-12)        // w_mean
    assert(math.abs(out.getDouble(4) - ev) < 1e-12)        // w_var (population)
    assert(out.getDouble(5) == 2.0 && out.getDouble(6) == 10.0)
    // a NULL x row contributes neither value nor weight to that column
    val withNull = Seq((Some(2.0), 1.0), (None, 100.0), (Some(4.0), 1.0))
      .toDF("x", "w")
    val n = Stats.weightedSummary(withNull, "w", Seq("x")).collect()(0)
    assert(n.getLong(1) == 2 && n.getDouble(2) == 2.0 && n.getDouble(3) == 3.0)
    // all-null column: NULL moments, zero weight, no crash
    val allNull = Seq((None: Option[Double], 1.0)).toDF("x", "w")
    val an = Stats.weightedSummary(allNull, "w", Seq("x")).collect()(0)
    assert(an.getLong(1) == 0 && an.getDouble(2) == 0.0 && an.isNullAt(3))
    // negative weights fail the job loudly — and so do NaN weights,
    // which 'w < 0' alone would miss (NaN sorts greatest) while they
    // silently NaN every moment (r14 review)
    intercept[IllegalArgumentException] {
      Stats.weightedSummary(Seq((1.0, -0.5)).toDF("x", "w"), "w", Seq("x"))
    }
    intercept[IllegalArgumentException] {
      Stats.weightedSummary(Seq((1.0, Double.NaN)).toDF("x", "w"), "w", Seq("x"))
    }
    // NULL weights fail too (r14 review): a failed weight-join would
    // leave rows counted in n/min/max yet absent from every Σw moment
    intercept[IllegalArgumentException] {
      Stats.weightedSummary(
        Seq((1.0, Some(1.0)), (2.0, None)).toDF("x", "w"), "w", Seq("x"))
    }
  }

  test("percentileRank: midrank ECDF, ties, NULLs, multi-column blend") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(10.0)), (2L, Some(20.0)), (3L, Some(20.0)),
      (4L, Some(40.0)), (5L, None)
    ).toDF("id", "x")
    val out = Stats.percentileRank(df, Seq("x"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    // n = 4 non-null; 10 → 0.5/4; the tied 20s share (1 + 0.5·2)/4; 40 → 3.5/4
    assert(out(1L) == 0.125)
    assert(out(2L) == 0.5 && out(3L) == 0.5, "tied values share a midrank")
    assert(out(4L) == 0.875)
    assert(out(5L).isNaN, "NULL keeps NULL rank")
    // matches percent_rank's midrank cousin: mean pr over distinct ranks
    // is 0.5 by construction on any column
    val m2 = Stats.percentileRank(df.filter(col("x").isNotNull), Seq("x"))
      .agg(org.apache.spark.sql.functions.avg("x_pr")).first().getDouble(0)
    assert(math.abs(m2 - 0.5) < 1e-12)
    // second column + existing-name guard
    val two = Stats.percentileRank(
      Seq((1.0, 5.0), (2.0, 6.0)).toDF("a", "b"), Seq("a", "b"))
    assert(two.columns.toSet == Set("a", "b", "a_pr", "b_pr"))
    intercept[IllegalArgumentException] {
      Stats.percentileRank(two, Seq("a"))
    }
  }
}
