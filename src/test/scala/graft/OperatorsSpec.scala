package graft

import graft.core.DDFManager
import graft.operators._

/** Operator semantics pinned against reference behavior (SURVEY §2.2-2.8),
  * re-derived on tiny fixtures in the reference's golden-value style.
  */
class OperatorsSpec extends SparkTestBase {

  private lazy val m = DDFManager(spark)

  private def left() = {
    import spark.implicits._
    m.register(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "lv"))
  }
  private def right() = {
    import spark.implicits._
    m.register(Seq((2, "x"), (3, "y"), (3, "y2"), (4, "z")).toDF("k", "rv"))
  }

  test("join cardinalities per type (reference JoinHandlerSpec style)") {
    val l = left(); val r = right()
    assert(Joins.join(l, r, "inner", byColumns = Seq("k")).numRows == 3)
    assert(Joins.join(l, r, "left", byColumns = Seq("k")).numRows == 4)  // 1 unmatched + 3
    assert(Joins.join(l, r, "right", byColumns = Seq("k")).numRows == 4)
    assert(Joins.join(l, r, "full", byColumns = Seq("k")).numRows == 5)
    // true semi: one row per matching LEFT row (no per-match dups, SURVEY J5)
    assert(Joins.join(l, r, "semi", byColumns = Seq("k")).numRows == 2)
    assert(Joins.join(l, r, "anti", byColumns = Seq("k")).numRows == 1)
  }

  test("semi join output keeps left columns only") {
    val out = Joins.join(left(), right(), "semi", byColumns = Seq("k"))
    assert(out.columnNames == Seq("k", "lv"))
  }

  test("merge requires identical schema and preserves duplicates") {
    val l = left()
    assert(Joins.merge(l, l).numRows == 6)
    import spark.implicits._
    val other = m.register(Seq(("a", 1)).toDF("x", "y"))
    intercept[IllegalArgumentException] { Joins.merge(l, other) }
  }

  test("aggregate spec parser: alias, default alias, count(*)") {
    import Aggregations._
    val specs = parseSpecs("a, b, s=sum(x), min(y), count(*)")
    assert(specs(0) == GroupCol("a"))
    assert(specs(2) == AggSpec("sum", "x", "s"))
    assert(specs(3) == AggSpec("min", "y", "MIN_y"))
    assert(specs(4) == AggSpec("count", "*", "COUNT_all"))
    intercept[IllegalArgumentException] {
      aggColumn(AggSpec("bogus", "x", "x"))
    }
  }

  test("aggregate null-cleans referenced columns first (reference A2)") {
    import spark.implicits._
    val ddf = m.register(Seq(
      (Some(1), Some("g1")), (None, Some("g1")), (Some(5), None), (Some(3), Some("g2"))
    ).toDF("x", "g"))
    // null x row AND null g row both dropped before aggregation
    val res = Aggregations.aggregateToMap(ddf, "g, sum(x)")
    assert(res == Map("g1" -> Seq(1L), "g2" -> Seq(3L)))
  }

  test("2-step groupBy carries grouping cols; agg without groupBy throws") {
    import spark.implicits._
    val ddf = m.register(Seq(("a", 1), ("a", 2), ("b", 3)).toDF("g", "x"))
    val g = Aggregations.groupByStep1(ddf, Seq("g"))
    val out = Aggregations.groupByStep2(g, Seq("t=sum(x)"))
    assert(out.df.collect().map(r => (r.getString(0), r.getLong(1))).toMap ==
      Map("a" -> 3L, "b" -> 3L))
    intercept[IllegalArgumentException] { Aggregations.groupByStep2(ddf, Seq("t=sum(x)")) }
  }

  test("dropNA row threshold formula (reference M1)") {
    import spark.implicits._
    val ddf = m.register(Seq(
      (Some(1), Some(1), Some(1)),
      (None, Some(2), Some(2)),
      (None, None, Some(3)),
      (None, None, None)
    ).toDF("a", "b", "c"))
    assert(MissingData.dropNARows(ddf, how = "any").numRows == 1)
    assert(MissingData.dropNARows(ddf, how = "all").numRows == 3)
    // thresh = min non-nulls
    assert(MissingData.dropNARows(ddf, thresh = Some(2)).numRows == 2)
    intercept[IllegalArgumentException] { MissingData.dropNARows(ddf, thresh = Some(4)) }
  }

  test("dropNA column axis drops columns with nulls (reference M2)") {
    import spark.implicits._
    val ddf = m.register(Seq(
      (Some(1), Some(1), Option.empty[Int]),
      (Some(2), None, None)
    ).toDF("a", "b", "c"))
    assert(MissingData.dropNAColumns(ddf, how = "any").columnNames == Seq("a"))
    assert(MissingData.dropNAColumns(ddf, how = "all").columnNames == Seq("a", "b"))
  }

  test("fillNA by value, map, and column mean (reference M3)") {
    import spark.implicits._
    val ddf = m.register(Seq(
      (Some(2.0), Some("x")), (None, None), (Some(4.0), Some("y"))
    ).toDF("x", "s"))
    val filled = MissingData.fillNAValue(ddf, 0.0, Seq("x"))
    assert(filled.df.agg(org.apache.spark.sql.functions.sum("x")).first().getDouble(0) == 6.0)
    val filledMean = MissingData.fillNAWithAggregate(
      m.register(ddf.df.select("x")), "mean")
    assert(filledMean.df.collect().map(_.getDouble(0)).sorted.toSeq == Seq(2.0, 3.0, 4.0))
    val filledMap = MissingData.fillNAMap(ddf, Map("s" -> "zz"))
    assert(filledMap.df.filter("s = 'zz'").count() == 1)
  }

  test("fillNA aggregate on INTEGRAL columns: min/max/sum don't CCE (round-1 advice)") {
    import spark.implicits._
    def ints = m.register(Seq(Some(2), None, Some(6)).toDF("i"))
    val mx = MissingData.fillNAWithAggregate(ints, "max")
    assert(mx.df.collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 6, 6))
    val mn = MissingData.fillNAWithAggregate(ints, "min")
    assert(mn.df.collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 2, 6))
    val sm = MissingData.fillNAWithAggregate(ints, "sum")
    assert(sm.df.collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 6, 8))
    def longs = m.register(Seq(Some(3L), None).toDF("l"))
    assert(MissingData.fillNAWithAggregate(longs, "max")
      .df.collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 3L))
  }

  test("fillNA aggregate exactDecimals: decimal-exact mean/sum, no double drift") {
    import spark.implicits._
    // 0.1 + 0.2 in binary doubles is 0.30000000000000004; through a
    // decimal(38,1) sum it is exactly 0.3, so the mean fill is exactly 0.15
    def xs = m.register(Seq(Some(0.1), Some(0.2), None).toDF("x"))
    val mean = MissingData.fillNAWithAggregate(xs, "mean", exactDecimals = Some(1))
      .df.collect().map(_.getDouble(0)).sorted.toSeq
    assert(mean == Seq(0.1, 0.15, 0.2), s"exact-decimal mean, got $mean")
    val sm = MissingData.fillNAWithAggregate(xs, "sum", exactDecimals = Some(1))
      .df.collect().map(_.getDouble(0)).sorted.toSeq
    assert(sm == Seq(0.1, 0.2, 0.3), s"exact-decimal sum, got $sm")
  }

  test("sampleExact returns exactly n for small n out of a large frame") {
    import spark.implicits._
    val ddf = m.register((1 to 5000).map(i => (i, s"r$i")).toDF("k", "v"))
    // small n is where naive fraction math (n/total * 1.5) under-samples
    for (n <- Seq(1, 3, 7, 100))
      assert(Views.sampleExact(ddf, n).numRows == n, s"n=$n must be exact")
    // n >= total degenerates to a copy
    assert(Views.sampleExact(ddf, 5000).numRows == 5000)
  }

  test("binning custom breaks: drops out-of-range, labels, factor levels (reference B1/B4)") {
    import spark.implicits._
    val ddf = m.register(Seq(0.5, 1.0, 2.0, 5.0, 7.5, 10.0, 12.0).toDF("v"))
    val binned = Binning.binningCustom(ddf, "v", Seq(1.0, 5.0, 10.0),
      includeLowest = true, right = true)
    // 0.5 and 12.0 dropped; labels [1,5] and (5,10]
    assert(binned.numRows == 5)
    val counts = binned.df.groupBy("v").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("[1,5]" -> 3L, "(5,10]" -> 2L))
    assert(binned.factorInfo("v").get.levels == Seq("[1,5]", "(5,10]"))
    // right=false, excludeLowest (reference-exact): open-open intervals,
    // ALL boundary values dropped → (1,5)={2.0}, (5,10)={7.5}
    val b2 = Binning.binningCustom(m.register(Seq(0.5, 1.0, 2.0, 5.0, 7.5, 10.0, 12.0).toDF("v")),
      "v", Seq(1.0, 5.0, 10.0), includeLowest = false, right = false)
    val c2 = b2.df.groupBy("v").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c2 == Map("(1,5)" -> 1L, "(5,10)" -> 1L))
  }

  test("binning equal-freq produces balanced bins") {
    import spark.implicits._
    val ddf = m.register((1 to 100).map(_.toDouble).toDF("v"))
    val binned = Binning.binningEqualFreq(ddf, "v", 4, includeLowest = true, exact = true)
    val sizes = binned.df.groupBy("v").count().collect().map(_.getLong(1))
    assert(sizes.length == 4 && sizes.forall(s => s >= 24 && s <= 26))
  }

  test("scaleMinMax maps max→1 min→0; scaleStandard zero-means (reference U3)") {
    import spark.implicits._
    val ddf = m.register(Seq(0.0, 5.0, 10.0).toDF("x"))
    val mm = Transforms.scaleMinMax(ddf).df.collect().map(_.getDouble(0)).sorted
    assert(mm.toSeq == Seq(0.0, 0.5, 1.0))
    val st = Transforms.scaleStandard(m.register(Seq(0.0, 5.0, 10.0).toDF("x")))
      .df.agg(org.apache.spark.sql.functions.avg("x")).first().getDouble(0)
    assert(math.abs(st) < 1e-12)
  }

  test("scaleRobust: median/IQR semantics, outlier immunity, constant column") {
    import spark.implicits._
    // 1..9 plus a wild outlier: median 5.5 shifts little, IQR stays put —
    // unlike z-scoring, the outlier can't crush the inliers' spread
    val vals = (1 to 9).map(_.toDouble) :+ 1.0e6
    val out = Transforms.scaleRobust(m.register(vals.toDF("x")),
        Seq("x"), exact = true)
      .df.collect().map(_.getDouble(0)).sorted
    // exact quartiles of the 10 values: q1=3.25, med=5.5, q3=7.75, iqr=4.5
    assert(math.abs(out(0) - (1.0 - 5.5) / 4.5) < 1e-12)
    assert(math.abs(out(8) - (9.0 - 5.5) / 4.5) < 1e-12)
    // inliers stay O(1) even with the 1e6 outlier present
    assert(out.take(9).forall(v => math.abs(v) < 2.0))
    // constant column → 0.0 (the scaleStandard convention)
    val const = Transforms.scaleRobust(m.register(Seq(7.0, 7.0, 7.0).toDF("x")),
      Seq("x"), exact = true).df.collect().map(_.getDouble(0))
    assert(const.forall(_ == 0.0))
    // approx path lands within sketch tolerance of exact on smooth data
    val big = m.register((1 to 10000).map(_.toDouble).toDF("x"))
    val approx = Transforms.scaleRobust(big, Seq("x")).df
      .agg(org.apache.spark.sql.functions.max("x")).first().getDouble(0)
    assert(math.abs(approx - 1.0) < 0.05, s"approx max scaled: $approx")
  }

  test("indexEncode: frequencyDesc ids, value tie-break, NULL passthrough") {
    import spark.implicits._
    val ddf = m.register(Seq("b", "b", "b", "a", "a", "c", "a", null)
      .toDF("cat"))
    val out = Transforms.indexEncode(ddf, "cat", "cat_id").df
      .collect().map(r => Option(r.getString(0)) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1)))
    val byCat = out.toMap
    assert(byCat(Some("a")) == 0L, "a (3 occurrences, ties b, wins by value)")
    assert(byCat(Some("b")) == 1L && byCat(Some("c")) == 2L)
    assert(byCat(None) == -1L, "NULL category keeps a NULL id")
    assert(out.length == 8, "every row labeled exactly once")
    intercept[IllegalArgumentException] {
      Transforms.indexEncode(ddf, "cat", "cat") // output collides
    }
  }

  test("transformUDF adds computed column (reference P9)") {
    import spark.implicits._
    val ddf = m.register(Seq((2, 3)).toDF("a", "b"))
    val out = Transforms.transformUDF(ddf, "c", "a * b + 1")
    assert(out.df.select("c").first().getInt(0) == 7)
  }

  test("subset supports regex filtering via rlike (reference rejects grep)") {
    import spark.implicits._
    val ddf = m.register(Seq("apple", "banana", "cherry").toDF("s"))
    val out = Views.subset(ddf, Seq("s"), "s rlike '^.a'")
    assert(out.df.collect().map(_.getString(0)).toSet == Set("banana"))
  }

  test("subset structured filter AST compiles to a Catalyst predicate (ddf-core parity)") {
    import spark.implicits._
    import Views.Filter._
    val ddf = m.register(Seq(
      ("apple", 1), ("banana", 7), ("cherry", 9)).toDF("s", "n"))
    // (n > 5 AND NOT n = 9) OR grep_ic '^AP' → banana, apple
    val f = Or(
      And(Cmp("gt", ColRef("n"), Lit(5)), Not(Cmp("eq", ColRef("n"), Lit(9)))),
      Grep("s", "^ap.*", ignoreCase = true))
    val out = Views.subset(ddf, Seq("s"), f)
    assert(out.df.collect().map(_.getString(0)).toSet == Set("apple", "banana"))
  }

  test("Grep ignoreCase keeps Perl escape classes intact (\\d must match digits)") {
    import spark.implicits._
    import Views.Filter._
    val ddf = m.register(Seq("room 12", "no digits here", "App42").toDF("s"))
    // uppercasing the pattern would turn \d into \D (non-digit) and match
    // the wrong rows; the (?iu) flag leaves the pattern untouched
    val digits = Views.subset(ddf, Seq("s"), Grep("s", "\\d+", ignoreCase = true))
    assert(digits.df.collect().map(_.getString(0)).toSet == Set("room 12", "App42"))
    val ic = Views.subset(ddf, Seq("s"), Grep("s", "^app\\d+", ignoreCase = true))
    assert(ic.df.collect().map(_.getString(0)).toSet == Set("App42"))
  }

  test("fillDirectional ffill/bfill over an ordering column (extension of M3)") {
    import spark.implicits._
    val ddf = m.register(Seq(
      (1, Some(10.0)), (2, None), (3, None), (4, Some(40.0)), (5, None)
    ).toDF("t", "x"))
    val ff = MissingData.fillDirectional(ddf.copy(), "ffill", "t", Seq("x"))
      .df.orderBy("t").collect().map(r => Option(r.get(1)))
    assert(ff.toSeq == Seq(Some(10.0), Some(10.0), Some(10.0), Some(40.0), Some(40.0)))
    val bf = MissingData.fillDirectional(ddf.copy(), "bfill", "t", Seq("x"))
      .df.orderBy("t").collect().map(r => Option(r.get(1)))
    assert(bf.toSeq == Seq(Some(10.0), Some(40.0), Some(40.0), Some(40.0), None))
  }

  test("fillDirectional global: deterministic under tied ordering keys") {
    import spark.implicits._
    // many tied groups spanning every range-partition boundary: with 32
    // shuffle partitions and 8 distinct keys over 4000 rows, most
    // partitions hold (or border) a tie group. Semantics under ties:
    // a row fills from strictly earlier (ffill) / later (bfill) KEY
    // groups only, and a tied group's carry is its max (ffill) / min
    // (bfill) non-null value — so the expected output is computable
    // per key group, independent of physical layout.
    val rows = (0 until 4000).map { i =>
      val key = i / 500                       // 8 tied groups of 500 rows
      // group g carries non-nulls only when g is even; values vary
      // within the group so the tiebreak matters
      val v = if (key % 2 == 0 && i % 7 == 0) Some((key * 100 + i % 50).toDouble)
              else None
      (key, i.toLong, v)
    }
    val df = rows.toDF("t", "id", "x")
    val groupMax = rows.groupBy(_._1).map { case (k, rs) =>
      k -> rs.flatMap(_._3).maxOption }
    val groupMin = rows.groupBy(_._1).map { case (k, rs) =>
      k -> rs.flatMap(_._3).minOption }
    def expectFf(key: Int): Option[Double] =
      (0 until key).flatMap(groupMax(_)).lastOption
    def expectBf(key: Int): Option[Double] =
      ((key + 1) until 8).flatMap(groupMin(_)).headOption
    for (_ <- 1 to 3) { // repartition noise: same answer every run
      val ff = MissingData.fillDirectional(m.register(df.repartition(13)), "ffill", "t", Seq("x"))
        .df.collect()
      ff.foreach { r =>
        val key = r.getInt(0); val orig = rows(r.getLong(1).toInt)._3
        val got = Option(r.get(2)).map(_.asInstanceOf[Double])
        assert(got == orig.orElse(expectFf(key)), s"ffill key=$key id=${r.getLong(1)}")
      }
      val bf = MissingData.fillDirectional(m.register(df.repartition(7)), "bfill", "t", Seq("x"))
        .df.collect()
      bf.foreach { r =>
        val key = r.getInt(0); val orig = rows(r.getLong(1).toInt)._3
        val got = Option(r.get(2)).map(_.asInstanceOf[Double])
        assert(got == orig.orElse(expectBf(key)), s"bfill key=$key id=${r.getLong(1)}")
      }
    }
  }

  test("fillDirectional global: non-comparable (array) fill columns still fill") {
    import spark.implicits._
    // arrays are not java.lang.Comparable — the deterministic tiebreak
    // must fall back to the legacy carry instead of a ClassCastException
    val ddf = m.register(Seq(
      (1, Some(Seq(1.0, 2.0))), (2, None), (3, None), (4, Some(Seq(4.0))), (5, None)
    ).toDF("t", "xs"))
    val ff = MissingData.fillDirectional(ddf.copy(), "ffill", "t", Seq("xs"))
      .df.orderBy("t").collect()
      .map(r => Option(r.get(1)).map(_ => r.getSeq[Double](1).toList))
    assert(ff.toSeq == Seq(Some(List(1.0, 2.0)), Some(List(1.0, 2.0)),
      Some(List(1.0, 2.0)), Some(List(4.0)), Some(List(4.0))))
    val bf = MissingData.fillDirectional(ddf.copy(), "bfill", "t", Seq("xs"))
      .df.orderBy("t").collect()
      .map(r => Option(r.get(1)).map(_ => r.getSeq[Double](1).toList))
    assert(bf.toSeq == Seq(Some(List(1.0, 2.0)), Some(List(4.0)),
      Some(List(4.0)), Some(List(4.0)), None))
  }

  test("mapReduce: typed groupByKey + mapGroups (reference U2)") {
    import spark.implicits._
    val ddf = m.register(Seq(("a", 1), ("a", 2), ("b", 5)).toDF("g", "x"))
    val out = Transforms.mapReduce[String, (String, Long)](ddf)(_.getString(0)) {
      case (k, rows) => (k, rows.map(_.getInt(1).toLong).sum)
    }
    assert(out.df.collect().map(r => (r.getString(0), r.getLong(1))).toMap ==
      Map("a" -> 3L, "b" -> 5L))
  }

  test("mapPartitionsRows escape hatch preserves schema contract") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val ddf = m.register(Seq(1, 2, 3).toDF("v"))
    val schema = StructType(Seq(StructField("v2", IntegerType)))
    val out = Transforms.mapPartitionsRows(ddf, schema)(rows =>
      rows.map(r => org.apache.spark.sql.Row(r.getInt(0) * 2)))
    assert(out.df.collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 4, 6))
  }

  test("views: project, head, top, sample") {
    import spark.implicits._
    val ddf = m.register((1 to 50).map(i => (i, s"s$i")).toDF("k", "s"))
    assert(Views.project(ddf, Seq("k")).columnNames == Seq("k"))
    assert(Views.head(ddf, 5).size == 5)
    val top3 = Views.top(ddf, 3, "k", ascending = false).df.collect().map(_.getInt(0))
    assert(top3.toSeq == Seq(50, 49, 48))
    assert(Views.sampleExact(ddf, 10).numRows == 10)
    val s = Views.sample(ddf, 0.5, withReplacement = false, seed = 1).numRows
    assert(s > 5 && s < 45)
  }

  test("views: stratifiedSample is exact-n per stratum and deterministic") {
    import spark.implicits._
    val ddf = m.register((1L to 300L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("k", "g"))
    val s1 = Views.stratifiedSample(ddf, "g", 10, "k").df.collect()
    assert(s1.length == 20, "10 per stratum × 2 strata")
    assert(s1.count(_.getString(1) == "a") == 10 && s1.count(_.getString(1) == "b") == 10)
    // pure function of the data: a second run picks the SAME rows
    val s2 = Views.stratifiedSample(ddf, "g", 10, "k").df.collect()
    assert(s1.map(_.getLong(0)).toSet == s2.map(_.getLong(0)).toSet)
    // n larger than a stratum degenerates to the whole stratum
    val all = Views.stratifiedSample(ddf, "g", 1000, "k").df.count()
    assert(all == 300)
  }

  test("views: hashSample is deterministic, monotone in rate, and key-pure") {
    import spark.implicits._
    val ddf = m.register((1L to 2000L).map(i => (i, s"v$i")).toDF("k", "v"))
    val a = Views.hashSample(ddf, "k", 100).df.collect().map(_.getLong(0)).toSet
    val b = Views.hashSample(ddf, "k", 100).df.collect().map(_.getLong(0)).toSet
    assert(a == b, "same data + rate → same rows")
    assert(math.abs(a.size - 200) < 80, s"~10% of 2000 expected, got ${a.size}")
    val wider = Views.hashSample(ddf, "k", 300).df.collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(wider), "raising the rate only ADDS rows (stable holdouts)")
    intercept[IllegalArgumentException](Views.hashSample(ddf, "k", 1001))
    // stride-allocated keys (all ≡ 0 mod 1000) must still sample ~rate —
    // the low bits of k·A are a bijection of k mod 1000, so a low-bit
    // bucket would select 0% or 100% here (code-review regression)
    val strided = m.register((1L to 2000L).map(_ * 1000L).toDF("k"))
    val sn = Views.hashSample(strided, "k", 100).df.count()
    assert(sn > 100 && sn < 320, s"~10% of 2000 stride-1000 keys expected, got $sn")
  }

  test("semistructured: extractJson parses with schema, nulls malformed rows; inference recovers fields") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val df = Seq(
      (1L, """{"k": 7, "tag": "a"}"""),
      (2L, """{"k": 9}"""),
      (3L, "not json at all"),
      (4L, null.asInstanceOf[String])
    ).toDF("id", "props")
    val schema = StructType(Seq(StructField("k", IntegerType), StructField("tag", StringType)))
    val out = Semistructured.extractJson(df, "props", schema).orderBy("id").collect()
    assert(out(0).getStruct(2).getInt(0) == 7 && out(0).getStruct(2).getString(1) == "a")
    assert(out(1).getStruct(2).getInt(0) == 9 && out(1).getStruct(2).isNullAt(1))
    assert(out(2).isNullAt(2) || out(2).getStruct(2).isNullAt(0),
      "malformed JSON must yield a null struct, not an exception")
    assert(out(3).isNullAt(2))
    // ad-hoc path extraction
    val p = Semistructured.jsonPath(df, "props", "$.tag", "tag").orderBy("id").collect()
    assert(p(0).getString(2) == "a" && p(1).isNullAt(2))
    // bounded-sample inference recovers both fields with usable types
    val inferred = Semistructured.inferJsonSchema(df, "props", sampleN = 10)
    assert(inferred.fieldNames.toSet.intersect(Set("k", "tag")) == Set("k", "tag"),
      s"inferred: $inferred")
    intercept[IllegalArgumentException](Semistructured.inferJsonSchema(df, "props", 0))
  }
}
