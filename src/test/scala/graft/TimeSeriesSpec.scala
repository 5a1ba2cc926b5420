package graft

import graft.core.DDFManager
import graft.operators.{Aggregations, TimeSeries}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** TimeSeries resample/interpolate + multi-level aggregation (cube /
  * grouping sets) — semantics on hand-built frames where every expected
  * value is computable by eye.
  */
class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("resample densifies per-key spans and zero-fills gap counts") {
    // key A: observations in buckets 0 and 3 of a 1h grid -> 4 rows, 2 gaps
    // key B: single bucket -> 1 row, no gaps
    val df = Seq(
      ("A", ts("2024-01-01 00:10:00"), 1.0),
      ("A", ts("2024-01-01 00:50:00"), 3.0),
      ("A", ts("2024-01-01 03:20:00"), 5.0),
      ("B", ts("2024-01-02 07:30:00"), 9.0)
    ).toDF("k", "t", "v")
    val out = TimeSeries.resample(df, "t", Seq("k"), 3600L,
      Seq("s" -> sum("v"))).orderBy("k", "bucket").collect()
    assert(out.length == 5, s"4 A-buckets + 1 B-bucket, got ${out.length}")
    val a = out.filter(_.getString(0) == "A")
    assert(a.map(_.getLong(2)).toSeq == Seq(2L, 0L, 0L, 1L))
    assert(a(0).getDouble(3) == 4.0 && a(1).isNullAt(3) && a(3).getDouble(3) == 5.0)
    // B never pays for A's calendar
    assert(out.count(_.getString(0) == "B") == 1)
  }

  test("interpolate fills interior gaps linearly and clamps edges") {
    val dense = Seq(
      ("A", ts("2024-01-01 00:00:00"), Some(2.0)),
      ("A", ts("2024-01-01 01:00:00"), None),
      ("A", ts("2024-01-01 02:00:00"), None),
      ("A", ts("2024-01-01 03:00:00"), Some(8.0)),
      ("B", ts("2024-01-01 00:00:00"), None),
      ("B", ts("2024-01-01 01:00:00"), Some(5.0)),
      ("B", ts("2024-01-01 02:00:00"), None)
    ).toDF("k", "bucket", "v")
    val out = TimeSeries.interpolate(dense, "bucket", Seq("k"), "v", "vi")
      .orderBy("k", "bucket").collect()
    val a = out.filter(_.getString(0) == "A").map(_.getDouble(3)).toSeq
    assert(a == Seq(2.0, 4.0, 6.0, 8.0), s"linear 2->8 over 3 steps, got $a")
    val b = out.filter(_.getString(0) == "B").map(_.getDouble(3)).toSeq
    assert(b == Seq(5.0, 5.0, 5.0), "edge gaps clamp to nearest observation")
  }

  test("interpolate leaves all-null keys null") {
    val dense = Seq(("C", ts("2024-01-01 00:00:00"), Option.empty[Double]))
      .toDF("k", "bucket", "v")
    val out = TimeSeries.interpolate(dense, "bucket", Seq("k"), "v", "vi").collect()
    assert(out.head.isNullAt(3))
  }

  test("cube emits all 2^k levels with grouping_id disambiguation") {
    val m = DDFManager(spark)
    val ddf = m.register(Seq(("x", "p", 1.0), ("x", "q", 2.0), ("y", "p", 3.0))
      .toDF("a", "b", "v"), "cube_t")
    val out = Aggregations.cube(ddf, Seq("a", "b"), Seq("n=count(*)", "s=sum(v)"))
      .df.orderBy(col("gid"), col("a").asc_nulls_first, col("b").asc_nulls_first)
      .collect()
    // 3 leaves + 2 a-subtotals + 2 b-subtotals + 1 grand total
    assert(out.length == 8, s"got ${out.length}")
    assert(out.count(_.getAs[Int]("gid") == 0) == 3)
    val grand = out.last
    assert(grand.getAs[Int]("gid") == 3 && grand.isNullAt(0) && grand.isNullAt(1) &&
      grand.getAs[Long]("n") == 3L && grand.getAs[Double]("s") == 6.0)
    // first grouping column is the most significant grouping_id bit
    val aOnly = out.filter(r => r.getAs[Int]("gid") == 1)
    assert(aOnly.forall(r => r.getAs[String]("a") != null && r.getAs[String]("b") == null),
      "gid=1 must be (a kept, b rolled up)")
  }

  test("groupingSets computes only the requested combinations") {
    val m = DDFManager(spark)
    val ddf = m.register(Seq(("x", "p", 1.0), ("x", "q", 2.0), ("y", "p", 3.0))
      .toDF("a", "b", "v"), "gs_t")
    val out = Aggregations.groupingSets(ddf, Seq("a", "b"),
      Seq(Seq("a"), Nil), Seq("s=sum(v)"))
      .df.orderBy(col("gid"), col("a").asc_nulls_first).collect()
    // (a) subtotals: x, y; plus grand total — NO (a,b) leaves, NO (b)
    assert(out.length == 3, s"got ${out.length}")
    assert(out.map(_.getAs[Int]("gid")).toSeq == Seq(1, 1, 3))
    intercept[IllegalArgumentException](
      Aggregations.groupingSets(ddf, Seq("a"), Seq(Seq("zzz")), Seq("n=count(*)")))
  }

  test("rollingAgg: trailing RANGE window includes the exact boundary, per key") {
    val df = Seq(
      ("A", ts("2024-01-01 00:00:00"), 1.0),
      ("A", ts("2024-01-01 00:30:00"), 2.0),
      ("A", ts("2024-01-01 01:00:00"), 4.0),  // exactly 3600s after row 1
      ("A", ts("2024-01-01 02:30:01"), 8.0),  // 1s past row 3's window
      ("B", ts("2024-01-01 00:45:00"), 100.0)
    ).toDF("k", "t", "v")
    val out = TimeSeries.rollingAgg(df, "t", Seq("k"), 3600L,
      Seq("s" -> sum("v"), "n" -> count(lit(1))))
      .orderBy("k", "t").collect()
    val a = out.filter(_.getString(0) == "A").map(r => (r.getDouble(3), r.getLong(4))).toSeq
    // closed interval: the 01:00 row still sees the 00:00 row (exact 3600s)
    assert(a == Seq((1.0, 1L), (3.0, 2L), (7.0, 3L), (8.0, 1L)), s"got $a")
    val b = out.filter(_.getString(0) == "B").head
    assert(b.getDouble(3) == 100.0 && b.getLong(4) == 1L, "keys never mix")
  }

  test("cube keeps NULL group rows: gid distinguishes data NULL from rollup NULL") {
    val m = graft.core.DDFManager(spark)
    val ddf = m.register(Seq((Some("x"), 1.0), (Option.empty[String], 2.0))
      .toDF("a", "v"), "cube_null_t")
    val out = Aggregations.cube(ddf, Seq("a"), Seq("n=count(*)", "s=sum(v)"))
      .df.orderBy(col("gid"), col("a").asc_nulls_first).collect()
    // leaves: (null data row!) + x; plus grand total over BOTH rows
    assert(out.length == 3, s"got ${out.length}")
    val dataNull = out.find(r => r.getAs[Int]("gid") == 0 && r.isNullAt(0)).get
    assert(dataNull.getAs[Double]("s") == 2.0, "data-NULL leaf must survive")
    val grand = out.find(_.getAs[Int]("gid") == 1).get
    assert(grand.getAs[Long]("n") == 2L && grand.getAs[Double]("s") == 3.0,
      "grand total must count NULL-group rows")
  }

  test("resample: NULL timestamps are excluded by contract; reserved alias refused") {
    val df = Seq(
      ("A", Some(ts("2024-01-01 00:10:00")), 1.0),
      ("A", Option.empty[java.sql.Timestamp], 9.0)
    ).toDF("k", "t", "v")
    val out = TimeSeries.resample(df, "t", Seq("k"), 3600L, Seq("s" -> sum("v")))
      .collect()
    assert(out.length == 1 && out.head.getLong(2) == 1L &&
      out.head.getDouble(3) == 1.0, "null-ts row must be excluded, not mangled")
    intercept[IllegalArgumentException](
      TimeSeries.resample(df, "t", Seq("k"), 3600L, Seq("n" -> count(lit(1)))))
  }

  test("intervalMerge: overlap/touch/gap/containment; rejects degenerate rows") {
    import spark.implicits._
    val iv = Seq(
      ("u1", 1L, 5L),   // ┐ overlap → [1, 7)
      ("u1", 3L, 7L),   // ┘
      ("u1", 7L, 9L),   // touching → absorbed into [1, 9)
      ("u1", 12L, 15L), // gap → own span
      ("u1", 13L, 14L), // contained → absorbed
      ("u2", 1L, 2L),   // other key: independent
      ("u2", 5L, 5L),   // zero-length → dropped
      ("u2", 9L, 8L)    // negative → dropped
    ).toDF("k", "s", "e")
    val out = TimeSeries.intervalMerge(iv, Seq("k"), "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set(
      ("u1", 1L, 9L, 3L), ("u1", 12L, 15L, 2L), ("u2", 1L, 2L, 1L)), s"got $out")

    // NULL endpoints dropped
    val withNull = iv.unionAll(Seq(("u3", 1L, 2L)).toDF("k", "s", "e")
      .withColumn("e", lit(null).cast("long")))
    assert(TimeSeries.intervalMerge(withNull, Seq("k"), "s", "e")
      .filter($"k" === "u3").count() == 0)

    // deterministic across partition layouts (exact-tie rows are
    // interchangeable, so span assignment is permutation-invariant)
    val dup = iv.unionAll(Seq(("u1", 3L, 7L)).toDF("k", "s", "e"))
    val a = TimeSeries.intervalMerge(dup.repartition(1), Seq("k"), "s", "e")
      .collect().map(_.toSeq).toSet
    val b = TimeSeries.intervalMerge(dup.repartition(5), Seq("k"), "s", "e")
      .collect().map(_.toSeq).toSet
    assert(a == b)

    intercept[IllegalArgumentException](
      TimeSeries.intervalMerge(iv, Seq(), "s", "e"))
  }

  test("pivot widens with explicit values, normalized names, null cells") {
    val m = DDFManager(spark)
    val ddf = m.register(Seq(
      ("g1", "A", 10.0), ("g1", "A", 20.0), ("g1", "B", 5.0),
      ("g2", "B", 7.0), ("g2", "C", 1.0), // C not in pivotValues -> dropped
      ("g2", null, 99.0)                  // null pivot value -> no column
    ).toDF("g", "p", "v"))
    val out = Aggregations.pivot(ddf, Seq("g"), "p", Seq("A", "B"),
      Seq("s=sum(v)", "n=count(*)")).df.orderBy("g").collect()
    assert(ddf.df.columns.toSeq == Seq("g", "p", "v")) // input untouched
    val cols = Aggregations.pivot(ddf, Seq("g"), "p", Seq("A", "B"),
      Seq("s=sum(v)", "n=count(*)")).df.columns.toSeq
    assert(cols == Seq("g", "A_s", "A_n", "B_s", "B_n"))
    assert(out(0).getDouble(1) == 30.0 && out(0).getLong(2) == 2L)
    assert(out(0).getDouble(3) == 5.0 && out(0).getLong(4) == 1L)
    // g2 has no A rows: the value aggregate reads NULL, count reads 0
    // (SQL conditional-aggregation convention — see pivot scaladoc)
    assert(out(1).isNullAt(1) && out(1).getLong(2) == 0L)
    assert(out(1).getDouble(3) == 7.0)

    // single aggregate still gets the <value>_<alias> scheme
    val one = Aggregations.pivot(ddf, Seq("g"), "p", Seq("A"), Seq("s=sum(v)"))
    assert(one.df.columns.toSeq == Seq("g", "A_s"))

    intercept[IllegalArgumentException]( // values are mandatory
      Aggregations.pivot(ddf, Seq("g"), "p", Seq(), Seq("s=sum(v)")))
    intercept[IllegalArgumentException]( // duplicates refused
      Aggregations.pivot(ddf, Seq("g"), "p", Seq("A", "A"), Seq("s=sum(v)")))
    intercept[IllegalArgumentException]( // grouping col in agg position
      Aggregations.pivot(ddf, Seq("g"), "p", Seq("A"), Seq("v")))
  }

  test("funnel: greedy ordered match with (ts,id) tie-break") {
    def t(sec: Int) = ts(f"2024-01-01 00:00:$sec%02d")
    val ev = Seq(
      // u1: clean view->click->purchase
      (1L, t(1), "u1", "view"), (2L, t(2), "u1", "click"),
      (3L, t(3), "u1", "purchase"),
      // u2: click BEFORE view never counts; purchase can't skip click
      (4L, t(1), "u2", "click"), (5L, t(2), "u2", "view"),
      (6L, t(3), "u2", "purchase"),
      // u3: same-ts tie, click id AFTER view id -> counts
      (7L, t(1), "u3", "view"), (8L, t(1), "u3", "click"),
      // u4: same-ts tie, click id BEFORE view id -> does not count
      (10L, t(1), "u4", "click"), (11L, t(1), "u4", "view"),
      // u5: non-step noise only
      (12L, t(1), "u5", "error")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = TimeSeries.funnel(ev, "user_id", "ts", "event_id",
      "event_type", Seq("view", "click", "purchase"))
      .orderBy("step_idx").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1, "view", 4L), (2, "click", 2L), (3, "purchase", 1L)))

    intercept[IllegalArgumentException](
      TimeSeries.funnel(ev, "user_id", "ts", "event_id", "event_type", Seq()))
    intercept[IllegalArgumentException](
      TimeSeries.funnel(ev, "user_id", "ts", "event_id", "event_type",
        Seq("view", "view")))

    // no matching events at all: zero reach per step, never NULL
    val none = TimeSeries.funnel(ev.filter(col("event_type") === "error"),
      "user_id", "ts", "event_id", "event_type", Seq("view", "click"))
      .orderBy("step_idx").collect()
    assert(none.map(r => (r.getInt(0), r.getLong(2))).toSeq ==
      Seq((1, 0L), (2, 0L)))
  }

  test("entityTemporalSplit: whole entities per side, embargo band, null first-ts") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // user 1 first appears well before the cutoff → ALL rows train,
      // including the one after the cutoff (entity-level, not row-level)
      (1L, t("2024-01-01 01:00:00")), (1L, t("2024-01-01 13:00:00")),
      // user 2 first appears inside the 2 h embargo band [10:00, 12:00)
      (2L, t("2024-01-01 11:00:00")), (2L, t("2024-01-01 14:00:00")),
      // user 3 first appears after the cutoff → test
      (3L, t("2024-01-01 12:00:00")),
      // user 4: all-null timestamps → embargo (excluded, not trained on)
      (4L, null.asInstanceOf[Timestamp])
    ).toDF("user_id", "ts")
      // a NULL-entity row must come back labeled 'embargo', not vanish
      // through an inner equi-join (r14 review)
      .union(Seq((null.asInstanceOf[java.lang.Long],
        t("2024-01-01 01:00:00"))).toDF("user_id", "ts"))
    val out = TimeSeries.entityTemporalSplit(ev, "user_id", "ts",
        t("2024-01-01 12:00:00"), embargoMs = 2L * 3600 * 1000)
      .collect().map(r =>
        ((if (r.isNullAt(0)) -1L else r.getLong(0)), r.getString(2)))
    assert(out.count(_ == (1L, "train")) == 2, "user 1 wholly in train")
    assert(out.count(_ == (2L, "embargo")) == 2)
    assert(out.contains((3L, "test")) && out.contains((4L, "embargo")))
    assert(out.contains((-1L, "embargo")), "NULL entity labeled, not dropped")
    assert(out.length == 7, "every input row labeled exactly once")
    // zero embargo: boundary row (first ts == cutoff) is test, just-before is train
    val z = TimeSeries.entityTemporalSplit(ev, "user_id", "ts",
        t("2024-01-01 12:00:00"))
      .collect().map(r =>
        ((if (r.isNullAt(0)) -1L else r.getLong(0)), r.getString(2))).toSet
    assert(z.contains((2L, "train")) && z.contains((3L, "test")))
    intercept[IllegalArgumentException](
      TimeSeries.entityTemporalSplit(ev, "user_id", "ts",
        t("2024-01-01 12:00:00"), embargoMs = -1))
  }
}
