package graft

import graft.operators.History
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class HistorySpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("scd2 collapses unchanged runs into validity intervals; current row open-ended") {
    val snaps = Seq(
      (1L, ts("2024-01-01 00:00:00"), "bronze"),
      (1L, ts("2024-01-02 00:00:00"), "bronze"), // no change — collapses
      (1L, ts("2024-01-03 00:00:00"), "gold"),
      (1L, ts("2024-01-04 00:00:00"), "bronze"), // back — NEW segment, not merged
      (2L, ts("2024-01-01 12:00:00"), "silver")
    ).toDF("uid", "t", "tier")
    val h = History.scd2(snaps, Seq("uid"), "t", Seq("tier"))
      .orderBy("uid", "valid_from").collect()
    assert(h.length == 4)
    val u1 = h.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getString(1)).toSeq == Seq("bronze", "gold", "bronze"))
    assert(u1(0).getTimestamp(2) == ts("2024-01-01 00:00:00"))
    assert(u1(0).getTimestamp(3) == ts("2024-01-03 00:00:00"),
      "valid_to = next segment's valid_from")
    assert(u1(2).isNullAt(3), "current segment is open-ended")
    assert(h.filter(_.getLong(0) == 2L).head.isNullAt(3))
  }

  test("scd2 chains deterministically when identical timestamps straddle a change") {
    val snaps = Seq(
      (1L, ts("2024-01-01 00:00:00"), "a", 1L),
      (1L, ts("2024-01-01 00:00:00"), "b", 2L), // same ts, tie splits segments
      (1L, ts("2024-01-02 00:00:00"), "b", 3L)
    ).toDF("uid", "t", "tier", "seq")
    val h = History.scd2(snaps, Seq("uid"), "t", Seq("tier"), Seq("seq"))
      .orderBy("valid_from", "tier").collect()
    assert(h.length == 2)
    val bySeg = h.sortBy(r => r.getString(1))
    // segment 'a' closes at segment 'b's valid_from (the SAME instant)
    assert(bySeg(0).getString(1) == "a" &&
      bySeg(0).getTimestamp(3) == ts("2024-01-01 00:00:00"))
    assert(bySeg(1).getString(1) == "b" && bySeg(1).isNullAt(3))
  }

  test("scd2 treats NULL attr runs as unchanged (IS DISTINCT FROM)") {
    val snaps = Seq(
      (1L, ts("2024-01-01 00:00:00"), Option.empty[String]),
      (1L, ts("2024-01-02 00:00:00"), Option.empty[String]),
      (1L, ts("2024-01-03 00:00:00"), Some("x"))
    ).toDF("uid", "t", "tier")
    assert(History.scd2(snaps, Seq("uid"), "t", Seq("tier")).count() == 2)
  }

  test("cdcApply: latest op wins, deletes drop, inserts appear, base survives untouched keys") {
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val changes = Seq(
      (1L, 11.0, ts("2024-01-01 00:00:00"), "U", 1L),
      (1L, 12.0, ts("2024-01-02 00:00:00"), "U", 2L), // later wins
      (2L, 0.0, ts("2024-01-01 00:00:00"), "D", 3L),  // delete
      (9L, 99.0, ts("2024-01-01 00:00:00"), "I", 4L)  // insert
    ).toDF("k", "v", "t", "op", "seq")
    val out = History.cdcApply(base, changes, Seq("k"), Seq("v"), "t", "op", Seq("seq"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out == Seq((1L, 12.0), (3L, 30.0), (9L, 99.0)), s"got $out")
    // idempotent: re-applying the same feed to the result changes nothing
    val again = History.cdcApply(
      Seq((1L, 12.0), (3L, 30.0), (9L, 99.0)).toDF("k", "v"),
      changes, Seq("k"), Seq("v"), "t", "op", Seq("seq"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(again == out)
  }

  test("cdcApply ties on ts break by tie columns, latest sequence wins") {
    val base = spark.emptyDataFrame.select(lit(0L).as("k"), lit(0.0).as("v")).limit(0)
    val t0 = ts("2024-01-01 00:00:00")
    val changes = Seq((1L, 1.0, t0, "U", 1L), (1L, 2.0, t0, "U", 2L))
      .toDF("k", "v", "t", "op", "seq")
    val out = History.cdcApply(base, changes, Seq("k"), Seq("v"), "t", "op", Seq("seq"))
      .collect()
    assert(out.length == 1 && out.head.getDouble(1) == 2.0)
  }

  test("cdcApply: a NULL-ts change still beats the base row") {
    val base = Seq((1L, 10.0)).toDF("k", "v")
    val changes = Seq((1L, 99.0, Option.empty[java.sql.Timestamp], "U"))
      .toDF("k", "v", "t", "op")
    val out = History.cdcApply(base, changes, Seq("k"), Seq("v"), "t", "op")
      .collect()
    assert(out.length == 1 && out.head.getDouble(1) == 99.0,
      "change must win the all-NULL ordering tie via the source rank")
  }

  test("asOfLookup attaches the attribute valid AT the fact time, never the future") {
    val hist = History.scd2(Seq(
      (1L, ts("2024-01-01 00:00:00"), "bronze"),
      (1L, ts("2024-01-03 00:00:00"), "gold")
    ).toDF("uid", "t", "tier"), Seq("uid"), "t", Seq("tier"))
    val facts = Seq(
      (1L, ts("2023-12-31 00:00:00"), 1.0), // before history -> NULL
      (1L, ts("2024-01-02 00:00:00"), 2.0), // bronze era
      (1L, ts("2024-01-03 00:00:00"), 3.0), // boundary -> gold (closed start)
      (1L, ts("2024-06-01 00:00:00"), 4.0), // open current interval
      (9L, ts("2024-01-02 00:00:00"), 5.0)  // unknown key -> NULL
    ).toDF("uid", "t", "v")
    val out = History.asOfLookup(facts, hist, Seq("uid"), "t")
      .orderBy("uid", "t").collect()
    assert(out.length == 5, "left join: every fact survives exactly once")
    val tiers = out.map(r => Option(r.getString(3)))
    assert(tiers.toSeq == Seq(None, Some("bronze"), Some("gold"), Some("gold"), None),
      s"got ${tiers.toSeq}")
    // colliding attribute names get the _asof suffix, not an ambiguous twin
    val selfFacts = Seq((1L, ts("2024-01-02 00:00:00"), "whatever"))
      .toDF("uid", "t", "tier")
    val looked = History.asOfLookup(selfFacts, hist, Seq("uid"), "t")
    assert(looked.columns.count(_ == "tier") == 1 &&
      looked.columns.contains("tier_asof"))
    assert(looked.select("tier_asof").first().getString(0) == "bronze")
  }

  test("snapshotDiff: added/removed/changed, NULL-safety, cdcApply inverse, dup guard") {
    import spark.implicits._
    val old = Seq(
      (1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, null.asInstanceOf[String], 40),
      (5L, "e", 50)
    ).toDF("id", "txt", "v")
    val nw = Seq(
      (1L, "a", 10),                          // unchanged -> dropped
      (2L, "B", 20),                          // changed (txt)
      (4L, null.asInstanceOf[String], 40),    // NULL == NULL -> unchanged
      (5L, "e", 55),                          // changed (v)
      (6L, "f", 60)                           // added
    ).toDF("id", "txt", "v")                  // 3 removed
    val d = History.snapshotDiff(old, nw, Seq("id"), Seq("txt", "v"))
      .orderBy("id").collect()
    val byId = d.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId == Map(2L -> "changed", 3L -> "removed", 5L -> "changed", 6L -> "added"))
    // both sides of compared columns ride along
    val r2 = d.find(_.getLong(0) == 2L).get
    assert(r2.getString(2) == "b" && r2.getString(3) == "B")
    val r3 = d.find(_.getLong(0) == 3L).get
    assert(r3.getString(2) == "c" && r3.isNullAt(3) && r3.isNullAt(5))
    // inverse law: cdcApply(old, diff-as-changes) reproduces new exactly
    val changes = History.snapshotDiff(old, nw, Seq("id"), Seq("txt", "v"))
      .select(col("id"), col("txt"), col("v"), lit(1L).as("ts"),
        when(col("change") === "removed", "D").otherwise("U").as("op"))
    val rebuilt = History.cdcApply(old, changes, Seq("id"), Seq("txt", "v"), "ts", "op")
    assert(rebuilt.exceptAll(nw).isEmpty && nw.exceptAll(rebuilt).isEmpty)
    // duplicate key on a side fails the job
    val err = intercept[Exception] {
      History.snapshotDiff(old.union(old.limit(1)), nw, Seq("id"), Seq("txt", "v")).collect()
    }
    assert(err.getMessage != null)
    // overlapping key/compare columns are a contract violation, rejected
    // up front (r14 review) instead of an ambiguous-attribute error
    val overlap = intercept[IllegalArgumentException] {
      History.snapshotDiff(old, nw, Seq("id"), Seq("id", "v"))
    }
    assert(overlap.getMessage.contains("disjoint"))
  }
}
