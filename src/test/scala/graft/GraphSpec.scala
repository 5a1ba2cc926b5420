package graft

import graft.core.DDFManager
import graft.operators.{Aggregations, Graph}
import org.apache.spark.sql.functions._

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  test("pageRank: symmetric pair is a fixed point; star ranks hand-computed") {
    // a <-> b: each node forwards its whole rank, so 150000 + 85% of
    // 1000000 = 1000000 every round — the exact fixed point
    val pair = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val pr = Graph.pageRank(pair, "src", "dst", iterations = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pr == Map("a" -> 1000000L, "b" -> 1000000L), s"got $pr")

    // star a <-> {b, c}: hand-rolled two rounds of integer arithmetic
    //   round 1: a = 150000 + 85%*(1e6 + 1e6) = 1850000
    //            b = c = 150000 + 85%*(1e6 div 2) = 575000
    //   round 2: a = 150000 + 85%*(575000*2)     = 1127500
    //            b = c = 150000 + 85%*(1850000 div 2) = 936250
    val star = Seq(("a", "b"), ("a", "c"), ("b", "a"), ("c", "a"))
      .toDF("src", "dst")
    val pr2 = Graph.pageRank(star, "src", "dst", iterations = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pr2 == Map("a" -> 1127500L, "b" -> 936250L, "c" -> 936250L), s"got $pr2")
  }

  test("pageRank: dangling sink keeps collecting, emits nothing") {
    val pr = Graph.pageRank(Seq(("a", "sink")).toDF("src", "dst"), "src", "dst", 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a has no in-edges -> base only; sink collects a's whole rank
    assert(pr == Map("a" -> 150000L, "sink" -> 1000000L), s"got $pr")
  }

  test("mergeAggregates == direct aggregate over the union; non-mergeable fns refused") {
    val m = DDFManager(spark)
    val df = Seq(("x", 1.0), ("x", 5.0), ("y", 2.0), ("x", 3.0), ("y", 8.0))
      .toDF("g", "v")
    val spec = "g, n=count(*), mx=max(v), mn=min(v), s=sum(v)"
    val a = m.register(df.filter(col("v") < 4))
    val b = m.register(df.filter(col("v") >= 4))
    val merged = Aggregations.mergeAggregates(
      Aggregations.aggregate(a, spec).df, Aggregations.aggregate(b, spec).df, spec)
      .orderBy("g").collect()
    val direct = Aggregations.aggregate(m.register(df), spec).df
      .orderBy("g").collect()
    assert(merged.sameElements(direct))
    intercept[IllegalArgumentException](
      Aggregations.mergeAggregates(df, df, "g, m=avg(v)"))
  }
}
