package graft

import graft.core.{DDF, DDFManager}
import graft.operators._
import graft.stats.{Sketches, Stats}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import EntryShared._

/** SparkEntry query rows — SQL-frontend rows: TPC-H shapes and dialect features. Split from SparkEntry.scala by family
  * (r15 verdict ask #7); composed into the pinned registry by
  * [[SparkEntry.queries]].
  */
private[graft] object EntrySqlFrontendQ {

  // =====================================================================
  // §2.9 SQL front-end (dialect, @this) + flagship aggregation
  // =====================================================================

  val qs: Seq[Q] = Seq(
    Q("q10_tpch_q1",
      (s, d) => {
        val m = mgr(s, d)
        m.sql2ddf(
          s"""select l_returnflag, l_linestatus,
             |  count(*) as n,
             |  ${dsumSql("l_quantity")} as sum_qty,
             |  ${dsumSql("l_extendedprice")} as sum_base,
             |  ${dsum2Sql("l_extendedprice", "1 - l_discount")} as sum_disc,
             |  round(${dsumSql("l_quantity")} / count(*), 4) as avg_qty
             |from lineitem
             |where l_shipdate <= timestamp '1998-09-02 00:00:00'
             |group by l_returnflag, l_linestatus
             |order by l_returnflag, l_linestatus""".stripMargin).df
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  count(*) AS n,
              |  ${dsumSql("l_quantity")} AS sum_qty,
              |  ${dsumSql("l_extendedprice")} AS sum_base,
              |  ${dsum2Sql("l_extendedprice", "1 - l_discount")} AS sum_disc,
              |  round(${dsumSql("l_quantity")} / count(*), 4) AS avg_qty
              |FROM lineitem
              |WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
              |GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    Q("q12_tpch_q3",
      (s, d) => {
        val m = mgr(s, d)
        // TPC-H Q3 shape (dates shifted into the fixture's 1995–2001
        // range): 3-way join, selective dim filter, decimal-exact revenue,
        // total order incl. l_orderkey so LIMIT is deterministic
        m.sql2ddf(tpchQ3Sql).df
      },
      Some(tpchQ3Sql)),

    Q("q11_sql_this",
      (s, d) => {
        val m = mgr(s, d)
        val li = m.getDDFByName("lineitem")
        m.sql2ddf(
          """select l_returnflag, count(*) as n from @this
            |where l_quantity >= 25 group by l_returnflag
            |order by l_returnflag""".stripMargin, li).df
      },
      Some("""SELECT l_returnflag, count(*) AS n FROM lineitem
             |WHERE l_quantity >= 25 GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    Q("q13_tpch_q5",
      (s, d) => mgr(s, d).sql2ddf(tpchQ5Sql).df,
      Some(tpchQ5Sql)),

    Q("q14_tpch_q6",
      (s, d) => mgr(s, d).sql2ddf(tpchQ6Sql).df,
      Some(tpchQ6Sql)),

    Q("q15_tpch_q10",
      (s, d) => mgr(s, d).sql2ddf(tpchQ10Sql).df,
      Some(tpchQ10Sql)),

    Q("q16_tpch_q4",
      (s, d) => mgr(s, d).sql2ddf(tpchQ4Sql).df,
      Some(tpchQ4Sql)),

    Q("q66_tpch_q14",
      (s, d) => mgr(s, d).sql2ddf(tpchQ14Sql).df,
      Some(tpchQ14Sql)),

    Q("q67_tpch_q17",
      (s, d) => mgr(s, d).sql2ddf(tpchQ17Sql).df,
      Some(tpchQ17Sql)),

    Q("q68_tpch_q18",
      (s, d) => mgr(s, d).sql2ddf(tpchQ18Sql).df,
      Some(tpchQ18Sql)),

    Q("q69_tpch_q19",
      (s, d) => mgr(s, d).sql2ddf(tpchQ19Sql).df,
      Some(tpchQ19Sql)),

    Q("q72_tpch_q22",
      (s, d) => mgr(s, d).sql2ddf(tpchQ22Sql).df,
      Some(tpchQ22Sql)),

    Q("q73_tpch_q15",
      (s, d) => mgr(s, d).sql2ddf(tpchQ15Sql).df,
      Some(tpchQ15Sql)),

    Q("q74_tpch_q7",
      (s, d) => mgr(s, d).sql2ddf(tpchQ7Sql).df,
      Some(tpchQ7Sql)),

    Q("q75_tpch_q8",
      (s, d) => mgr(s, d).sql2ddf(tpchQ8Sql).df,
      Some(tpchQ8Sql)),

    Q("q76_tpch_q12",
      (s, d) => mgr(s, d).sql2ddf(tpchQ12Sql).df,
      Some(tpchQ12Sql)),

    Q("q77_tpch_q13",
      (s, d) => mgr(s, d).sql2ddf(tpchQ13Sql).df,
      Some(tpchQ13Sql)),

    Q("q78_tpch_q21",
      (s, d) => mgr(s, d).sql2ddf(tpchQ21Sql).df,
      Some(tpchQ21Sql)),

    Q("q79_tpch_q2",
      (s, d) => mgr(s, d).sql2ddf(tpchQ2Sql).df,
      Some(tpchQ2Sql)),

    Q("q80_tpch_q9",
      (s, d) => mgr(s, d).sql2ddf(tpchQ9Sql).df,
      Some(tpchQ9Sql)),

    Q("q81_tpch_q11",
      (s, d) => mgr(s, d).sql2ddf(tpchQ11Sql).df,
      Some(tpchQ11Sql)),

    Q("q82_tpch_q16",
      (s, d) => mgr(s, d).sql2ddf(tpchQ16Sql).df,
      Some(tpchQ16Sql)),

    Q("q83_tpch_q20",
      (s, d) => mgr(s, d).sql2ddf(tpchQ20Sql).df,
      Some(tpchQ20Sql))
  )
}
