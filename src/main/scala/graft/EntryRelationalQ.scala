package graft

import graft.core.{DDF, DDFManager}
import graft.operators._
import graft.stats.{Sketches, Stats}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import EntryShared._

/** SparkEntry query rows — projection / filter / head / sample rows (q01-q08). Split from SparkEntry.scala by family
  * (r15 verdict ask #7); composed into the pinned registry by
  * [[SparkEntry.queries]].
  */
private[graft] object EntryRelationalQ {

  // =====================================================================
  // §2.2 Projection / filter / row ops
  // =====================================================================

  val qs: Seq[Q] = Seq(
    Q("q01_project",
      (s, d) => {
        val m = mgr(s, d)
        Views.project(m.getDDFByName("lineitem"),
          Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"))
          .df.orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("q02_filter",
      (s, d) => {
        val m = mgr(s, d)
        Views.subset(m.getDDFByName("lineitem"),
          Seq("l_orderkey", "l_linenumber", "l_quantity", "l_discount"),
          "l_quantity > 30 AND l_discount < 0.05")
          .df.orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount
             |FROM lineitem WHERE l_quantity > 30 AND l_discount < 0.05
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("q03_scalar_fns",
      (s, d) => {
        val m = mgr(s, d)
        m.sql2ddf(
          """select p_partkey,
            |  substring(p_name, 1, 8) as name8,
            |  upper(p_brand) as brand_u,
            |  lower(p_type) as type_l,
            |  abs(p_size - 25) as size_dev,
            |  cast(floor(p_retailprice) as bigint) as price_floor,
            |  round(sqrt(p_retailprice), 6) as price_sqrt,
            |  coalesce(nullif(p_brand, 'Brand#1'), 'OTHER') as brand_o
            |from part order by p_partkey""".stripMargin).df
      },
      Some("""SELECT p_partkey,
             |  substring(p_name, 1, 8) AS name8,
             |  upper(p_brand) AS brand_u,
             |  lower(p_type) AS type_l,
             |  abs(p_size - 25) AS size_dev,
             |  cast(floor(p_retailprice) AS bigint) AS price_floor,
             |  round(sqrt(p_retailprice), 6) AS price_sqrt,
             |  coalesce(nullif(p_brand, 'Brand#1'), 'OTHER') AS brand_o
             |FROM part ORDER BY p_partkey""".stripMargin)),

    Q("q04_top",
      (s, d) => {
        val m = mgr(s, d)
        Views.top(m.getDDFByName("orders"), 50, "o_totalprice", ascending = false)
          .df.select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin)),

    Q("q05_remove_columns",
      (s, d) => {
        val m = mgr(s, d)
        Views.removeColumns(m.getDDFByName("nation"), Seq("n_regionkey"))
          .df.orderBy("n_nationkey")
      },
      Some("SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey")),

    Q("q06_sample",
      (s, d) => {
        val m = mgr(s, d)
        // Seeded Bernoulli sample — not oracle-able (engine-specific RNG);
        // the driver's rows-only check pins non-emptiness/shape.
        Views.sample(m.getDDFByName("lineitem"), 0.1, withReplacement = false, seed = 42)
          .df.select("l_orderkey", "l_linenumber").orderBy("l_orderkey", "l_linenumber")
      },
      None),

    Q("q07_hash_sample",
      (s, d) => {
        val m = mgr(s, d)
        // Reproducible sampling: a pure function of the key, so the
        // oracle can select the exact same rows — contrast q06's RNG
        Views.hashSample(m.getDDFByName("orders"), "o_orderkey", perMille = 50)
          .df.select("o_orderkey", "o_totalprice").orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE xor((o_orderkey % 1000000000) * 2654435761,
             |          ((o_orderkey % 1000000000) * 2654435761) >> 31) % 1000 < 50
             |ORDER BY o_orderkey""".stripMargin)),

    Q("q08_stratified_sample",
      (s, d) => {
        val m = mgr(s, d)
        // deterministic n-per-stratum: same xor-fold hash as q07 as the
        // in-stratum ranking key, so the oracle ranks identically
        Views.stratifiedSample(m.getDDFByName("orders"), "o_orderstatus",
            n = 20, keyCol = "o_orderkey")
          .df.select("o_orderkey", "o_orderstatus").orderBy("o_orderstatus", "o_orderkey")
      },
      Some("""WITH h AS (SELECT o_orderkey, o_orderstatus,
             |    (o_orderkey % 1000000000) * 2654435761 AS p FROM orders),
             |r AS (SELECT o_orderkey, o_orderstatus,
             |    row_number() OVER (PARTITION BY o_orderstatus
             |      ORDER BY xor(p, p >> 31) % 1000000007, o_orderkey) AS rn FROM h)
             |SELECT o_orderkey, o_orderstatus FROM r WHERE rn <= 20
             |ORDER BY o_orderstatus, o_orderkey""".stripMargin))
  )
}
