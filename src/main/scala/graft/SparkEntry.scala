package graft

import graft.core.{DDF, DDFManager}
import graft.operators._
import graft.stats.{Sketches, Stats}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY §2 (plus the training-data-pipeline
  * extensions) is exposed as a named query over the driver's parquet
  * tables, with a DuckDB-equivalent oracle SQL where the semantics are
  * SQL-expressible.
  *
  * Oracle-determinism rules used throughout (both sides identically):
  *  - money/quantity columns are exact 2-decimal doubles → sums go through
  *    `decimal(18,2)` (exact in Spark AND DuckDB) then cast back to double;
  *  - derived means/variances are computed FROM those exact sums with
  *    identical double arithmetic instead of engine-internal aggregates;
  *  - engine-internal approximate/iterative aggregates (percentile,
  *    stddev) are rounded;
  *  - every query ends in a total ORDER BY; nullable sort keys say
  *    NULLS FIRST explicitly in the oracle (Spark's asc default);
  *  - engine-specific hashing is replaced by PORTABLE hashes where a
  *    query should be oracle-checked: mod-prime char folds
  *    (Dedup.portableFold — DuckDB list_reduce mirrors it), affine
  *    permutations for minhash, plan-time literals (LSH hyperplanes, IVF
  *    centroids) inlined into BOTH sides. The xxhash64 scale paths keep
  *    rows-only twins (d02, q06, ml01);
  *  - any float threshold crossing engines (quality gates, LSH signs,
  *    IVF argmax) gets its data-to-threshold margin measured first —
  *    documented at each use; margins here are ≥1e-4 vs fp noise ~1e-15.
  */
object SparkEntry {

  private val tableNames = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "documents", "embeddings")

  private val mgrCache = scala.collection.concurrent.TrieMap.empty[String, DDFManager]
  // Temp views are SESSION-global while managers are per-(session, dir):
  // a manager built for another dir repoints the shared view names, so
  // every sql2ddf query would silently read the other dir's parquet.
  // Track the session's active dir and re-register (cheap — lazy plans,
  // no data read) whenever it changes.
  private val activeDir = scala.collection.concurrent.TrieMap.empty[Int, String]

  private def registerTables(spark: SparkSession, m: DDFManager, dir: String): Unit = {
    tableNames.foreach(t => m.loadParquet(s"$dir/$t.parquet", t))
    m.register(loadEvents(spark, dir), "events")
  }

  /** events.parquet with `ts` normalized to session-TZ TimestampType.
    * The driver's generator has shipped the column as TIMESTAMP(NANOS)
    * (Spark 4 reads it as long under `nanosAsLong`) and as TIMESTAMP_NTZ
    * micros across rounds — adapt on the OBSERVED type so a generator
    * schema change never breaks analysis again (round 7's bench died on
    * `ts div 1000` over NTZ). Session TZ is UTC everywhere, so the
    * NTZ→TZ cast preserves wall-clock values bit-exactly vs DuckDB's
    * naive TIMESTAMP reading of the same file.
    */
  private[graft] def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType       => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType  => raw
      case other => throw new IllegalStateException(
        s"events.ts: unexpected parquet type $other")
    }
  }

  private def mgr(spark: SparkSession, dir: String): DDFManager = {
    val m = mgrCache.getOrElseUpdate(s"${spark.hashCode}|$dir", {
      // events.parquet carries TIMESTAMP(NANOS) which Spark 4 rejects by
      // default; read nanos as long and rebuild a (µs) TimestampType col.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      DDFManager(spark)
    })
    // covers first use AND dir switches in one place
    if (!activeDir.get(spark.hashCode).contains(dir)) {
      registerTables(spark, m, dir)
      activeDir(spark.hashCode) = dir
    }
    m
  }

  /** Materialize a SMALL result (gate rows are ≤ a few hundred rows)
    * into a local-relation frame and delete the query's temp workspace —
    * the lazily-returned frame must not dangle over deleted parquet, and
    * repeated Verify runs must not accrete stream/publish scratch dirs.
    */
  private def collectAndClean(s: SparkSession, df: DataFrame, tmp: String): DataFrame = {
    val rows = df.collect().toIndexedSeq
    tools.Cleanup.deleteRecursively(tmp)
    s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      df.schema)
  }

  /** Scratch workspace for queries that round-trip through disk (the
    * publish/stream gates). The success path ends in [[collectAndClean]],
    * which deletes the dir after materializing; this wrapper deletes it
    * when the body THROWS instead, so repeated failing Verify runs do
    * not accrete /tmp workspaces.
    */
  private def withScratch(prefix: String)(body: String => DataFrame): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory(prefix).toString
    try body(tmp)
    catch { case e: Throwable => tools.Cleanup.deleteRecursively(tmp); throw e }
  }

  /** Exact 2-decimal sum, identical in Spark and DuckDB. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")
  private def dsumSql(c: String): String = s"cast(sum(cast($c as decimal(18,2))) as double)"
  /** Exact 4-decimal sum of a product of two 2-decimal columns. */
  private def dsum2(a: Column, b: Column): Column =
    sum((a.cast("decimal(18,2)") * b.cast("decimal(18,2)")).cast("decimal(38,4)")).cast("double")
  private def dsum2Sql(a: String, b: String): String =
    s"cast(sum(cast(cast($a as decimal(18,2)) * cast($b as decimal(18,2)) as decimal(38,4))) as double)"

  /** Higher moments derived from EXACT integer power sums — engine
    * skewness/kurtosis aggregates disagree on correction factors, so
    * both sides run this ONE string: quantity → exact centi-units
    * (k ≤ 5000, k⁴ ≤ 6.25e14 — no bigint overflow), decimal(38,0) sums,
    * then identical double arithmetic. Population moments; skew/kurt are
    * scale-invariant so centi-units need no rescale.
    */
  private val momentsSql: String =
    """WITH kk AS (SELECT CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS k
      |           FROM lineitem),
      |s AS (SELECT count(*) AS n,
      |  CAST(sum(CAST(k AS DECIMAL(38,0))) AS DOUBLE) / count(*) AS m1,
      |  CAST(sum(CAST(k*k AS DECIMAL(38,0))) AS DOUBLE) / count(*) AS m2,
      |  CAST(sum(CAST(k*k*k AS DECIMAL(38,0))) AS DOUBLE) / count(*) AS m3,
      |  CAST(sum(CAST(k*k*k*k AS DECIMAL(38,0))) AS DOUBLE) / count(*) AS m4
      |  FROM kk)
      |SELECT n, round(m1 / 100, 6) AS mean,
      |  round((m2 - m1*m1) / 10000, 6) AS variance,
      |  round((m3 - 3*m1*m2 + 2*m1*m1*m1)
      |        / sqrt((m2 - m1*m1)*(m2 - m1*m1)*(m2 - m1*m1)), 6) AS skewness,
      |  round((m4 - 4*m1*m3 + 6*m1*m1*m2 - 3*m1*m1*m1*m1)
      |        / ((m2 - m1*m1)*(m2 - m1*m1)) - 3, 6) AS excess_kurtosis
      |FROM s""".stripMargin

  /** TPC-H Q3 shape — ONE string run by both Spark and DuckDB. */
  private val tpchQ3Sql: String =
    s"""select l_orderkey, ${dsum2Sql("l_extendedprice", "1 - l_discount")} as revenue,
       |  o_orderdate, o_orderpriority
       |from customer
       |join orders on c_custkey = o_custkey
       |join lineitem on l_orderkey = o_orderkey
       |where c_mktsegment = 'BUILDING'
       |  and o_orderdate < timestamp '1997-06-01 00:00:00'
       |  and l_shipdate > timestamp '1997-06-01 00:00:00'
       |group by l_orderkey, o_orderdate, o_orderpriority
       |order by revenue desc, o_orderdate, l_orderkey
       |limit 10""".stripMargin

  /** TPC-H Q5 shape (local-supplier 6-way join): the one query pattern
    * that exercises a two-condition join (l_suppkey = s_suppkey AND
    * c_nationkey = s_nationkey) plus the full dim chain to region.
    * Revenue through the exact decimal sum; n_name makes the order total.
    */
  private val tpchQ5Sql: String =
    s"""select n_name, ${dsum2Sql("l_extendedprice", "1 - l_discount")} as revenue
       |from customer
       |join orders on c_custkey = o_custkey
       |join lineitem on l_orderkey = o_orderkey
       |join supplier on l_suppkey = s_suppkey and c_nationkey = s_nationkey
       |join nation on s_nationkey = n_nationkey
       |join region on n_regionkey = r_regionkey
       |where r_name = 'ASIA'
       |  and o_orderdate >= timestamp '1996-01-01 00:00:00'
       |  and o_orderdate < timestamp '1997-01-01 00:00:00'
       |group by n_name
       |order by revenue desc, n_name""".stripMargin

  /** TPC-H Q6 shape (pure filter + aggregate — the pushdown showcase:
    * every predicate reaches the parquet scan, zero joins, one scalar).
    */
  private val tpchQ6Sql: String =
    s"""select ${dsum2Sql("l_extendedprice", "l_discount")} as revenue
       |from lineitem
       |where l_shipdate >= timestamp '1996-01-01 00:00:00'
       |  and l_shipdate < timestamp '1997-01-01 00:00:00'
       |  and l_discount between 0.05 and 0.07
       |  and l_quantity < 24""".stripMargin

  /** TPC-H Q10 shape (returned-item report): fact→dim join chain with a
    * selective fact filter, high-cardinality group-by, deterministic
    * top-20.
    */
  private val tpchQ10Sql: String =
    s"""select c_custkey, c_name, ${dsum2Sql("l_extendedprice", "1 - l_discount")} as revenue,
       |  c_acctbal, n_name
       |from customer
       |join orders on c_custkey = o_custkey
       |join lineitem on l_orderkey = o_orderkey
       |join nation on c_nationkey = n_nationkey
       |where l_returnflag = 'R'
       |  and o_orderdate >= timestamp '1996-01-01 00:00:00'
       |  and o_orderdate < timestamp '1996-04-01 00:00:00'
       |group by c_custkey, c_name, c_acctbal, n_name
       |order by revenue desc, c_custkey
       |limit 20""".stripMargin

  /** TPC-H Q4 shape (order-priority check): correlated EXISTS subquery —
    * the reference grammar has NO subqueries at all (SURVEY §4.1), so
    * this documents the dialect's Spark-SQL superset explicitly.
    */
  private val tpchQ4Sql: String =
    s"""select o_orderpriority, count(*) as order_count
       |from orders
       |where o_orderdate >= timestamp '1996-01-01 00:00:00'
       |  and o_orderdate < timestamp '1996-04-01 00:00:00'
       |  and exists (select 1 from lineitem
       |              where l_orderkey = o_orderkey and l_shipdate > o_orderdate)
       |group by o_orderpriority
       |order by o_orderpriority""".stripMargin

  /** TPC-H Q14 shape (promo revenue): conditional aggregation over a
    * fact→part join — a ratio of two exact decimal sums, one double
    * division at the end, so the scalar is bit-identical across engines.
    * (The fixture's p_type domain is single words; 'PROMO' is the TPC-H
    * 'PROMO%' prefix class.)
    */
  private[graft] val tpchQ14Sql: String =
    s"""select round(100.00 * ${dsum2Sql("case when p_type = 'PROMO' then l_extendedprice else 0 end", "1 - l_discount")}
       |  / ${dsum2Sql("l_extendedprice", "1 - l_discount")}, 6) as promo_revenue
       |from lineitem
       |join part on l_partkey = p_partkey
       |where l_shipdate >= timestamp '1996-01-01 00:00:00'
       |  and l_shipdate < timestamp '1996-03-01 00:00:00'""".stripMargin

  /** TPC-H Q17 shape (small-quantity-order revenue): correlated SCALAR
    * subquery — per-part average quantity gate. The subquery's avg is
    * over integral-valued doubles (exact in any order), the outer sum is
    * decimal — deterministic on both engines. Second subquery pattern
    * beyond Q4's EXISTS (reference grammar has neither).
    */
  private[graft] val tpchQ17Sql: String =
    s"""select round(${dsumSql("l_extendedprice")} / 7.0, 6) as avg_yearly
       |from lineitem
       |join part on p_partkey = l_partkey
       |where p_brand = 'Brand#4'
       |  and l_quantity < (select 0.2 * avg(l2.l_quantity)
       |                    from lineitem l2 where l2.l_partkey = p_partkey)""".stripMargin

  /** TPC-H Q18 shape (large-volume customers): IN over a grouped HAVING
    * subquery feeding a 3-way join and re-aggregation; top-20 by total
    * price with a key tiebreak. sum(l_quantity) is integral-double —
    * order-independent.
    */
  private[graft] val tpchQ18Sql: String =
    s"""select c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       |  sum(l_quantity) as sum_qty
       |from customer
       |join orders on c_custkey = o_custkey
       |join lineitem on o_orderkey = l_orderkey
       |where o_orderkey in (select l_orderkey from lineitem
       |                     group by l_orderkey having sum(l_quantity) > 150)
       |group by c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
       |order by o_totalprice desc, o_orderkey
       |limit 20""".stripMargin

  /** TPC-H Q19 shape (discounted revenue): disjunctive OR-of-ANDs join
    * predicates mixing both sides' columns — the pattern that exercises
    * Catalyst's CNF conversion for partial pushdown below the join.
    */
  private[graft] val tpchQ19Sql: String =
    s"""select ${dsum2Sql("l_extendedprice", "1 - l_discount")} as revenue
       |from lineitem
       |join part on p_partkey = l_partkey
       |where (p_brand = 'Brand#1' and p_size between 1 and 15 and l_quantity between 1 and 11)
       |   or (p_brand = 'Brand#12' and p_size between 10 and 30 and l_quantity between 10 and 20)
       |   or (p_brand = 'Brand#3' and p_size between 20 and 50 and l_quantity between 20 and 30)""".stripMargin

  /** TPC-H Q22 shape (global sales opportunity): uncorrelated scalar AVG
    * subquery gating + NOT EXISTS anti-join + re-aggregation. The
    * threshold is one exact decimal sum ÷ count (a single double
    * division, identical cross-engine); measured margin of the nearest
    * c_acctbal to the threshold: 6.72 at sf0.01 vs ~1e-12 fp noise. The
    * NOT EXISTS is restricted to urgent orders so the anti-join is
    * non-vacuous on the dense synthetic orders table.
    */
  private[graft] val tpchQ22Sql: String =
    s"""select c_nationkey, count(*) as numcust,
       |  ${dsumSql("c_acctbal")} as totacctbal
       |from customer c
       |where c_acctbal > (select ${dsumSql("c_acctbal")} / count(*)
       |                   from customer where c_acctbal > 0.0)
       |  and not exists (select 1 from orders o
       |                  where o.o_custkey = c.c_custkey
       |                    and o.o_orderpriority = '1-URGENT')
       |group by c_nationkey
       |order by c_nationkey""".stripMargin

  /** TPC-H Q15 shape (top supplier): CTE reused twice (the revenue view
    * feeds both the join and the scalar MAX subquery) — revenues are
    * exact decimal sums, so the equality against max() is exact;
    * measured: single max holder at sf0.01, no tie.
    */
  private[graft] val tpchQ15Sql: String =
    s"""with revenue as (
       |  select l_suppkey, ${dsum2Sql("l_extendedprice", "1 - l_discount")} as total_rev
       |  from lineitem
       |  where l_shipdate >= timestamp '1996-01-01 00:00:00'
       |    and l_shipdate < timestamp '1996-04-01 00:00:00'
       |  group by l_suppkey)
       |select s_suppkey, s_name, total_rev
       |from supplier join revenue on s_suppkey = l_suppkey
       |where total_rev = (select max(total_rev) from revenue)
       |order by s_suppkey""".stripMargin

  /** TPC-H Q7 shape (volume shipping): 6-way join with TWO roles of the
    * same dimension (nation as supplier-side n1 and customer-side n2),
    * symmetric OR pair predicate, year extraction, exact decimal revenue.
    */
  private[graft] val tpchQ7Sql: String =
    s"""select supp_nation, cust_nation, l_year,
       |  ${dsum2Sql("l_extendedprice", "1 - l_discount")} as revenue
       |from (
       |  select n1.n_name as supp_nation, n2.n_name as cust_nation,
       |    year(l_shipdate) as l_year, l_extendedprice, l_discount
       |  from lineitem
       |    join orders on o_orderkey = l_orderkey
       |    join customer on c_custkey = o_custkey
       |    join supplier on s_suppkey = l_suppkey
       |    join nation n1 on s_nationkey = n1.n_nationkey
       |    join nation n2 on c_nationkey = n2.n_nationkey
       |  where ((n1.n_name = 'NATION_1' and n2.n_name = 'NATION_2')
       |      or (n1.n_name = 'NATION_2' and n2.n_name = 'NATION_1'))
       |    and l_shipdate between timestamp '1995-01-01 00:00:00'
       |                       and timestamp '1996-12-31 23:59:59'
       |) shipping
       |group by supp_nation, cust_nation, l_year
       |order by supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H Q8 shape (national market share): 8-way join through region,
    * conditional share = one exact decimal sum over another, single
    * double division (deterministic cross-engine).
    */
  private[graft] val tpchQ8Sql: String =
    s"""with all_nations as (
       |  select year(o_orderdate) as o_year,
       |    cast(cast(l_extendedprice as decimal(18,2))
       |         * cast(1 - l_discount as decimal(18,2)) as decimal(38,4)) as volume,
       |    n2.n_name as nation
       |  from lineitem
       |    join part on p_partkey = l_partkey
       |    join orders on o_orderkey = l_orderkey
       |    join customer on c_custkey = o_custkey
       |    join nation n1 on c_nationkey = n1.n_nationkey
       |    join region on n1.n_regionkey = r_regionkey
       |    join supplier on s_suppkey = l_suppkey
       |    join nation n2 on s_nationkey = n2.n_nationkey
       |  where r_name = 'AMERICA' and p_type = 'PROMO'
       |    and o_orderdate between timestamp '1995-01-01 00:00:00'
       |                        and timestamp '1996-12-31 23:59:59')
       |select o_year,
       |  cast(sum(case when nation = 'NATION_1' then volume
       |                else cast(0 as decimal(38,4)) end) as double)
       |    / cast(sum(volume) as double) as mkt_share
       |from all_nations group by o_year order by o_year""".stripMargin

  /** TPC-H Q12 shape (shipping priority classes): join + CASE-bucketed
    * integer counts. Adapted: the testdata carries no l_shipmode /
    * l_receiptdate, so the group key is l_returnflag and the date gate
    * is l_shipdate — the shape (conditional aggregation over a
    * fact-dimension join) is unchanged.
    */
  private[graft] val tpchQ12Sql: String =
    """select l_returnflag,
      |  cast(sum(case when o_orderpriority = '1-URGENT' or o_orderpriority = '2-HIGH'
      |           then 1 else 0 end) as bigint) as high_line_count,
      |  cast(sum(case when o_orderpriority <> '1-URGENT' and o_orderpriority <> '2-HIGH'
      |           then 1 else 0 end) as bigint) as low_line_count
      |from orders join lineitem on o_orderkey = l_orderkey
      |where l_shipdate >= timestamp '1996-01-01 00:00:00'
      |  and l_shipdate < timestamp '1997-01-01 00:00:00'
      |group by l_returnflag order by l_returnflag""".stripMargin

  /** TPC-H Q13 shape (customer order-count distribution): left outer
    * join with an extra ON-clause filter (the reference Q13's comment
    * NOT LIKE, here an orderpriority gate), double aggregation.
    */
  private[graft] val tpchQ13Sql: String =
    """select c_count, count(*) as custdist
      |from (
      |  select c_custkey, count(o_orderkey) as c_count
      |  from customer left outer join orders
      |    on c_custkey = o_custkey and o_orderpriority <> '1-URGENT'
      |  group by c_custkey
      |) c_orders
      |group by c_count
      |order by custdist desc, c_count desc""".stripMargin

  /** TPC-H Q21 shape (suppliers who kept waiting): correlated EXISTS
    * (another supplier contributed to the order) + correlated NOT EXISTS
    * (no OTHER supplier was late on it). Adapted: "late" is
    * l_shipdate > o_orderdate + 60 days (no l_receiptdate/l_commitdate
    * in the testdata); the decorrelation shape — two more anti/semi
    * joins against the same fact — is the point.
    */
  private[graft] val tpchQ21Sql: String =
    """select s_name, count(*) as numwait
      |from supplier, lineitem l1, orders, nation
      |where s_suppkey = l1.l_suppkey
      |  and o_orderkey = l1.l_orderkey
      |  and o_orderstatus = 'F'
      |  and l1.l_shipdate > o_orderdate + interval 60 day
      |  and exists (select 1 from lineitem l2
      |              where l2.l_orderkey = l1.l_orderkey
      |                and l2.l_suppkey <> l1.l_suppkey)
      |  and not exists (select 1 from lineitem l3, orders o3
      |                  where l3.l_orderkey = l1.l_orderkey
      |                    and o3.o_orderkey = l3.l_orderkey
      |                    and l3.l_suppkey <> l1.l_suppkey
      |                    and l3.l_shipdate > o3.o_orderdate + interval 60 day)
      |  and s_nationkey = n_nationkey
      |  and n_name = 'NATION_3'
      |group by s_name
      |order by numwait desc, s_name""".stripMargin

  /** The fixture has no partsupp table, so the five TPC-H shapes that
    * need one (Q2/Q9/Q11/Q16/Q20) derive it from lineitem's distinct
    * (partkey, suppkey) pairs with ARITHMETIC availqty/supplycost —
    * pure integer functions of the keys, so Spark and DuckDB build the
    * identical table and every downstream comparison is exact.
    * ps_supplycost is (integer % 99999)/100.0: a 2-decimal value whose
    * double form round-trips through decimal(18,2) losslessly.
    */
  private val partsuppCte: String =
    """partsupp as (
      |  select l_partkey as ps_partkey, l_suppkey as ps_suppkey,
      |    cast((l_partkey * 31 + l_suppkey * 17) % 1000 + 1 as int) as ps_availqty,
      |    cast((l_partkey * 7 + l_suppkey * 13) % 99999 as double) / 100.0 as ps_supplycost
      |  from lineitem group by l_partkey, l_suppkey
      |)""".stripMargin

  /** TPC-H Q2 shape (minimum cost supplier): correlated scalar MIN
    * subquery that itself carries a 3-way dimension join — the deepest
    * decorrelation in the suite. The cost equality is exact (both sides
    * compute the same arithmetic double).
    */
  private[graft] val tpchQ2Sql: String =
    s"""with $partsuppCte
       |select s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost
       |from part
       |join partsupp on p_partkey = ps_partkey
       |join supplier on s_suppkey = ps_suppkey
       |join nation on s_nationkey = n_nationkey
       |join region on n_regionkey = r_regionkey
       |where p_size = 15 and p_type = 'STANDARD' and r_name = 'EUROPE'
       |  and ps_supplycost = (select min(ps2.ps_supplycost)
       |      from partsupp ps2
       |      join supplier s2 on s2.s_suppkey = ps2.ps_suppkey
       |      join nation n2 on s2.s_nationkey = n2.n_nationkey
       |      join region r2 on n2.n_regionkey = r2.r_regionkey
       |      where ps2.ps_partkey = p_partkey and r2.r_name = 'EUROPE')
       |order by s_acctbal desc, n_name, s_name, p_partkey
       |limit 100""".stripMargin

  /** TPC-H Q9 shape (product type profit): 6-way join with a profit
    * expression SUBTRACTING two decimal products — kept in decimal(38,4)
    * end to end so the sum is order-independent on both engines.
    */
  private[graft] val tpchQ9Sql: String =
    s"""with $partsuppCte
       |select nation, o_year, cast(sum(amount) as double) as sum_profit
       |from (
       |  select n_name as nation, year(o_orderdate) as o_year,
       |    cast(cast(l_extendedprice as decimal(18,2)) * cast(1 - l_discount as decimal(18,2)) as decimal(38,4))
       |    - cast(cast(ps_supplycost as decimal(18,2)) * cast(l_quantity as decimal(18,2)) as decimal(38,4)) as amount
       |  from lineitem
       |  join part on p_partkey = l_partkey
       |  join partsupp on ps_partkey = l_partkey and ps_suppkey = l_suppkey
       |  join orders on o_orderkey = l_orderkey
       |  join supplier on s_suppkey = l_suppkey
       |  join nation on s_nationkey = n_nationkey
       |  where p_name like '%red%'
       |) profit
       |group by nation, o_year
       |order by nation, o_year desc""".stripMargin

  /** TPC-H Q11 shape (important stock): HAVING over a scalar subquery
    * that re-aggregates the SAME CTE — group value vs a fraction of the
    * grand total. Both sides are exact decimal sums cast to double once;
    * measured data-to-threshold margin ≥ 25.0 at every sf (vs ~1e-9 fp
    * noise on the 1e-4 scaling).
    */
  private[graft] val tpchQ11Sql: String =
    s"""with $partsuppCte,
       |natsupp as (
       |  select ps_partkey, ps_supplycost, ps_availqty
       |  from partsupp join supplier on ps_suppkey = s_suppkey
       |  join nation on s_nationkey = n_nationkey
       |  join region on n_regionkey = r_regionkey
       |  where r_name = 'EUROPE')
       |select ps_partkey,
       |  cast(sum(cast(cast(ps_supplycost as decimal(18,2)) * ps_availqty as decimal(38,2))) as double) as value
       |from natsupp
       |group by ps_partkey
       |having cast(sum(cast(cast(ps_supplycost as decimal(18,2)) * ps_availqty as decimal(38,2))) as double)
       |  > (select cast(sum(cast(cast(ps_supplycost as decimal(18,2)) * ps_availqty as decimal(38,2))) as double) * 0.0001
       |     from natsupp)
       |order by value desc, ps_partkey""".stripMargin

  /** TPC-H Q16 shape (parts/supplier relationship): NOT IN anti-join
    * (null-free key, so no null-aware penalty) + COUNT(DISTINCT) over a
    * multi-attribute group. s_acctbal < 0 stands in for the reference's
    * comment-LIKE supplier blacklist (fixture has no s_comment).
    */
  private[graft] val tpchQ16Sql: String =
    s"""with $partsuppCte
       |select p_brand, p_type, p_size, count(distinct ps_suppkey) as supplier_cnt
       |from partsupp join part on p_partkey = ps_partkey
       |where p_brand <> 'Brand#5' and p_type <> 'PROMO'
       |  and p_size in (1, 5, 10, 15, 20, 25, 30, 35)
       |  and ps_suppkey not in (select s_suppkey from supplier where s_acctbal < 0.0)
       |group by p_brand, p_type, p_size
       |order by supplier_cnt desc, p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q20 shape (potential part promotion): IN-chain nesting three
    * levels deep with a correlated scalar SUM on the innermost —
    * availqty (int) vs half the shipped quantity (integral-double
    * halves; exact on both engines).
    */
  private[graft] val tpchQ20Sql: String =
    s"""with $partsuppCte
       |select s_name, s_acctbal
       |from supplier join nation on s_nationkey = n_nationkey
       |join region on n_regionkey = r_regionkey
       |where r_name = 'EUROPE'
       |  and s_suppkey in (
       |    select ps_suppkey from partsupp
       |    where ps_partkey in (select p_partkey from part where p_name like 'red%')
       |      and ps_availqty > (select 0.5 * sum(l_quantity) from lineitem
       |           where l_partkey = ps_partkey and l_suppkey = ps_suppkey
       |             and l_shipdate >= timestamp '1996-01-01 00:00:00'
       |             and l_shipdate < timestamp '1997-01-01 00:00:00'))
       |order by s_name""".stripMargin

  /** The shared perceptual-hash gate corpus (m05 / s07 / p06): six 64-bit
    * dHash patterns with DESIGNED Hamming structure — P1 = P0^1 (distance
    * 1), P2 = P0 with 3 flipped bits (rejected at maxHamming 2),
    * P4 = P3^3 (distance 2), P5 far from everything — and the real 9×8
    * grayscale PNG whose pixel rows walk ±8 from 128 along a pattern's
    * bits, so decode → NN-resample → luma → dHash must reproduce the
    * pattern EXACTLY. Oracles replay from the literals alone.
    */
  private val dhashPats = Array(0x3C5A96E187D24B0FL, 0x3C5A96E187D24B0EL,
    0x3C5A96E1F7D24B0FL, 0x12489ABCDEF01357L, 0x12489ABCDEF01354L,
    0x5A5A5A5A5A5A5A5AL)

  private def patternPng(p: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8) {
      var v = 128
      img.setRGB(0, y, (v << 16) | (v << 8) | v)
      for (x <- 0 until 8) {
        v += (if (((p >>> (y * 8 + x)) & 1L) == 1L) 8 else -8)
        img.setRGB(x + 1, y, (v << 16) | (v << 8) | v)
      }
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def patternImages(ids: Seq[Long]): Seq[(Long, Array[Byte])] =
    ids.map(id => (id, patternPng(dhashPats((id % 6).toInt))))

  private final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  // =====================================================================
  // §2.2 Projection / filter / row ops
  // =====================================================================

  private val relational: Seq[Q] = Seq(
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

  // =====================================================================
  // §2.9 SQL front-end (dialect, @this) + flagship aggregation
  // =====================================================================

  private val sqlFrontend: Seq[Q] = Seq(
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

  // =====================================================================
  // §2.3 Joins + §2.8 set ops
  // =====================================================================

  /** Orders with o_totalprice above this are the "high value" fixture used
    * to create unmatched rows for the outer-join oracles.
    */
  private val HI = 400000.0

  private def highOrders(m: DDFManager): DDF =
    m.register(m.getDDFByName("orders").df
      .filter(col("o_totalprice") > HI)
      .select("o_orderkey", "o_custkey", "o_totalprice"))

  private val joins: Seq[Q] = Seq(
    Q("q20_join_inner",
      (s, d) => {
        val m = mgr(s, d)
        // dimension chain: customer→nation→region, both dims broadcast-able
        val c = m.getDDFByName("customer")
        val n = m.getDDFByName("nation")
        val r = m.getDDFByName("region")
        val cn = Joins.join(c, n, "inner", byLeft = Seq("c_nationkey"),
          byRight = Seq("n_nationkey"), broadcastRight = true)
        val cnr = Joins.join(cn, r, "inner", byLeft = Seq("n_regionkey"),
          byRight = Seq("r_regionkey"), broadcastRight = true)
        cnr.df.select("c_custkey", "c_name", "n_name", "r_name").orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, n_name, r_name
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |ORDER BY c_custkey""".stripMargin)),

    Q("q21_join_multikey",
      (s, d) => {
        val m = mgr(s, d)
        val li = m.getDDFByName("lineitem")
        val agg = m.register(li.df.groupBy("l_orderkey", "l_linenumber")
          .agg(count(lit(1)).as("n_parts")))
        Joins.join(li, agg, "inner",
          byLeft = Seq("l_orderkey", "l_linenumber"),
          byRight = Seq("l_orderkey", "l_linenumber"))
          .df.select(col("l.l_orderkey"), col("l.l_linenumber"), col("r.n_parts"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT a.l_orderkey, a.l_linenumber, b.n_parts
             |FROM lineitem a
             |JOIN (SELECT l_orderkey, l_linenumber, count(*) AS n_parts
             |      FROM lineitem GROUP BY l_orderkey, l_linenumber) b
             |ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber
             |ORDER BY a.l_orderkey, a.l_linenumber""".stripMargin)),

    Q("q22_join_left",
      (s, d) => {
        val m = mgr(s, d)
        Joins.join(m.getDDFByName("customer"), highOrders(m), "left",
          byLeft = Seq("c_custkey"), byRight = Seq("o_custkey"))
          .df.select(col("l.c_custkey"), col("r.o_orderkey"), col("r.o_totalprice"))
          .orderBy(col("c_custkey"), col("o_orderkey"))
      },
      Some(s"""SELECT c_custkey, o_orderkey, o_totalprice
              |FROM customer LEFT JOIN
              |  (SELECT * FROM orders WHERE o_totalprice > $HI) o
              |ON c_custkey = o_custkey
              |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin)),

    Q("q23_join_right",
      (s, d) => {
        val m = mgr(s, d)
        Joins.join(highOrders(m), m.getDDFByName("customer"), "right",
          byLeft = Seq("o_custkey"), byRight = Seq("c_custkey"))
          .df.select(col("r.c_custkey"), col("l.o_orderkey"), col("l.o_totalprice"))
          .orderBy(col("c_custkey"), col("o_orderkey"))
      },
      Some(s"""SELECT c_custkey, o_orderkey, o_totalprice
              |FROM (SELECT * FROM orders WHERE o_totalprice > $HI) o
              |RIGHT JOIN customer ON o_custkey = c_custkey
              |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin)),

    Q("q24_join_full",
      (s, d) => {
        val m = mgr(s, d)
        val evenCust = m.register(m.getDDFByName("customer").df
          .filter(col("c_custkey") % 2 === 0).select("c_custkey", "c_name"))
        Joins.join(evenCust, highOrders(m), "full",
          byLeft = Seq("c_custkey"), byRight = Seq("o_custkey"))
          .df.select(col("l.c_custkey"), col("l.c_name"), col("r.o_orderkey"))
          .orderBy(col("c_custkey"), col("o_orderkey"))
      },
      Some(s"""SELECT c_custkey, c_name, o_orderkey
              |FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0) c
              |FULL JOIN (SELECT * FROM orders WHERE o_totalprice > $HI) o
              |ON c_custkey = o_custkey
              |ORDER BY c_custkey NULLS FIRST, o_orderkey NULLS FIRST""".stripMargin)),

    Q("q25_join_semi",
      (s, d) => {
        val m = mgr(s, d)
        Joins.join(m.getDDFByName("customer"), highOrders(m), "semi",
          byLeft = Seq("c_custkey"), byRight = Seq("o_custkey"))
          .df.select("c_custkey", "c_name").orderBy("c_custkey")
      },
      Some(s"""SELECT c_custkey, c_name FROM customer
              |WHERE EXISTS (SELECT 1 FROM orders
              |  WHERE o_totalprice > $HI AND o_custkey = c_custkey)
              |ORDER BY c_custkey""".stripMargin)),

    Q("q26_join_anti",
      (s, d) => {
        val m = mgr(s, d)
        Joins.join(m.getDDFByName("customer"), highOrders(m), "anti",
          byLeft = Seq("c_custkey"), byRight = Seq("o_custkey"))
          .df.select("c_custkey", "c_name").orderBy("c_custkey")
      },
      Some(s"""SELECT c_custkey, c_name FROM customer
              |WHERE NOT EXISTS (SELECT 1 FROM orders
              |  WHERE o_totalprice > $HI AND o_custkey = c_custkey)
              |ORDER BY c_custkey""".stripMargin)),

    Q("q27_union_all",
      (s, d) => {
        val m = mgr(s, d)
        val lo = m.register(m.getDDFByName("orders").df
          .filter(col("o_totalprice") < 100000).select("o_orderkey", "o_totalprice"))
        val hi = m.register(m.getDDFByName("orders").df
          .filter(col("o_totalprice") > HI).select("o_orderkey", "o_totalprice"))
        Joins.merge(lo, hi).df.orderBy("o_orderkey")
      },
      Some(s"""SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 100000
              |UNION ALL
              |SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > $HI
              |ORDER BY o_orderkey""".stripMargin)),

    Q("q28_distinct",
      (s, d) => {
        val m = mgr(s, d)
        Joins.distinctRows(m.register(
          m.getDDFByName("lineitem").df.select("l_returnflag", "l_linestatus")))
          .df.orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    Q("q18_intersect",
      (s, d) => {
        val m = mgr(s, d)
        // customers appearing in BOTH halves of the order book
        val o = m.getDDFByName("orders").df
        Joins.intersect(
            m.register(o.filter(col("o_orderkey") % 2 === 0).select("o_custkey")),
            m.register(o.filter(col("o_orderkey") % 2 === 1).select("o_custkey")))
          .df.orderBy("o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0
             |INTERSECT
             |SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 1
             |ORDER BY o_custkey""".stripMargin)),

    Q("q19_except",
      (s, d) => {
        val m = mgr(s, d)
        // customers with orders but never a high-priority one
        val o = m.getDDFByName("orders").df
        Joins.except(
            m.register(o.select("o_custkey")),
            m.register(o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")))
          .df.orderBy("o_custkey")
      },
      Some("""SELECT o_custkey FROM orders
             |EXCEPT
             |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
             |ORDER BY o_custkey""".stripMargin)),

    Q("q36_rollup",
      (s, d) => {
        val m = mgr(s, d)
        // OLAP rollup (subtotals + grand total) — extension the reference
        // lacks; NULL grouping markers compare exactly via the gate's
        // NULLS-FIRST ordering
        m.getDDFByName("lineitem").df
          .rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  (sum(l_quantity::DECIMAL(18,2)))::DOUBLE AS sum_qty
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    Q("q86_cube",
      (s, d) => {
        val m = mgr(s, d)
        // all 4 grouping levels in one Expand+hash-agg pass; gid
        // disambiguates rollup NULLs from data NULLs
        Aggregations.cube(m.getDDFByName("lineitem"),
          Seq("l_returnflag", "l_linestatus"),
          Seq("n=count(*)", "sum_qty=sum(l_quantity)"))
          .df.withColumn("sum_qty", col("sum_qty").cast("decimal(18,2)").cast("double"))
          .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first)
      },
      Some("""SELECT GROUPING(l_returnflag, l_linestatus) AS gid,
             |  l_returnflag, l_linestatus, count(*) AS n,
             |  (sum(l_quantity)::DECIMAL(18,2))::DOUBLE AS sum_qty
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    Q("q87_grouping_sets",
      (s, d) => {
        val m = mgr(s, d)
        // only the requested combinations — (status), (priority), ()
        // — skipping the full cross, unlike CUBE
        Aggregations.groupingSets(m.getDDFByName("orders"),
          Seq("o_orderstatus", "o_orderpriority"),
          Seq(Seq("o_orderstatus"), Seq("o_orderpriority"), Nil),
          Seq("n=count(*)", "mx=max(o_totalprice)"))
          .df.orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
            col("o_orderpriority").asc_nulls_first)
      },
      Some("""SELECT GROUPING(o_orderstatus, o_orderpriority) AS gid,
             |  o_orderstatus, o_orderpriority, count(*) AS n, max(o_totalprice) AS mx
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
             |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    Q("q46_moments",
      (s, d) => mgr(s, d).sql2ddf(momentsSql).df,
      Some(momentsSql)),

    Q("q47_group_median",
      (s, d) => {
        val m = mgr(s, d)
        // exact median by middle-rank selection — integer ranking +
        // decimal mean, engine-independent (no double interpolation)
        Stats.groupMedian(m.getDDFByName("orders").df, "o_orderstatus", "o_totalprice")
          .orderBy("o_orderstatus")
      },
      Some("""WITH f AS (SELECT o_orderstatus, o_totalprice FROM orders
             |  WHERE o_totalprice IS NOT NULL),
             |r AS (SELECT o_orderstatus, o_totalprice,
             |    row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice) AS rn,
             |    count(*) OVER (PARTITION BY o_orderstatus) AS n FROM f)
             |SELECT o_orderstatus,
             |  sum(o_totalprice::DECIMAL(38,2))::DOUBLE / count(*) AS median
             |FROM r WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    Q("q37_unpivot",
      (s, d) => {
        val m = mgr(s, d)
        // wide→long reshape (melt) — both engines name the value columns
        // identically, so values AND the metric label column hash-match
        m.getDDFByName("lineitem").df.filter(col("l_orderkey") < 100)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
          .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_quantity"), col("l_discount")), "metric", "val")
          .orderBy("l_orderkey", "l_linenumber", "metric")
      },
      Some("""SELECT l_orderkey, l_linenumber, metric, val FROM (
             |  UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, l_discount
             |           FROM lineitem WHERE l_orderkey < 100)
             |  ON l_quantity, l_discount INTO NAME metric VALUE val)
             |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin)),

    Q("q65_lag_delta",
      (s, d) => {
        val m = mgr(s, d)
        // lead/lag family: per-user value delta over event time (ts,
        // event_id is a unique total order; subtraction of identical
        // operands is fp-exact cross-engine)
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        m.getDDFByName("events").df
          .withColumn("prev_value", lag("value", 1).over(w))
          .select(col("event_id"), col("user_id"), col("value"),
            col("prev_value"), (col("value") - col("prev_value")).as("delta"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, value,
             |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
             |  value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
             |FROM events ORDER BY event_id""".stripMargin)),

    Q("q90_topk_by_group",
      (s, d) => {
        val m = mgr(s, d)
        // top-3 orders per status via the NATIVE bounded-heap aggregate
        // (map-side partial top-k — no window, no sort of the data; the
        // plan is pinned in ScaleSpec). Struct order (o_totalprice,
        // o_orderkey) descending ⇒ ties on price break to the greatest
        // key — the oracle's window mirrors that exactly.
        val o = m.getDDFByName("orders").df
          .select("o_orderstatus", "o_orderkey", "o_totalprice")
        operators.Views.topKByGroup(o, Seq("o_orderstatus"),
            Seq("o_totalprice", "o_orderkey"), k = 3)
          .orderBy(col("o_orderstatus"), col("o_totalprice").desc,
            col("o_orderkey").desc)
      },
      Some("""SELECT o_orderstatus, o_totalprice, o_orderkey FROM (
             |  SELECT o_orderstatus, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_orderstatus
             |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rk
             |  FROM orders) WHERE rk <= 3
             |ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey DESC""".stripMargin)),

    Q("q91_sql_bounded_topk",
      (s, d) => {
        val m = mgr(s, d)
        // the SAME query as q90 written in dialect SQL — proves the
        // native aggregate is part of the engine's SQL surface (the
        // manager registers GraftFunctions at construction), not just
        // the Scala API.
        m.sql2ddf(
          """select o_orderstatus, e.o_totalprice, e.o_orderkey from (
            |  select o_orderstatus,
            |    explode(bounded_top_k(struct(o_totalprice, o_orderkey), 3)) as e
            |  from orders group by o_orderstatus)
            |order by o_orderstatus, e.o_totalprice desc, e.o_orderkey desc""".stripMargin).df
      },
      Some("""SELECT o_orderstatus, o_totalprice, o_orderkey FROM (
             |  SELECT o_orderstatus, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_orderstatus
             |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rk
             |  FROM orders) WHERE rk <= 3
             |ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey DESC""".stripMargin)),

    Q("q92_budget_select",
      (s, d) => {
        val m = mgr(s, d)
        // greedy budget selection (round 12): the most valuable lineitems
        // whose quantities fit a 500k-unit budget, priority price DESC
        // with a unique (orderkey, linenumber) tie-break. The operator's
        // two-pass range-partition + driver-prefix shape replaces the
        // global single-task running-sum window the oracle uses — output
        // sets must be identical.
        val li = m.getDDFByName("lineitem").df
          .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
        operators.Views.budgetSelect(li,
            Seq(col("l_extendedprice").desc, col("l_orderkey").asc,
              col("l_linenumber").asc),
            "l_quantity", budget = 500000L)
          .select("l_orderkey", "l_linenumber", "l_extendedprice")
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
            col("l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM (
             |  SELECT l_orderkey, l_linenumber, l_extendedprice,
             |    sum(CAST(l_quantity AS BIGINT)) OVER (
             |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
             |      ROWS UNBOUNDED PRECEDING) AS qty_cum
             |  FROM lineitem)
             |WHERE qty_cum <= 500000
             |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber""".stripMargin)),

    Q("q93_transform_r",
      (s, d) => {
        val m = mgr(s, d)
        // the reference's transformNativeRserve surface (round 13): base-R
        // transform() mutate expressions COMPILED to one Catalyst
        // projection (sql/RTransform) — no R process, no UDF. The
        // expression exercises the R semantics a naive SQL mapping gets
        // wrong: %% sign-of-divisor on a negative dividend, %/% floor
        // division as double, banker's round on exact .5 halves
        // (l_partkey/2), NA-free %in%, and paste0. Every derived value is
        // per-row integer-or-exact-double arithmetic — bit-identical in
        // any engine.
        m.getDDFByName("lineitem").transformR(
          """disc_price = l_extendedprice * (1 - l_discount),
            |qty_bucket = l_quantity %/% 10,
            |sgn_mod = as.integer((l_linenumber - 4L) %% 3L),
            |half_even = round(l_partkey / 2),
            |flag = ifelse(l_quantity > 30, tolower(l_returnflag), l_returnflag),
            |tag = paste0(l_returnflag, '-', l_linestatus),
            |in_set = l_returnflag %in% c('A', 'R')""".stripMargin).df
          .select("l_orderkey", "l_linenumber", "disc_price", "qty_bucket",
            "sgn_mod", "half_even", "flag", "tag", "in_set")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  l_extendedprice * (1 - l_discount) AS disc_price,
             |  floor(l_quantity / 10) AS qty_bucket,
             |  ((CAST(l_linenumber AS BIGINT) - 4) % 3 + 3) % 3 AS sgn_mod,
             |  CAST(l_partkey // 2 + CASE WHEN l_partkey % 2 = 1
             |         AND (l_partkey // 2) % 2 = 1 THEN 1 ELSE 0 END
             |       AS DOUBLE) AS half_even,
             |  CASE WHEN l_quantity > 30 THEN lower(l_returnflag)
             |       ELSE l_returnflag END AS flag,
             |  l_returnflag || '-' || l_linestatus AS tag,
             |  l_returnflag IN ('A', 'R') AS in_set
             |FROM lineitem
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("q94_budget_select_by_group",
      (s, d) => {
        val m = mgr(s, d)
        // per-source char budgets, longest-documents-first with a doc_id
        // tie-break (round 13): three sources carry explicit budgets
        // (one of them zero — the whole source must vanish), the rest
        // ride defaultBudget. The operator's slim-window + cutoff-join
        // shape must equal the oracle's straight per-group running-sum
        // window. n_chars is integral and positive, so the peer-
        // inclusive RANGE frame both engines default to sees identical
        // sums.
        val docs = m.getDDFByName("documents").df
        operators.Views.budgetSelectByGroup(docs, "source",
            Seq(col("n_chars").desc, col("doc_id").asc), "n_chars",
            budgets = Map("src1" -> 5000L, "src3" -> 2500L, "src7" -> 0L),
            defaultBudget = 3000L)
          .select("doc_id", "source", "n_chars")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, source, n_chars FROM (
             |  SELECT doc_id, source, n_chars,
             |    sum(n_chars) OVER (PARTITION BY source
             |      ORDER BY n_chars DESC, doc_id) AS rs
             |  FROM documents)
             |WHERE rs <= CASE source WHEN 'src1' THEN 5000
             |                        WHEN 'src3' THEN 2500
             |                        WHEN 'src7' THEN 0
             |                        ELSE 3000 END
             |ORDER BY doc_id""".stripMargin)),

    Q("ds03_budget_colossal_path",
      (s, d) => {
        val m = mgr(s, d)
        // q94's contract driven through the COLOSSAL branch (r15 verdict
        // ask #4): every source group holds >= 25 rows at every SF, so
        // colossalThreshold = 10 routes ALL groups off the window path
        // onto the shared range-exchange prefix scan (the all-colossal
        // regime — no Window anywhere in the plan; ScaleSpec pins the
        // plan shape, this row pins the VALUES against the same
        // per-group running-sum window oracle as q94). A zero budget
        // must vanish its whole group on this branch too.
        val docs = m.getDDFByName("documents").df
        operators.Views.budgetSelectByGroup(docs, "source",
            Seq(col("n_chars").desc, col("doc_id").asc), "n_chars",
            budgets = Map("src2" -> 0L, "src5" -> 4000L),
            defaultBudget = 2000L, colossalThreshold = 10L)
          .select("doc_id", "source", "n_chars")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, source, n_chars FROM (
             |  SELECT doc_id, source, n_chars,
             |    sum(n_chars) OVER (PARTITION BY source
             |      ORDER BY n_chars DESC, doc_id) AS rs
             |  FROM documents)
             |WHERE rs <= CASE source WHEN 'src2' THEN 0
             |                        WHEN 'src5' THEN 4000
             |                        ELSE 2000 END
             |ORDER BY doc_id""".stripMargin)),

    Q("u03_mapreduce_r",
      (s, d) => {
        val m = mgr(s, d)
        // the reference's R keyval map-reduce (round 13), compiled to a
        // grouped aggregation — the documented TransformationHandlerSpec
        // shape plus an arithmetic reduce (range = max - min alongside
        // the sum). Deterministic: l_quantity is integral-valued, so
        // sum-of-doubles is IEEE-exact in any order at this scale.
        m.getDDFByName("lineitem").transformMapReduceNative(
          "function(part) { keyval(key=part$l_returnflag, val=part$l_quantity) }",
          "function(key, vv) { keyval.row(key=key, val=sum(vv) + (max(vv) - min(vv))) }").df
          .orderBy("key")
      },
      Some("""SELECT l_returnflag AS key,
             |  sum(l_quantity) + (max(l_quantity) - min(l_quantity)) AS val
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY key""".stripMargin)),

    Q("u04_index_encode",
      (s, d) => {
        val m = mgr(s, d)
        // frequency-ranked categorical ids (StringIndexer's frequencyDesc
        // contract, no fitted model): id 0 = most frequent, ties by value
        operators.Transforms.indexEncode(m.getDDFByName("orders"),
            "o_orderpriority", "prio_id").df
          .groupBy("o_orderpriority", "prio_id")
          .agg(count(lit(1)).as("n"))
          .orderBy("prio_id")
      },
      Some("""WITH c AS (SELECT o_orderpriority, count(*) AS n FROM orders
             |  WHERE o_orderpriority IS NOT NULL GROUP BY 1)
             |SELECT o_orderpriority,
             |  (row_number() OVER (ORDER BY n DESC, o_orderpriority) - 1)::BIGINT
             |    AS prio_id,
             |  n::BIGINT AS n
             |FROM c ORDER BY prio_id""".stripMargin)),

    Q("q88_window_distribution",
      (s, d) => {
        val m = mgr(s, d)
        // distribution-window family: ntile / percent_rank / cume_dist.
        // The order key (o_totalprice DESC, o_orderkey) is a unique total
        // order, so ntile bucket boundaries are deterministic;
        // percent_rank (rk−1)/(n−1) and cume_dist rk/n are single IEEE
        // divisions of exact integers — identical in any engine.
        m.sql2ddf(
          """select o_orderkey, o_orderstatus,
            |  ntile(4) over w as price_quartile,
            |  round(percent_rank() over w, 9) as pct_rank,
            |  round(cume_dist() over w, 9) as cume
            |from orders
            |window w as (partition by o_orderstatus
            |             order by o_totalprice desc, o_orderkey)
            |order by o_orderkey""".stripMargin).df
      },
      Some("""SELECT o_orderkey, o_orderstatus,
             |  ntile(4) OVER w AS price_quartile,
             |  round(percent_rank() OVER w, 9) AS pct_rank,
             |  round(cume_dist() OVER w, 9) AS cume
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderstatus
             |             ORDER BY o_totalprice DESC, o_orderkey)
             |ORDER BY o_orderkey""".stripMargin)),

    Q("q29_salted_join",
      (s, d) => {
        val m = mgr(s, d)
        // salting only changes the shuffle distribution — the oracle is
        // the PLAIN join, proving output-equivalence through the gate
        operators.Joins.saltedJoin(
          m.getDDFByName("lineitem").df.select("l_orderkey", "l_partkey", "l_quantity"),
          m.getDDFByName("part").df.select("p_partkey", "p_brand")
            .withColumnRenamed("p_partkey", "l_partkey"),
          Seq("l_partkey"), saltFactor = 8)
          .groupBy("p_brand").agg(
            count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
          .orderBy("p_brand")
      },
      Some("""SELECT p_brand, count(*) AS n,
             |  (sum(l_quantity::DECIMAL(18,2)))::DOUBLE AS sum_qty
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin))
  )

  // =====================================================================
  // §2.4 Aggregation API
  // =====================================================================

  private val aggregation: Seq[Q] = Seq(
    Q("q30_aggregate_api",
      (s, d) => {
        val m = mgr(s, d)
        Aggregations.aggregate(m.getDDFByName("lineitem"),
          "l_returnflag, n=count(*), mx=max(l_quantity), mn=min(l_quantity)")
          .df.orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n, max(l_quantity) AS mx,
             |  min(l_quantity) AS mn
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q("q31_groupby_2step",
      (s, d) => {
        val m = mgr(s, d)
        val g = Aggregations.groupByStep1(m.getDDFByName("orders"), Seq("o_orderstatus"))
        Aggregations.groupByStep2(g, Seq("n=count(*)", "mx=max(o_totalprice)"))
          .df.orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n, max(o_totalprice) AS mx
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    Q("v01_validate",
      (s, d) => {
        val m = mgr(s, d)
        // publish-gate expectations over lineitem: two row rules (one
        // violated on purpose), a unique key, a clean FK, and a
        // deliberately wrong FK — all five counts oracle-exact
        import operators.Validate
        Validate.report(m.getDDFByName("lineitem").df, Seq(
          Validate.inRange("l_discount", 0.0, 0.05),
          Validate.oneOf("l_returnflag", Seq("A", "N")),
          Validate.UniqueKey(Seq("l_orderkey", "l_linenumber")),
          Validate.ForeignKey(Seq("l_orderkey"),
            m.getDDFByName("orders").df, Seq("o_orderkey")),
          Validate.ForeignKey(Seq("l_partkey"),
            m.getDDFByName("region").df, Seq("r_regionkey"))
        )).orderBy("rule")
      },
      Some("""SELECT * FROM (
             |  SELECT 'in_range(l_discount,0.0,0.05)' AS rule,
             |    sum(CASE WHEN l_discount IS NULL OR l_discount < 0.0
             |             OR l_discount > 0.05 THEN 1 ELSE 0 END)::BIGINT AS violations,
             |    count(*)::BIGINT AS checked FROM lineitem
             |  UNION ALL
             |  SELECT 'one_of(l_returnflag)',
             |    sum(CASE WHEN l_returnflag IS NULL
             |             OR l_returnflag NOT IN ('A', 'N') THEN 1 ELSE 0 END)::BIGINT,
             |    count(*)::BIGINT FROM lineitem
             |  UNION ALL
             |  SELECT 'unique(l_orderkey,l_linenumber)',
             |    coalesce((SELECT sum(n) FROM (
             |      SELECT count(*) AS n FROM lineitem
             |      GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)), 0)::BIGINT,
             |    count(*)::BIGINT FROM lineitem
             |  UNION ALL
             |  SELECT 'fk(l_orderkey)',
             |    (SELECT count(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL
             |     AND NOT EXISTS (
             |       SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))::BIGINT,
             |    count(*)::BIGINT FROM lineitem
             |  UNION ALL
             |  SELECT 'fk(l_partkey)',
             |    (SELECT count(*) FROM lineitem l WHERE l.l_partkey IS NOT NULL
             |     AND NOT EXISTS (
             |       SELECT 1 FROM region r WHERE r.r_regionkey = l.l_partkey))::BIGINT,
             |    count(*)::BIGINT FROM lineitem
             |) ORDER BY rule""".stripMargin)),

    Q("v02_vector_validate",
      (s, d) => {
        val m = mgr(s, d)
        // embedding publish gate: dimension drift / NaN poisoning /
        // zero vectors, planted deterministically (every 97th vec gets a
        // NaN head, every 89th is truncated to dim 3, every 83rd zeroed;
        // the when-chain precedence mirrors the oracle's CASE)
        import operators.Validate
        val aug = m.getDDFByName("embeddings").df.select(col("vec_id"),
          when(col("vec_id") % 97 === 0,
            concat(array(lit(Float.NaN)), slice(col("embedding"), 2, 63)))
            .when(col("vec_id") % 89 === 0, slice(col("embedding"), 1, 3))
            .when(col("vec_id") % 83 === 0,
              transform(col("embedding"), _ => lit(0.0f)))
            .otherwise(col("embedding")).as("embedding"))
        Validate.report(aug, Seq(
          Validate.vectorDim("embedding", 64),
          Validate.vectorFinite("embedding"),
          Validate.vectorNonZero("embedding"))).orderBy("rule")
      },
      Some("""WITH aug AS (SELECT vec_id,
             |    CASE WHEN vec_id % 97 = 0
             |           THEN list_concat(['NaN'::FLOAT], embedding[2:64])
             |         WHEN vec_id % 89 = 0 THEN embedding[1:3]
             |         WHEN vec_id % 83 = 0
             |           THEN list_transform(embedding, x -> 0.0::FLOAT)
             |         ELSE embedding END AS embedding
             |  FROM embeddings)
             |SELECT * FROM (
             |  SELECT 'vector_dim(embedding,64)' AS rule,
             |    sum(CASE WHEN embedding IS NULL OR len(embedding) != 64
             |             THEN 1 ELSE 0 END)::BIGINT AS violations,
             |    count(*)::BIGINT AS checked FROM aug
             |  UNION ALL
             |  SELECT 'vector_finite(embedding)',
             |    sum(CASE WHEN embedding IS NULL OR len(list_filter(embedding,
             |             x -> isnan(x) OR isinf(x))) > 0 THEN 1 ELSE 0 END)::BIGINT,
             |    count(*)::BIGINT FROM aug
             |  UNION ALL
             |  SELECT 'vector_nonzero(embedding)',
             |    sum(CASE WHEN embedding IS NULL OR len(list_filter(embedding,
             |             x -> x != 0)) = 0 THEN 1 ELSE 0 END)::BIGINT,
             |    count(*)::BIGINT FROM aug
             |) ORDER BY rule""".stripMargin)),

    Q("iv01_incremental_agg",
      (s, d) => {
        val m = mgr(s, d)
        // incremental view maintenance: aggregate old and new partitions
        // separately, merge the FINISHED aggregates — must equal a direct
        // aggregate over the union (the oracle). sum(l_quantity) is exact
        // (integral doubles), so the merge identity is bitwise.
        val li = m.getDDFByName("lineitem").df
        val spec = "l_returnflag, n=count(*), mx=max(l_quantity), " +
          "mn=min(l_quantity), sq=sum(l_quantity)"
        val old = m.register(li.filter(col("l_orderkey") % 10 =!= 0))
        val nw = m.register(li.filter(col("l_orderkey") % 10 === 0))
        Aggregations.mergeAggregates(
          Aggregations.aggregate(old, spec).df,
          Aggregations.aggregate(nw, spec).df, spec)
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n, max(l_quantity) AS mx,
             |  min(l_quantity) AS mn, sum(l_quantity) AS sq
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    Q("g01_pagerank",
      (s, d) => {
        val m = mgr(s, d)
        // fixed-point integer PageRank over the undirected part↔supplier
        // bipartite graph from lineitem — deterministic by construction
        // (floor divisions, integer sums), so the oracle replays it exactly
        val li = m.getDDFByName("lineitem").df
        val fwd = li.select(concat(lit("p"), col("l_partkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
        Graph.pageRank(edges, "src", "dst", iterations = 5)
          .orderBy(col("pr").desc, col("node"))
      },
      Some {
        val base =
          """edges AS (
            |  SELECT DISTINCT 'p' || l_partkey AS src, 's' || l_suppkey AS dst
            |  FROM lineitem
            |  UNION
            |  SELECT DISTINCT 's' || l_suppkey AS src, 'p' || l_partkey AS dst
            |  FROM lineitem),
            |deg AS (SELECT src, count(*)::BIGINT AS outdeg FROM edges GROUP BY src),
            |nodes AS (SELECT DISTINCT src AS node FROM edges
            |          UNION SELECT DISTINCT dst FROM edges),
            |pr0 AS (SELECT node, 1000000::BIGINT AS pr FROM nodes)""".stripMargin
        val iters = (0 until 5).map { k =>
          s"""c$k AS (
             |  SELECT e.dst AS node, sum(p.pr // d.outdeg)::BIGINT AS contrib
             |  FROM edges e JOIN pr$k p ON e.src = p.node JOIN deg d ON e.src = d.src
             |  GROUP BY e.dst),
             |pr${k + 1} AS (
             |  SELECT n.node,
             |    (150000 + (85 * coalesce(c.contrib, 0)) // 100)::BIGINT AS pr
             |  FROM nodes n LEFT JOIN c$k c ON n.node = c.node)""".stripMargin
        }
        s"WITH ${(base +: iters).mkString(",\n")}\n" +
          "SELECT node, pr FROM pr5 ORDER BY pr DESC, node"
      }),

    Q("g05_kcore",
      (s, d) => {
        val m = mgr(s, d)
        // 6-core over a two-regime graph: 25 cliques over ids 0–250
        // (custkeys start at 0, so group 0 has 11 members at degree 10;
        // the rest are ten-member at degree 9 — the robust core) plus a
        // {3,5,8}-offset lattice on ids 251–400 whose max degree 6
        // unravels through a ~10-round peel cascade (simulated during
        // design) — the oracle replays 12 peel rounds (post-fixpoint
        // rounds are no-ops) and reads the final in-core degrees.
        import s.implicits._
        val ids = m.getDDFByName("customer").df.select(col("c_custkey").as("id"))
        val cl = ids.filter(col("id") <= 250)
          .withColumn("g", expr("(id - 1) div 10"))
        val cliqueEdges = cl.as("x")
          .join(cl.select(col("id").as("id2"), col("g")).as("y"),
            col("x.g") === col("y.g") && col("x.id") < col("id2"))
          .select(col("x.id").as("src"), col("id2").as("dst"))
        val off = Seq(3L, 5L, 8L).toDF("o")
        val latEdges = ids.filter(col("id") > 250 && col("id") <= 400)
          .crossJoin(broadcast(off))
          .select(col("id").as("src"), (col("id") + col("o")).as("dst"))
          .join(ids.filter(col("id") > 250 && col("id") <= 400)
            .select(col("id").as("dst")), "dst")
          .select("src", "dst")
        Graph.kCore(cliqueEdges.unionByName(latEdges), "src", "dst", k = 6)
          .orderBy("node")
      },
      Some {
        val base =
          """ids AS MATERIALIZED (SELECT c_custkey AS id FROM customer),
            |ce AS (SELECT a.id AS a, b.id AS b FROM ids a JOIN ids b
            |  ON a.id <= 250 AND b.id <= 250
            |  AND (a.id - 1) // 10 = (b.id - 1) // 10 AND a.id < b.id),
            |le AS (SELECT a.id AS a, b.id AS b FROM ids a
            |  JOIN (VALUES (3), (5), (8)) t(o) ON true
            |  JOIN ids b ON b.id = a.id + t.o
            |  WHERE a.id > 250 AND a.id <= 400 AND b.id <= 400),
            |canon AS MATERIALIZED (SELECT DISTINCT a, b
            |  FROM (SELECT * FROM ce UNION ALL SELECT * FROM le)),
            |sym AS MATERIALIZED (
            |  SELECT a AS src, b AS dst FROM canon
            |  UNION ALL SELECT b, a FROM canon),
            |a0 AS MATERIALIZED (SELECT DISTINCT src AS v FROM sym)""".stripMargin
        val rounds = (0 to 12).map { r =>
          s"""d$r AS MATERIALIZED (
             |  SELECT s.src AS v, count(*)::BIGINT AS dg FROM sym s
             |  JOIN a$r x ON s.src = x.v JOIN a$r y ON s.dst = y.v
             |  GROUP BY s.src),
             |a${r + 1} AS MATERIALIZED (SELECT v FROM d$r WHERE dg >= 6)""".stripMargin
        }
        s"WITH ${(base +: rounds).mkString(",\n")}\n" +
          "SELECT v AS node, dg AS core_deg FROM d12 ORDER BY node"
      }),

    Q("g04_pagerank_weighted",
      (s, d) => {
        val m = mgr(s, d)
        // weighted fixed-point PageRank over the same part↔supplier
        // bipartite graph as g01, edge weight = lineitem row count per
        // (part, supp) pair — rank splits proportionally to shipment
        // volume. Deterministic by the same integer-floor construction;
        // the oracle replays all 5 weighted rounds.
        val li = m.getDDFByName("lineitem").df
        val fwd = li.groupBy(
            concat(lit("p"), col("l_partkey")).as("src"),
            concat(lit("s"), col("l_suppkey")).as("dst"))
          .agg(count(lit(1)).as("w"))
        val edges = fwd.unionByName(
          fwd.select(col("dst").as("src"), col("src").as("dst"), col("w")))
        Graph.pageRankWeighted(edges, "src", "dst", "w", iterations = 5)
          .orderBy(col("pr").desc, col("node"))
      },
      Some {
        val base =
          """ew AS MATERIALIZED (
            |  SELECT 'p' || l_partkey AS src, 's' || l_suppkey AS dst,
            |    count(*)::BIGINT AS w
            |  FROM lineitem GROUP BY 1, 2),
            |edges AS MATERIALIZED (
            |  SELECT src, dst, w FROM ew
            |  UNION ALL SELECT dst, src, w FROM ew),
            |deg AS MATERIALIZED (SELECT src, sum(w)::BIGINT AS sw FROM edges GROUP BY src),
            |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
            |pr0 AS (SELECT node, 1000000::BIGINT AS pr FROM nodes)""".stripMargin
        val iters = (0 until 5).map { k =>
          s"""c$k AS MATERIALIZED (
             |  SELECT e.dst AS node, sum((p.pr * e.w) // d.sw)::BIGINT AS contrib
             |  FROM edges e JOIN pr$k p ON e.src = p.node JOIN deg d ON e.src = d.src
             |  GROUP BY e.dst),
             |pr${k + 1} AS MATERIALIZED (
             |  SELECT n.node,
             |    (150000 + (85 * coalesce(c.contrib, 0)) // 100)::BIGINT AS pr
             |  FROM nodes n LEFT JOIN c$k c ON n.node = c.node)""".stripMargin
        }
        s"WITH ${(base +: iters).mkString(",\n")}\n" +
          "SELECT node, pr FROM pr5 ORDER BY pr DESC, node"
      }),

    Q("g02_triangle_count",
      (s, d) => {
        val m = mgr(s, d)
        // Sparse deterministic triangle-rich graph on customer keys:
        // edges (k, k+o) for o ∈ {7, 11, 18} whenever both endpoints
        // exist — 7 + 11 = 18 closes two triangle families per anchor
        // key, so the graph has ~2·|nodes| triangles at degree ≤ 6.
        // The operator's degree orientation is exercised for real; the
        // oracle replays the orientation-independent a<b<c formulation.
        val ids = m.getDDFByName("customer").df.select(col("c_custkey").as("k"))
        import s.implicits._
        val off = Seq(7L, 11L, 18L).toDF("o")
        val cand = ids.crossJoin(broadcast(off))
          .select(col("k").as("src"), (col("k") + col("o")).as("dst"))
        val edges = cand.join(ids.select(col("k").as("dst")), "dst")
        Graph.triangleCount(edges, "src", "dst").orderBy("node")
      },
      Some("""WITH ids AS (SELECT c_custkey AS k FROM customer),
             |e AS (
             |  SELECT a.k AS a, b.k AS b FROM ids a JOIN ids b ON b.k = a.k + 7
             |  UNION ALL
             |  SELECT a.k, b.k FROM ids a JOIN ids b ON b.k = a.k + 11
             |  UNION ALL
             |  SELECT a.k, b.k FROM ids a JOIN ids b ON b.k = a.k + 18),
             |tri AS (
             |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
             |  FROM e e1 JOIN e e2 ON e2.a = e1.b
             |       JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
             |corners AS (
             |  SELECT x AS node FROM tri
             |  UNION ALL SELECT y FROM tri
             |  UNION ALL SELECT z FROM tri)
             |SELECT node, count(*)::BIGINT AS triangles
             |FROM corners GROUP BY node ORDER BY node""".stripMargin)),

    Q("g03_connected_components",
      (s, d) => {
        val m = mgr(s, d)
        // Chain graph: k — k+7 when both customers share a market
        // segment. Segment changes break the chains, so the graph is
        // hundreds of genuinely multi-hop path components — the
        // pointer-doubling propagation does real work. The oracle
        // replays the EXACT per-round recurrence (one-hop min + label-
        // of-label) for 10 rounds; rounds past convergence are no-ops,
        // so any oracle depth ≥ the converged round count matches.
        val c = m.getDDFByName("customer").df
          .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"))
        val edges = c.join(
            c.select(col("k").as("k2"), col("seg").as("seg2")),
            col("k2") === col("k") + 7 && col("seg2") === col("seg"))
          .select(col("k").as("src"), col("k2").as("dst"))
        Graph.connectedComponents(edges, "src", "dst").orderBy("id")
      },
      Some {
        val base =
          """c AS MATERIALIZED (SELECT c_custkey AS k, c_mktsegment AS seg FROM customer),
            |ed AS MATERIALIZED (SELECT a.k AS src, b.k AS dst FROM c a
            |       JOIN c b ON b.k = a.k + 7 AND b.seg = a.seg),
            |edges AS MATERIALIZED (SELECT src, dst FROM ed UNION SELECT dst, src FROM ed),
            |lab0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS label FROM edges)""".stripMargin
        val rounds = (0 until 10).map { k =>
          s"""n$k AS MATERIALIZED (SELECT e.dst AS id, min(l.label) AS nlabel
             |  FROM edges e JOIN lab$k l ON e.src = l.id GROUP BY e.dst),
             |hop$k AS MATERIALIZED (SELECT l.id, least(l.label, coalesce(n.nlabel, l.label)) AS label
             |  FROM lab$k l LEFT JOIN n$k n USING (id)),
             |lab${k + 1} AS MATERIALIZED (SELECT a.id, least(a.label, coalesce(b.label, a.label)) AS label
             |  FROM hop$k a LEFT JOIN hop$k b ON a.label = b.id)""".stripMargin
        }
        s"WITH ${(base +: rounds).mkString(",\n")}\n" +
          "SELECT id, label AS cluster_id FROM lab10 ORDER BY id"
      }),

    Q("q32_agg_on_column",
      (s, d) => {
        val m = mgr(s, d)
        val li = m.getDDFByName("lineitem")
        val mx = Aggregations.aggregateOnColumn(li, "max", "l_quantity")
        val cnt = Aggregations.aggregateOnColumn(li, "count", "*")
        import s.implicits._
        Seq((mx.asInstanceOf[Double], cnt.asInstanceOf[Long])).toDF("max_qty", "n_rows")
      },
      Some("SELECT max(l_quantity) AS max_qty, count(*) AS n_rows FROM lineitem")),

    Q("q33_xtabs",
      (s, d) => {
        val m = mgr(s, d)
        Aggregations.xtabs(m.getDDFByName("orders"),
          "o_orderstatus, o_orderpriority, n=count(*)")
          .df.orderBy("o_orderstatus", "o_orderpriority")
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
             |FROM orders GROUP BY o_orderstatus, o_orderpriority
             |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)),

    // corr/covar from exact 2-decimal sufficient statistics — identical
    // double arithmetic in both engines, no iterative-aggregate drift.
    // A ScalaTest pins library corr()/covariance() against these values.
    Q("q34_corr",
      (s, d) => {
        val m = mgr(s, d)
        m.getDDFByName("lineitem").df.agg(
          count(lit(1)).as("n"),
          dsum(col("l_quantity")).as("sx"),
          dsum(col("l_extendedprice")).as("sy"),
          dsum2(col("l_quantity"), col("l_extendedprice")).as("sxy"),
          dsum2(col("l_quantity"), col("l_quantity")).as("sxx"),
          dsum2(col("l_extendedprice"), col("l_extendedprice")).as("syy"))
          .select(round(
            (col("sxy") - col("sx") * col("sy") / col("n")) /
              sqrt((col("sxx") - col("sx") * col("sx") / col("n")) *
                   (col("syy") - col("sy") * col("sy") / col("n"))), 6).as("corr_qty_price"))
      },
      Some(s"""WITH t AS (SELECT count(*) AS n,
              |  ${dsumSql("l_quantity")} AS sx, ${dsumSql("l_extendedprice")} AS sy,
              |  ${dsum2Sql("l_quantity", "l_extendedprice")} AS sxy,
              |  ${dsum2Sql("l_quantity", "l_quantity")} AS sxx,
              |  ${dsum2Sql("l_extendedprice", "l_extendedprice")} AS syy
              |  FROM lineitem)
              |SELECT round((sxy - sx*sy/n) / sqrt((sxx - sx*sx/n)*(syy - sy*sy/n)), 6)
              |  AS corr_qty_price FROM t""".stripMargin)),

    Q("q35_covar",
      (s, d) => {
        val m = mgr(s, d)
        m.getDDFByName("lineitem").df.agg(
          count(lit(1)).as("n"),
          dsum(col("l_quantity")).as("sx"),
          dsum(col("l_extendedprice")).as("sy"),
          dsum2(col("l_quantity"), col("l_extendedprice")).as("sxy"))
          .select(round(
            (col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1), 4)
            .as("covar_qty_price"))
      },
      Some(s"""WITH t AS (SELECT count(*) AS n,
              |  ${dsumSql("l_quantity")} AS sx, ${dsumSql("l_extendedprice")} AS sy,
              |  ${dsum2Sql("l_quantity", "l_extendedprice")} AS sxy
              |  FROM lineitem)
              |SELECT round((sxy - sx*sy/n) / (n - 1), 4) AS covar_qty_price FROM t""".stripMargin)),

    Q("q95_pivot",
      (s, d) => {
        val m = mgr(s, d)
        // long→wide pivot with EXPLICIT values (one hash aggregate, no
        // distinct-scan job — see Aggregations.pivot scaladoc). sum of
        // the integer-valued l_quantity is order-exact in doubles; max
        // is order-free — both hash-match without decimal detours.
        Aggregations.pivot(m.getDDFByName("lineitem"),
          Seq("l_linenumber"), "l_returnflag", Seq("A", "N", "R"),
          Seq("qty=sum(l_quantity)", "mx=max(l_extendedprice)"))
          .df.orderBy("l_linenumber")
      },
      Some("""SELECT l_linenumber,
             |  sum(CASE WHEN l_returnflag='A' THEN l_quantity END) AS A_qty,
             |  max(CASE WHEN l_returnflag='A' THEN l_extendedprice END) AS A_mx,
             |  sum(CASE WHEN l_returnflag='N' THEN l_quantity END) AS N_qty,
             |  max(CASE WHEN l_returnflag='N' THEN l_extendedprice END) AS N_mx,
             |  sum(CASE WHEN l_returnflag='R' THEN l_quantity END) AS R_qty,
             |  max(CASE WHEN l_returnflag='R' THEN l_extendedprice END) AS R_mx
             |FROM lineitem GROUP BY l_linenumber ORDER BY l_linenumber""".stripMargin)),

    Q("q96_corr_matrix",
      (s, d) => {
        val m = mgr(s, d)
        // pairwise Pearson matrix from ONE sufficient-statistics pass
        // (k(k-1)/2 separate corr() calls would re-scan per pair);
        // decimal-exact sums (the q34 recipe) → identical double
        // arithmetic both sides → round(6) is noise-free
        Stats.corrMatrix(m.getDDFByName("lineitem").df,
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
          decimalScale = Some(2))
          .select(col("col_x"), col("col_y"), round(col("corr"), 6).as("corr"))
          .orderBy("col_x", "col_y")
      },
      Some {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val sums = cols.map(c => s"${dsumSql(c)} AS s_$c")
        val prods = for { i <- cols.indices; j <- i until cols.size }
          yield s"${dsum2Sql(cols(i), cols(j))} AS p_${cols(i)}__${cols(j)}"
        val pairRows = for { i <- cols.indices; j <- (i + 1) until cols.size }
          yield {
            val (a, b) = (cols(i), cols(j))
            s"""SELECT '$a' AS col_x, '$b' AS col_y,
               |  round((p_${a}__$b - s_$a*s_$b/n) /
               |    sqrt((p_${a}__$a - s_$a*s_$a/n)*(p_${b}__$b - s_$b*s_$b/n)), 6)
               |  AS corr FROM t""".stripMargin
          }
        s"""WITH t AS (SELECT cast(count(*) AS double) AS n,
           |  ${(sums ++ prods).mkString(",\n  ")}
           |  FROM lineitem)
           |${pairRows.mkString("\nUNION ALL\n")}
           |ORDER BY col_x, col_y""".stripMargin
      })
  )

  // =====================================================================
  // §2.5 Statistics
  // =====================================================================

  private val statsQ: Seq[Q] = Seq(
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

  // =====================================================================
  // §2.6 Binning  +  §2.7 Missing data
  // =====================================================================

  /** Static custom breaks over l_quantity (1..50): labels are compile-time
    * constants shared by the Spark path and the oracle CASE expression.
    */
  private val qBreaks = Seq(1.0, 10.0, 25.0, 40.0, 50.0)

  /** Mirrors Binning.binLabelExpr's reference-exact interval semantics. */
  private def binOracleCase(c: String, breaks: Seq[Double],
                            includeLowest: Boolean, right: Boolean): String = {
    val n = breaks.length - 1
    val ls = Binning.labels(breaks, includeLowest, right)
    val whens = (0 until n).map { i =>
      val lo = breaks(i); val hi = breaks(i + 1)
      val cond =
        if (right) {
          val lower = if (i == 0 && includeLowest) s"$c >= $lo" else s"$c > $lo"
          s"$lower AND $c <= $hi"
        } else {
          val lower = if (includeLowest) s"$c >= $lo" else s"$c > $lo"
          s"$lower AND $c < $hi"
        }
      s"WHEN $cond THEN '${ls(i)}'"
    }
    s"CASE ${whens.mkString(" ")} END"
  }

  private val binningMissing: Seq[Q] = Seq(
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

  // =====================================================================
  // §2.11 Transforms + window extensions
  // =====================================================================

  private val transforms: Seq[Q] = Seq(
    Q("q60_transform_udf",
      (s, d) => {
        val m = mgr(s, d)
        // all factors are exact 2-decimal → 6-decimal exact product in
        // decimal arithmetic; double round() would tie-break differently
        // per engine
        Transforms.transformUDF(m.getDDFByName("lineitem"), "profit",
          """cast(cast(l_extendedprice as decimal(10,2))
            | * cast(1 - l_discount as decimal(4,2))
            | * cast(1 + l_tax as decimal(4,2)) as double)""".stripMargin)
          .df.select("l_orderkey", "l_linenumber", "profit")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  cast(cast(l_extendedprice AS decimal(10,2))
             |   * cast(1 - l_discount AS decimal(4,2))
             |   * cast(1 + l_tax AS decimal(4,2)) AS double) AS profit
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("q61_scale_minmax",
      (s, d) => {
        val m = mgr(s, d)
        val li = m.register(m.getDDFByName("lineitem").df
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"))
        Transforms.scaleMinMax(li, Seq("l_quantity", "l_extendedprice"))
          .df.select(col("l_orderkey"), col("l_linenumber"),
            round(col("l_quantity"), 6).as("qty_s"),
            round(col("l_extendedprice"), 6).as("price_s"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""WITH mm AS (SELECT cast(min(l_quantity) AS double) AS qmn,
             |  cast(max(l_quantity) AS double) AS qmx,
             |  cast(min(l_extendedprice) AS double) AS pmn,
             |  cast(max(l_extendedprice) AS double) AS pmx FROM lineitem)
             |SELECT l_orderkey, l_linenumber,
             |  round((l_quantity - qmn) / (qmx - qmn), 6) AS qty_s,
             |  round((l_extendedprice - pmn) / (pmx - pmn), 6) AS price_s
             |FROM lineitem, mm ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("q62_window_rank",
      (s, d) => {
        val m = mgr(s, d)
        m.sql2ddf(
          """select o_orderstatus, o_orderkey, o_totalprice, rk from (
            |  select o_orderstatus, o_orderkey, o_totalprice,
            |    row_number() over (partition by o_orderstatus
            |                       order by o_totalprice desc, o_orderkey) as rk
            |  from orders) where rk <= 3
            |order by o_orderstatus, rk""".stripMargin).df
      },
      Some("""SELECT o_orderstatus, o_orderkey, o_totalprice, rk FROM (
             |  SELECT o_orderstatus, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_orderstatus
             |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
             |  FROM orders) WHERE rk <= 3
             |ORDER BY o_orderstatus, rk""".stripMargin)),

    Q("q63_window_runsum",
      (s, d) => {
        val m = mgr(s, d)
        // running sum over exact decimals → deterministic in both engines
        m.sql2ddf(
          """select o_custkey, o_orderkey,
            |  cast(sum(cast(o_totalprice as decimal(18,2)))
            |    over (partition by o_custkey order by o_orderkey) as double) as run_total
            |from orders order by o_custkey, o_orderkey""".stripMargin).df
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  cast(sum(cast(o_totalprice AS decimal(18,2)))
             |    OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS double) AS run_total
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),

    Q("q64_events_hourly",
      (s, d) => {
        val m = mgr(s, d)
        m.getDDFByName("events").df
          .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .orderBy("hour_epoch", "event_type")
      },
      Some(s"""SELECT cast(epoch(date_trunc('hour', ts)) AS bigint) AS hour_epoch,
              |  event_type, count(*) AS n, ${dsumSql("value")} AS sum_value
              |FROM events GROUP BY 1, 2 ORDER BY hour_epoch, event_type""".stripMargin)),

    Q("ts01_resample_gapfill",
      (s, d) => {
        // fixed 6 h buckets per user, densified over each user's own
        // [min, max] span — gap buckets carry n=0 / null sum
        val ev = loadEvents(s, d).where(col("user_id") < 5)
        TimeSeries.resample(ev, "ts", Seq("user_id"), 21600L,
          Seq("sum_v" -> dsum(col("value"))))
          .orderBy("user_id", "bucket")
      },
      Some(s"""WITH pb AS (
              |  SELECT user_id, (to_timestamp(floor(epoch(ts) / 21600) * 21600))::TIMESTAMP AS bucket,
              |         count(*) AS n, ${dsumSql("value")} AS sum_v
              |  FROM events WHERE user_id < 5 GROUP BY 1, 2),
              |spine AS (
              |  SELECT user_id,
              |    unnest(generate_series(min(bucket), max(bucket),
              |                           INTERVAL '21600 seconds')) AS bucket
              |  FROM pb GROUP BY user_id)
              |SELECT s.user_id, s.bucket, coalesce(pb.n, 0) AS n, pb.sum_v
              |FROM spine s LEFT JOIN pb USING (user_id, bucket)
              |ORDER BY user_id, bucket""".stripMargin)),

    Q("ts02_interpolate",
      (s, d) => {
        // densify per-user 6 h max(value), then linear-interpolate the
        // gap buckets; edges clamp to the nearest observation
        val ev = loadEvents(s, d).where(col("user_id") < 5)
        val dense = TimeSeries.resample(ev, "ts", Seq("user_id"), 21600L,
          Seq("v" -> max(col("value"))))
        TimeSeries.interpolate(dense, "bucket", Seq("user_id"), "v", "v_i")
          .select("user_id", "bucket", "v_i")
          .orderBy("user_id", "bucket")
      },
      Some("""WITH pb AS (
             |  SELECT user_id, (to_timestamp(floor(epoch(ts) / 21600) * 21600))::TIMESTAMP AS bucket,
             |         max(value) AS v
             |  FROM events WHERE user_id < 5 GROUP BY 1, 2),
             |spine AS (
             |  SELECT user_id,
             |    unnest(generate_series(min(bucket), max(bucket),
             |                           INTERVAL '21600 seconds')) AS bucket
             |  FROM pb GROUP BY user_id),
             |dense AS (
             |  SELECT s.user_id, s.bucket, pb.v
             |  FROM spine s LEFT JOIN pb USING (user_id, bucket)),
             |i AS (
             |  SELECT user_id, bucket, v,
             |    last_value(v IGNORE NULLS) OVER w_back AS pv,
             |    last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
             |      OVER w_back AS pt,
             |    first_value(v IGNORE NULLS) OVER w_fwd AS nv,
             |    first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
             |      OVER w_fwd AS nt
             |  FROM dense WINDOW
             |    w_back AS (PARTITION BY user_id ORDER BY bucket
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |    w_fwd AS (PARTITION BY user_id ORDER BY bucket
             |              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |SELECT user_id, bucket,
             |  CASE WHEN v IS NOT NULL THEN v
             |       WHEN pv IS NULL THEN nv
             |       WHEN nv IS NULL THEN pv
             |       ELSE pv + (nv - pv) *
             |            ((epoch(bucket) - epoch(pt)) / (epoch(nt) - epoch(pt)))
             |  END AS v_i
             |FROM i ORDER BY user_id, bucket""".stripMargin)),

    Q("h01_scd2",
      (s, d) => {
        // per-user event_type validity intervals — point-in-time feature
        // history; tie on event_id gives the window a total order
        val ev = loadEvents(s, d).where(col("user_id") < 3)
        History.scd2(ev, Seq("user_id"), "ts", Seq("event_type"), Seq("event_id"))
          .orderBy("user_id", "valid_from")
      },
      Some("""WITH e AS (SELECT user_id, ts, event_type, event_id
             |  FROM events WHERE user_id < 3),
             |m AS (SELECT *, CASE WHEN event_type IS DISTINCT FROM
             |    lag(event_type) OVER w THEN 1 ELSE 0 END AS chg
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg FROM m),
             |g AS (SELECT user_id, seg, min(ts) AS valid_from,
             |    min(event_type) AS event_type
             |  FROM s GROUP BY user_id, seg)
             |SELECT user_id, event_type, valid_from,
             |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY seg)
             |    AS valid_to
             |FROM g ORDER BY user_id, valid_from""".stripMargin)),

    Q("h02_cdc_apply",
      (s, d) => {
        val m = mgr(s, d)
        // fold the order feed into customer state: latest order per
        // customer wins; status 'P' deletes; untouched customers keep
        // their base balance. One shuffle over base ∪ changes, no join.
        val base = m.getDDFByName("customer").df
          .select(col("c_custkey").as("k"), col("c_acctbal").as("v"))
        val changes = m.getDDFByName("orders").df
          .select(col("o_custkey").as("k"), col("o_totalprice").as("v"),
            col("o_orderdate").as("t"),
            when(col("o_orderstatus") === "P", "D").otherwise("U").as("op"),
            col("o_orderkey").as("seq"))
        History.cdcApply(base, changes, Seq("k"), Seq("v"), "t", "op", Seq("seq"))
          .orderBy("k")
      },
      Some("""WITH b AS (SELECT c_custkey AS k, c_acctbal AS v,
             |    NULL AS t, 'B' AS op, NULL AS seq FROM customer),
             |c AS (SELECT o_custkey AS k, o_totalprice AS v, o_orderdate AS t,
             |    CASE WHEN o_orderstatus = 'P' THEN 'D' ELSE 'U' END AS op,
             |    o_orderkey AS seq FROM orders),
             |u AS (SELECT * FROM b UNION ALL SELECT * FROM c),
             |r AS (SELECT *, row_number() OVER (PARTITION BY k
             |    ORDER BY t DESC NULLS LAST, seq DESC NULLS LAST) AS rn FROM u)
             |SELECT k, v FROM r WHERE rn = 1 AND op != 'D' ORDER BY k""".stripMargin)),

    Q("h03_asof_lookup",
      (s, d) => {
        // point-in-time feature: the event_type regime each user was in
        // 3 HOURS BEFORE each event — joins the scd2 interval table, so
        // no future leaks into the feature
        val ev = loadEvents(s, d).where(col("user_id") < 3)
        val hist = History.scd2(ev, Seq("user_id"), "ts",
          Seq("event_type"), Seq("event_id"))
        val facts = ev.select(col("user_id"), col("event_id"),
          (col("ts") - expr("INTERVAL 3 HOURS")).as("t3"))
        History.asOfLookup(facts, hist, Seq("user_id"), "t3")
          .select(col("user_id"), col("event_id"),
            col("event_type").as("regime_3h_ago"))
          .orderBy("user_id", "event_id")
      },
      Some("""WITH e AS (SELECT user_id, ts, event_type, event_id
             |  FROM events WHERE user_id < 3),
             |m AS (SELECT *, CASE WHEN event_type IS DISTINCT FROM
             |    lag(event_type) OVER w THEN 1 ELSE 0 END AS chg
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg FROM m),
             |g AS (SELECT user_id, seg, min(ts) AS valid_from,
             |    min(event_type) AS event_type
             |  FROM s GROUP BY user_id, seg),
             |h AS (SELECT user_id, event_type, valid_from,
             |    lead(valid_from) OVER (PARTITION BY user_id ORDER BY seg) AS valid_to
             |  FROM g),
             |f AS (SELECT user_id, event_id, ts - INTERVAL 3 HOUR AS t3 FROM e)
             |SELECT f.user_id, f.event_id, h.event_type AS regime_3h_ago
             |FROM f LEFT JOIN h ON f.user_id = h.user_id
             |  AND f.t3 >= h.valid_from
             |  AND (h.valid_to IS NULL OR f.t3 < h.valid_to)
             |ORDER BY f.user_id, f.event_id""".stripMargin)),

    Q("ts04_interval_merge",
      (s, d) => {
        // per-user activity coverage: each event claims [ts, ts+30 min);
        // intervalMerge unions them into disjoint activity spans (the
        // session-stitching / uptime primitive). Output in epoch millis
        // so the hash compare is timestamp-dialect-proof (e02's choice).
        // Exact-tie rows are interchangeable, so the window construction
        // is permutation-invariant — replayed verbatim in DuckDB.
        val ev = loadEvents(s, d)
          .select(col("user_id"), col("ts").as("s"),
            (col("ts") + expr("INTERVAL 30 MINUTES")).as("e"))
        TimeSeries.intervalMerge(ev, Seq("user_id"), "s", "e")
          .select(col("user_id"),
            unix_millis(col("start")).as("start_ms"),
            unix_millis(col("end")).as("end_ms"), col("n_merged"))
          .orderBy("user_id", "start_ms")
      },
      Some("""WITH iv AS (SELECT user_id, ts AS s,
             |    ts + INTERVAL 30 MINUTE AS e FROM events),
             |w AS (SELECT user_id, s, e,
             |    max(e) OVER (PARTITION BY user_id ORDER BY s, e
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
             |  FROM iv),
             |o AS (SELECT *, CASE WHEN pmax IS NULL OR s > pmax
             |    THEN 1 ELSE 0 END AS opened FROM w),
             |sp AS (SELECT *, sum(opened) OVER (PARTITION BY user_id
             |    ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span
             |  FROM o)
             |SELECT user_id, epoch_ms(min(s))::BIGINT AS start_ms,
             |  epoch_ms(max(e))::BIGINT AS end_ms, count(*)::BIGINT AS n_merged
             |FROM sp GROUP BY user_id, span
             |ORDER BY user_id, start_ms""".stripMargin)),

    Q("ts03_rolling_window",
      (s, d) => {
        // per-event trailing-6h features (RANGE frame over microsecond
        // event time, closed boundary) — one row per event, one Window
        val ev = loadEvents(s, d).where(col("user_id") < 3)
        TimeSeries.rollingAgg(ev, "ts", Seq("user_id"), 21600L,
          Seq("roll_sum" -> sum(col("value").cast("decimal(18,2)")),
            "roll_n" -> count(lit(1))))
          .select(col("user_id"), col("event_id"),
            col("roll_sum").cast("double").as("roll_sum"), col("roll_n"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
              |  cast(sum(cast(value as decimal(18,2))) OVER w as double) AS roll_sum,
              |  count(*) OVER w AS roll_n
              |FROM events WHERE user_id < 3
              |WINDOW w AS (PARTITION BY user_id ORDER BY ts
              |  RANGE BETWEEN INTERVAL '21600 seconds' PRECEDING AND CURRENT ROW)
              |ORDER BY user_id, event_id""".stripMargin))
  )

  // =====================================================================
  // Training-data pipeline extensions: dedup / similarity / text /
  // multimodal / streaming / ML (SURVEY §7.2 step 9)
  // =====================================================================

  /** DuckDB expression for whitespace tokens of lower(text) ('' removed) —
    * mirrors TextAnalysis.tokensExpr.
    */
  /** DuckDB replay of `TextAnalysis.bpeTrain`: `n` stacked argmax+rewrite
    * stages over the alphabetic word-frequency table. Inside list_reduce
    * the symbol list folds through a '|'-joined string (safe: the
    * ^[a-z]+$ filter leaves no '|' or LIKE metacharacters in symbols);
    * ties break (n DESC, l, r) exactly like the Spark argmax.
    */
  /** BPE gate corpus: documents.text enriched with the token classes the
    * alphabetic fast path silently drops — the doc's n_chars (digits), a
    * per-lang non-ASCII word (2-byte Latin accents and 3-byte CJK, so
    * multi-byte UTF-8 sequences enter the byte alphabet; capitalized, so
    * the byte path's case preservation is exercised), and a mixed
    * letters-hyphen-digits token (punctuation). Deterministic, column-
    * derived, and expressed identically in both engines.
    */
  private def bpeCorpus(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), concat_ws(" ",
      col("text"), col("n_chars").cast("string"),
      when(col("lang") === "en", lit("Café"))
        .when(col("lang") === "de", lit("Über"))
        .when(col("lang") === "zh", lit("数据"))
        .when(col("lang") === "fr", lit("naïve"))
        .otherwise(lit("año")),
      concat_ws("-", col("lang"), col("n_chars").cast("string"))).as("text"))

  /** DuckDB mirror of [[bpeCorpus]], as a `corpus` CTE body. */
  private val duckBpeCorpus: String =
    """corpus AS (SELECT doc_id,
      |  text || ' ' || n_chars || ' ' ||
      |  CASE lang WHEN 'en' THEN 'Café' WHEN 'de' THEN 'Über'
      |            WHEN 'zh' THEN '数据' WHEN 'fr' THEN 'naïve'
      |            ELSE 'año' END || ' ' || lang || '-' || n_chars AS text
      |  FROM documents)""".stripMargin

  /** DuckDB replay of the BPE trainer's `n` greedy stages. `byteLevel`
    * mirrors TextAnalysis.bpeTrain's switch: alphabetic mode filters
    * `^[a-z]+$` words and splits characters; byte-level mode takes every
    * token and splits `hex(w)` into 2-char pairs (DuckDB's hex() is the
    * word's UTF-8 bytes uppercase — identical to Spark's
    * hex(encode(w,'UTF-8'))). `src` is the corpus CTE/table to train on.
    */
  private def duckBpeStages(n: Int, src: String = "documents",
                            byteLevel: Boolean = false): String = {
    val (wFilter, s0Syms) =
      if (byteLevel) ("", "regexp_extract_all(hex(w), '..')")
      else ("WHERE regexp_matches(w, '^[a-z]+$')\n  ", "string_split(w, '')")
    val toks = if (byteLevel) duckToksRaw("text") else duckToks("text")
    val base =
      s"""w0 AS (
         |  SELECT w, count(*)::BIGINT AS freq FROM (
         |    SELECT unnest($toks) AS w FROM $src)
         |  ${wFilter}GROUP BY w),
         |s0 AS (SELECT $s0Syms AS syms, freq FROM w0)""".stripMargin
    val stageSql = (0 until n).map { k =>
      s"""p$k AS (SELECT l, r, sum(freq)::BIGINT AS n FROM (
         |  SELECT syms[i] AS l, syms[i+1] AS r, freq FROM (
         |    SELECT syms, freq, unnest(generate_series(1, len(syms)-1)) AS i FROM s$k))
         |  GROUP BY l, r),
         |b$k AS (SELECT l, r, n FROM p$k ORDER BY n DESC, l, r LIMIT 1),
         |s${k + 1} AS (SELECT string_split(list_reduce(syms, (acc, x) ->
         |    CASE WHEN x = b.r AND (acc = b.l OR acc LIKE '%|' || b.l)
         |      THEN CASE WHEN acc = b.l THEN b.l || b.r
         |           ELSE substr(acc, 1, length(acc) - length(b.l)) || b.l || b.r END
         |      ELSE acc || '|' || x END), '|') AS syms, freq
         |  FROM s$k CROSS JOIN b$k b)""".stripMargin
    }
    (base +: stageSql).mkString(",\n")
  }

  private def duckToks(t: String) =
    s"list_filter(string_split_regex(lower($t), '\\s+'), x -> x != '')"
  /** Case-preserving mirror of TextAnalysis.rawTokensExpr (the byte-level
    * BPE tokenizer path).
    */
  private def duckToksRaw(t: String) =
    s"list_filter(string_split_regex($t, '\\s+'), x -> x != '')"

  /** c06/c11 shared BM25 oracle stack: the 3-query VALUES table through
    * per-(query, doc) token-ordered score folds, ranked and cut at `k`
    * in `bmrank` (query_id, id, bm25, terms_hit, rk ≤ k). Leaves `qt`
    * (query_id, distinct token) visible for downstream retrievers.
    */
  private def duckBm25Ctes(k: Int): String =
    s"""q(query_id, qtext) AS (VALUES (1, 'spark join'),
       |    (2, 'window stream'), (3, 'hash filter scan')),
       |qt AS (SELECT query_id, unnest(list_distinct(${duckToks("qtext")})) AS token
       |  FROM q),
       |tok AS (SELECT doc_id, unnest(${duckToks("text")}) AS token FROM documents),
       |dl AS (SELECT doc_id, ${duckTokenCount("text")} AS dl FROM documents),
       |stats AS (SELECT count(*) AS n, (SELECT sum(dl) FROM dl)::DOUBLE / count(*) AS avgdl
       |  FROM documents),
       |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
       |  WHERE token IN (SELECT token FROM qt) GROUP BY 1, 2),
       |dfq AS (SELECT token, count(*) AS doc_freq FROM tf GROUP BY 1),
       |ts AS (SELECT qt.query_id, tf.doc_id, tf.token,
       |    ln(1.0 + (n::DOUBLE - doc_freq + 0.5) / (doc_freq + 0.5))
       |      * (tf * (1.2 + 1.0))
       |      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) AS sc
       |  FROM tf JOIN dfq USING (token) JOIN dl USING (doc_id)
       |  JOIN qt ON qt.token = tf.token, stats),
       |sc AS (SELECT query_id, doc_id AS id, count(*) AS terms_hit,
       |    list_reduce(list_prepend(0.0, list(sc ORDER BY token)),
       |      (acc, x) -> acc + x) AS bm25
       |  FROM ts GROUP BY 1, 2),
       |bmrank AS (SELECT * FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY bm25 DESC, id) AS rk FROM sc)
       |  WHERE rk <= $k)""".stripMargin

  /** t16/t19 shared oracle: byte-level BPE train stages + 6 nested
    * rewrite folds per word over the enriched corpus, doc_id < 30,
    * order-preserving string_agg.
    */
  private lazy val duckBpeEncodeSql: String = {
    val n = 6
    val enc = (0 until n).foldLeft("regexp_extract_all(hex(w), '..')") { (acc, k) =>
      s"""string_split(list_reduce($acc, (a$k, x$k) ->
         |    CASE WHEN x$k = b$k.r AND (a$k = b$k.l OR a$k LIKE '%|' || b$k.l)
         |      THEN CASE WHEN a$k = b$k.l THEN b$k.l || b$k.r
         |           ELSE substr(a$k, 1, length(a$k) - length(b$k.l)) || b$k.l || b$k.r END
         |      ELSE a$k || '|' || x$k END), '|')""".stripMargin
    }
    val crossb = (0 until n).map(k => s"CROSS JOIN b$k").mkString(" ")
    s"""WITH $duckBpeCorpus,
       |${duckBpeStages(n, "corpus", byteLevel = true)},
       |ew AS (SELECT doc_id, pos, toks[pos] AS w FROM (
       |  SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS pos
       |  FROM (SELECT doc_id, ${duckToksRaw("text")} AS toks FROM corpus
       |        WHERE doc_id < 30))),
       |pieces AS (SELECT doc_id, pos, array_to_string($enc, ' ') AS piece
       |  FROM ew $crossb)
       |SELECT doc_id AS id, string_agg(piece, ' ' ORDER BY pos) AS bpe_text
       |FROM pieces GROUP BY doc_id ORDER BY id""".stripMargin
  }
  /** a16's 16×64 ±1 JL matrix as a DuckDB list-of-lists literal —
    * generated from the SAME signMatrix arithmetic the Spark side uses,
    * so the oracle needs no hash functions, only the inlined values. */
  private lazy val a16MatrixSql: String =
    pipeline.Similarity.signMatrix(64, 16, 7L)
      .map(_.map(v => if (v > 0) "1" else "-1").mkString("[", ",", "]"))
      .mkString("[", ",", "]")

  /** DuckDB expression mirroring Dedup.normText. */
  private def duckNorm(t: String) =
    s"trim(regexp_replace(lower($t), '\\s+', ' ', 'g'))"
  /** DuckDB 3-gram shingles mirroring Dedup.shingleExpr(n=3). */
  private def duckShingles(t: String) = {
    val toks = s"list_filter(string_split(${duckNorm(t)}, ' '), x -> x != '')"
    s"""(CASE WHEN len($toks) < 3 THEN [array_to_string($toks, ' ')]
       | ELSE list_distinct(list_transform(range(1, len($toks) - 1),
       |        i -> array_to_string(($toks)[i:i+2], ' '))) END)""".stripMargin
  }
  /** DuckDB word n-gram multiset over a token-list fragment — mirrors
    * TextAnalysis.ngramsOf (duplicates kept, < n tokens → empty).
    * range(1, m) is end-exclusive; list slices are 1-based inclusive.
    */
  private def duckNgrams(tk: String, n: Int) =
    s"""(CASE WHEN len($tk) >= $n
       |  THEN list_transform(range(1, len($tk) - ${n - 2}),
       |         i -> array_to_string(($tk)[i:i+${n - 1}], ' '))
       |  ELSE [] END)""".stripMargin
  /** DuckDB mirror of TextAnalysis.langId: stopword score columns
    * (`s_de..s_fr`, to SELECT alongside other columns) and the argmax
    * CASE over them — shared by the t01 and t08 oracles so a langId
    * change cannot silently diverge one of them.
    */
  private def duckLangScores = {
    val langs = Seq("de", "en", "es", "fr")
    langs.map { l =>
      val set = pipeline.TextAnalysis.stopwords(l).map(w => s"'$w'").mkString("[", ",", "]")
      s"len(list_filter(${duckToks("text")}, t -> list_contains($set, t)))" +
        s" / greatest(len(${duckToks("text")}), 1)::DOUBLE AS s_$l"
    }.mkString(",\n  ")
  }
  private val duckLangCase =
    """CASE WHEN greatest(s_de, s_en, s_es, s_fr) < 0.02 THEN 'und'
      |     WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
      |     WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
      |     WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
      |     ELSE 'fr' END""".stripMargin
  /** DuckDB expressions mirroring TextAnalysis.tokenCountOf/qualityScoreOf
    * (shared by the t01 oracle and the end-to-end pipeline oracle).
    */
  private def duckTokenCount(t: String) =
    s"len(${duckToks(t)})::BIGINT"
  private def duckQuality(t: String) =
    s"""(0.4 * least(len(${duckToks(t)}) / 100.0, 1.0)
       |    + 0.3 * (CASE WHEN len(${duckToks(t)}) = 0 THEN 0.0
       |             ELSE len(list_distinct(${duckToks(t)}))
       |                  / len(${duckToks(t)})::DOUBLE END)
       |    + 0.3 * (1.0 - length(regexp_replace($t, '[^.,;:!?]', '', 'g'))
       |             / greatest(length($t), 1)::DOUBLE))""".stripMargin

  /** DuckDB CTE chain mirroring the portable MinHash-LSH pipeline over
    * source relation `src` (must expose doc_id + text): shingles,
    * fold31 per shingle, 32 affine minhashes, 8 string band signatures,
    * banded candidates, exact-Jaccard verify (UNROUNDED ratio `jr`).
    * Shared by the d07 oracle and the end-to-end pipeline oracle.
    */
  private def duckMinhashCtes(src: String) =
    s"""msh AS (SELECT doc_id, ${duckShingles("text")} AS sh FROM $src),
       |mex AS (SELECT doc_id, unnest(sh) AS s FROM msh),
       |mhh AS (SELECT doc_id,
       |  list_reduce(list_prepend(0::BIGINT,
       |      list_transform(regexp_split_to_array(s, ''), c -> coalesce(ascii(c), 0)::BIGINT)),
       |    (acc, x) -> (acc * 31 + x) % 1000000007) AS h
       |  FROM mex),
       |mmins AS (SELECT doc_id, i,
       |    min((h * (2*i + 1) + (i*1000003 + 12345) % 1000000007) % 1000000007) AS m
       |  FROM mhh, (SELECT unnest(range(32)) AS i) GROUP BY doc_id, i),
       |msig AS (SELECT doc_id, i // 4 AS band, string_agg(m::VARCHAR, ',' ORDER BY i) AS sig
       |  FROM mmins GROUP BY doc_id, i // 4),
       |mcand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |  FROM msig a JOIN msig b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
       |mpairs AS (SELECT id1, id2,
       |    len(list_intersect(s1.sh, s2.sh))::DOUBLE / len(list_distinct(s1.sh || s2.sh)) AS jr
       |  FROM mcand JOIN msh s1 ON s1.doc_id = id1 JOIN msh s2 ON s2.doc_id = id2)""".stripMargin

  /** DSIR importance-weight CTE stack (Dsir.importanceWeights replay),
    * shared by ds01/ds02/p05: documents with doc_id % 7 == 0 play the
    * target domain, 4096 hashed-ngram buckets, weights folded in bucket
    * order (the t10 float-determinism pattern). Ends at `full_w`
    * (doc_id, n_feats, weight-unrounded) over the raw split.
    */
  private def duckDsirW: String =
    s"""tokt AS (SELECT doc_id, ${duckToks("text")} AS t
       |  FROM documents WHERE doc_id % 7 = 0),
       |tokr AS (SELECT doc_id, ${duckToks("text")} AS t
       |  FROM documents WHERE doc_id % 7 <> 0),
       |tgtf AS (SELECT unnest(t) AS f FROM tokt
       |  UNION ALL
       |  SELECT unnest(list_transform(range(1, len(t)),
       |    i -> t[i] || ' ' || t[i+1])) AS f FROM tokt),
       |rawf AS (SELECT doc_id, unnest(t) AS f FROM tokr
       |  UNION ALL
       |  SELECT doc_id, unnest(list_transform(range(1, len(t)),
       |    i -> t[i] || ' ' || t[i+1])) AS f FROM tokr),
       |tgtb AS (SELECT list_reduce(list_prepend(0::BIGINT,
       |      list_transform(regexp_split_to_array(f, ''),
       |        c -> coalesce(ascii(c), 0)::BIGINT)),
       |      (acc, x) -> (acc * 31 + x) % 1000000007) % 4096 AS bucket,
       |    count(*)::BIGINT AS ct
       |  FROM tgtf GROUP BY 1),
       |rawb AS (SELECT doc_id, list_reduce(list_prepend(0::BIGINT,
       |      list_transform(regexp_split_to_array(f, ''),
       |        c -> coalesce(ascii(c), 0)::BIGINT)),
       |      (acc, x) -> (acc * 31 + x) % 1000000007) % 4096 AS bucket,
       |    count(*)::BIGINT AS tf
       |  FROM rawf GROUP BY 1, 2),
       |rcnt AS (SELECT bucket, sum(tf)::BIGINT AS cr FROM rawb GROUP BY 1),
       |tt AS (SELECT sum(ct)::BIGINT AS t FROM tgtb),
       |tr AS (SELECT sum(cr)::BIGINT AS t FROM rcnt),
       |ratio AS (SELECT rcnt.bucket,
       |    ln((coalesce(ct, 0) + 1.0) / (tt.t + 1.0 * 4096))
       |  - ln((cr + 1.0) / (tr.t + 1.0 * 4096)) AS lr
       |  FROM rcnt LEFT JOIN tgtb USING (bucket), tt, tr),
       |w AS (SELECT doc_id, sum(tf)::BIGINT AS n_feats,
       |    list_reduce(list_prepend(0.0, list(tf * lr ORDER BY bucket)),
       |      (acc, x) -> acc + x) AS weight
       |  FROM rawb JOIN ratio USING (bucket) GROUP BY doc_id),
       |full_w AS (SELECT d.doc_id, coalesce(n_feats, 0) AS n_feats,
       |    coalesce(weight, 0.0) AS weight
       |  FROM documents d LEFT JOIN w USING (doc_id)
       |  WHERE d.doc_id % 7 <> 0)""".stripMargin

  /** j04/j05/j06 corpus: pseudo-natural 20-char strings over a 16-letter
    * alphabet with a rich gram vocabulary (16⁴ at q=4) and no constant
    * region — the corpus shape the k ≥ 3 q-gram filter is FOR. Groups of
    * 4 sibling customer keys share an md5-derived base string (a crypto
    * hash: earlier algebraic recipes leaked period/shift/negation
    * structure that made cross-group pairs grow quadratically); sibling
    * r carries r planted substitutions at spread positions, so every
    * group yields its 6 true pairs at distances 0–3 and nothing else
    * collides.
    */
  private def editCorpus(customer: DataFrame): DataFrame =
    customer
      .select(col("c_custkey").cast("long").as("k"))
      .withColumn("g", expr("k div 4"))
      .withColumn("r", expr("k % 4"))
      .withColumn("s0", expr("translate(substring(md5(concat('b', " +
        "cast(g AS string))), 1, 20), '0123456789abcdef', 'abcdefghijklmnop')"))
      .withColumn("s1", expr("CASE WHEN r > 0 THEN concat(" +
        "substring(s0, 1, pmod(g*7, 20)), chr(97 + pmod(g, 16)), " +
        "substring(s0, pmod(g*7, 20) + 2, 100)) ELSE s0 END"))
      .withColumn("s2", expr("CASE WHEN r > 1 THEN concat(" +
        "substring(s1, 1, pmod(g*7 + 5, 20)), chr(97 + pmod(g + 5, 16)), " +
        "substring(s1, pmod(g*7 + 5, 20) + 2, 100)) ELSE s1 END"))
      .withColumn("s3", expr("CASE WHEN r > 2 THEN concat(" +
        "substring(s2, 1, pmod(g*7 + 10, 20)), chr(97 + pmod(g + 10, 16)), " +
        "substring(s2, pmod(g*7 + 10, 20) + 2, 100)) ELSE s2 END"))
      .select(col("k"), col("s3").as("name"))

  /** DuckDB mirror of [[editCorpus]] (CTEs c, b0–b3; result in b3.name).
    * NOTE: this fragment is embedded into oracles that stripMargin the
    * COMBINED string again, so no content line may start with `||` — a
    * second stripMargin would eat one pipe of the concat operator.
    */
  private val duckEditCorpus: String =
    """c AS (SELECT c_custkey::BIGINT AS k, c_custkey // 4 AS g,
      |    c_custkey % 4 AS r FROM customer),
      |b0 AS (SELECT k, g, r, translate(substr(md5('b' || g), 1, 20),
      |    '0123456789abcdef', 'abcdefghijklmnop') AS s0 FROM c),
      |b1 AS (SELECT k, g, r, CASE WHEN r > 0 THEN
      |    substr(s0, 1, (g*7) % 20) || chr((97 + g % 16)::INT) ||
      |    substr(s0, (g*7) % 20 + 2, 100) ELSE s0 END AS s1 FROM b0),
      |b2 AS (SELECT k, g, r, CASE WHEN r > 1 THEN
      |    substr(s1, 1, (g*7 + 5) % 20) || chr((97 + (g + 5) % 16)::INT) ||
      |    substr(s1, (g*7 + 5) % 20 + 2, 100) ELSE s1 END AS s2 FROM b1),
      |b3 AS (SELECT k, CASE WHEN r > 2 THEN
      |    substr(s2, 1, (g*7 + 10) % 20) || chr((97 + (g + 10) % 16)::INT) ||
      |    substr(s2, (g*7 + 10) % 20 + 2, 100) ELSE s2 END AS name FROM b2)"""
      .stripMargin

  /** Probe batch for the lookup joins (j05/j06): every 5th key's GROUP
    * BASE with one fresh substitution at a position disjoint from the
    * planted ones — each probe is near its source group's members and
    * nothing else.
    */
  private def editProbes(customer: DataFrame): DataFrame =
    customer
      .select(col("c_custkey").cast("long").as("k"))
      .filter(col("k") % 5 === 0)
      .withColumn("g", expr("k div 4"))
      .withColumn("s0", expr("translate(substring(md5(concat('b', " +
        "cast(g AS string))), 1, 20), '0123456789abcdef', 'abcdefghijklmnop')"))
      .withColumn("p", expr("concat(substring(s0, 1, pmod(g*3 + 7, 20)), " +
        "chr(97 + pmod(g + 3, 16)), substring(s0, pmod(g*3 + 7, 20) + 2, 100))"))
      .select(col("k").as("pk"), col("p").as("pname"))

  /** DuckDB mirror of [[editProbes]] (CTEs pq, p0; result in
    * probes.pname). Same no-leading-`||` rule as [[duckEditCorpus]].
    */
  private val duckEditProbes: String =
    """pq AS (SELECT c_custkey::BIGINT AS pk, c_custkey // 4 AS g
      |  FROM customer WHERE c_custkey % 5 = 0),
      |p0 AS (SELECT pk, g, translate(substr(md5('b' || g), 1, 20),
      |    '0123456789abcdef', 'abcdefghijklmnop') AS s0 FROM pq),
      |probes AS (SELECT pk, substr(s0, 1, (g*3 + 7) % 20) ||
      |    chr((97 + (g + 3) % 16)::INT) ||
      |    substr(s0, (g*3 + 7) % 20 + 2, 100) AS pname FROM p0)""".stripMargin

  private val duckCos =
    "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"

  /** Deterministic, oracle-able near-dup edge set shared by d06/d09: the
    * d05-style embedding cosine pairs (hash-exact vs DuckDB since r01) so
    * connected components gets a recursive-CTE oracle. The minhash-edges
    * variant stays covered by PipelineSpec.
    */
  private def embeddingPairs(m: DDFManager): DataFrame = {
    val vecs = m.getDDFByName("embeddings").df.filter(col("vec_id") < 200)
      .select(col("vec_id"), col("embedding").as("v"))
    val l = vecs.alias("l"); val r = vecs.alias("r")
    l.join(r, col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("id1"), col("r.vec_id").as("id2"),
        pipeline.Similarity.cosine(col("l.v"), col("r.v")).as("c"))
      .filter(col("c") >= 0.3)
      .select("id1", "id2")
  }

  /** DuckDB CTE chain mirroring [[embeddingPairs]] + dupClusters: ends in
    * `c(id, cluster_id)` — the min-reachable-label connected components.
    * Callers append their own SELECT (and must open WITH RECURSIVE).
    */
  private def duckClusterCtes =
    s"""dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
       |       FROM embeddings WHERE vec_id < 200),
       |p AS (SELECT a.vec_id AS id1, b.vec_id AS id2
       |      FROM dv a JOIN dv b ON a.vec_id < b.vec_id
       |      WHERE $duckCos >= 0.3),
       |e AS (SELECT id1 AS src, id2 AS dst FROM p
       |      UNION SELECT id2, id1 FROM p),
       |n AS (SELECT DISTINCT src AS id FROM e),
       |r AS (SELECT id, id AS lab FROM n
       |      UNION
       |      SELECT r.id, e.dst AS lab FROM r JOIN e ON e.src = r.lab),
       |c AS (SELECT id, min(lab) AS cluster_id FROM r GROUP BY id)""".stripMargin

  private val pipelineQ: Seq[Q] = Seq(
    Q("d01_dedup_exact",
      (s, d) => {
        val m = mgr(s, d)
        pipeline.Dedup.exact(m.getDDFByName("documents").df, "text", "doc_id")
          .orderBy("fingerprint")
      },
      Some(s"""SELECT md5(${duckNorm("text")}) AS fingerprint,
              |  min(doc_id) AS keep_id, count(*) AS n_dups
              |FROM documents GROUP BY 1 ORDER BY fingerprint""".stripMargin)),

    Q("d02_dedup_minhash",
      (s, d) => {
        val m = mgr(s, d)
        // candidate generation via banded MinHash (engine-specific hashes →
        // rows-only check); candidates verified with exact Jaccard
        pipeline.Dedup.minhashDedup(m.getDDFByName("documents").df, "text", "doc_id",
          threshold = 0.5)
          .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("id1", "id2")
      },
      None),

    Q("d07_minhash_portable",
      (s, d) => {
        val m = mgr(s, d)
        // Same MinHash-LSH pipeline as d02 instantiated with the portable
        // mod-prime shingle hash + string band signatures, so the WHOLE
        // pipeline (shingles → k affine minhashes → banding → candidate
        // join → exact-Jaccard verify) is replicated in DuckDB below.
        // d02 stays on xxhash64 — the codegen'd 100 TB path, benched.
        pipeline.Dedup.minhashDedup(m.getDDFByName("documents").df, "text", "doc_id",
          threshold = 0.5, portable = true)
          .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("id1", "id2")
      },
      // mirror: fold31 per shingle, h_i = ((2i+1)·H + (i·1000003+12345) mod p) mod p,
      // bands of 4 joined as "m0,m1,m2,m3", candidates share a band,
      // verify exact jaccard ≥ 0.5 on the UNROUNDED ratio (like Spark)
      Some(s"""WITH ${duckMinhashCtes("documents")}
              |SELECT id1, id2, round(jr, 6) AS jaccard FROM mpairs
              |WHERE jr >= 0.5 ORDER BY id1, id2""".stripMargin)),

    Q("d03_dedup_simhash",
      (s, d) => {
        val m = mgr(s, d)
        // Portable 60-bit fingerprint so the result is cross-engine
        // checkable. The pigeonhole banding (nChunks = maxHamming+1) has
        // EXACT recall, so the output is a pure function of the
        // fingerprints — the oracle can use a brute-force pairwise join
        // while we exercise the banded path.
        pipeline.Dedup.simhashDedup(m.getDDFByName("documents").df, "text", "doc_id",
          maxHamming = 12, tokenHash = pipeline.Dedup.portableHash60, nBits = 60)
          .select(col("id1"), col("id2"), col("hamming").cast("long").as("hamming"))
          .orderBy("id1", "id2")
      },
      // Same 60-bit simhash in DuckDB: two mod-prime char folds per token
      // (31/1e9+7 → bits 0–29, 131/998244353 → bits 30–59), ±1 bit votes,
      // sign → fingerprint, then brute-force hamming ≤ 12 over all pairs.
      Some(s"""WITH n AS (SELECT doc_id, ${duckNorm("text")} AS t FROM documents),
              |tok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS tk FROM n),
              |hh AS (SELECT doc_id,
              |  list_reduce(list_prepend(0::BIGINT,
              |      list_transform(regexp_split_to_array(tk, ''), c -> coalesce(ascii(c), 0)::BIGINT)),
              |    (acc, x) -> (acc * 31 + x) % 1000000007)
              |  + list_reduce(list_prepend(0::BIGINT,
              |      list_transform(regexp_split_to_array(tk, ''), c -> coalesce(ascii(c), 0)::BIGINT)),
              |    (acc, x) -> (acc * 131 + x) % 998244353) * 1073741824 AS h
              |  FROM tok),
              |bits AS (SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
              |  FROM hh, (SELECT unnest(range(60)) AS b) GROUP BY doc_id, b),
              |fp AS (SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS fp
              |  FROM bits GROUP BY doc_id)
              |SELECT a.doc_id AS id1, b.doc_id AS id2,
              |  bit_count(xor(a.fp, b.fp))::BIGINT AS hamming
              |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
              |WHERE bit_count(xor(a.fp, b.fp)) <= 12
              |ORDER BY id1, id2""".stripMargin)),

    Q("d14_jaccard_join",
      (s, d) => {
        val m = mgr(s, d)
        // EXACT threshold similarity self-join (prefix filter + verify):
        // the ground truth the MinHash banding (d02/d07) approximates
        pipeline.SetJoin.exactJaccardJoin(
            m.getDDFByName("documents").df.filter(col("doc_id") < 120),
            "text", "doc_id", threshold = 0.6)
          .orderBy("id_a", "id_b")
      },
      // brute-force replay over the same 120-doc subset: identical pair
      // set AND identical double jaccard (integer-valued double division)
      Some(s"""WITH dset AS (SELECT doc_id,
              |    list_distinct(${duckToks("text")}) AS s
              |  FROM documents WHERE doc_id < 120),
              |sized AS (SELECT doc_id, s, len(s) AS n FROM dset WHERE len(s) > 0),
              |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              |    len(list_filter(a.s, x -> list_contains(b.s, x)))::DOUBLE AS inter,
              |    a.n AS na, b.n AS nb
              |  FROM sized a JOIN sized b ON a.doc_id < b.doc_id)
              |SELECT id_a, id_b, inter / (na + nb - inter) AS jaccard
              |FROM p WHERE inter / (na + nb - inter) >= 0.6
              |ORDER BY id_a, id_b""".stripMargin)),

    Q("d15_minhash_recall_eval",
      (s, d) => {
        val m = mgr(s, d)
        // the banding-parameter evaluation loop (round 13): exact truth
        // (complete shared-shingle join + exact Jaccard) vs the portable
        // banding's candidates on an eval slice — recall tells you what
        // the (k=32, bands=8) collision curve actually surfaces at
        // threshold 0.5 on THIS corpus, precision what fraction of
        // candidates verify. The text twin of a07's ANN recall.
        pipeline.Dedup.minhashRecallEval(
          m.getDDFByName("documents").df.filter(col("doc_id") < 300),
          "text", "doc_id", threshold = 0.5, portable = true)
      },
      // d07's portable minhash CTE stack supplies the banding candidates
      // (mcand); truth is the complete shared-shingle join (any pair at
      // J ≥ 0.5 > 0 shares a shingle) + exact Jaccard. Integer counts,
      // one IEEE division each.
      Some(s"""WITH corpus AS (SELECT * FROM documents WHERE doc_id < 300),
              |${duckMinhashCtes("corpus")},
              |tcand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
              |  FROM mex a JOIN mex b ON a.s = b.s AND a.doc_id < b.doc_id),
              |truth AS (SELECT id1, id2 FROM (
              |    SELECT id1, id2, len(list_intersect(s1.sh, s2.sh))::DOUBLE
              |        / len(list_distinct(s1.sh || s2.sh)) AS jr
              |    FROM tcand JOIN msh s1 ON s1.doc_id = id1
              |    JOIN msh s2 ON s2.doc_id = id2)
              |  WHERE jr >= 0.5),
              |nd AS (SELECT count(*)::BIGINT AS n_docs FROM corpus),
              |nt AS (SELECT count(*)::BIGINT AS n_true FROM truth),
              |nc AS (SELECT count(*)::BIGINT AS n_cand FROM mcand),
              |nh AS (SELECT count(*)::BIGINT AS n_hit FROM truth t
              |  JOIN mcand c ON t.id1 = c.id1 AND t.id2 = c.id2)
              |SELECT n_docs, n_true, n_cand, n_hit,
              |  CASE WHEN n_true = 0 THEN 1.0
              |       ELSE n_hit::DOUBLE / n_true END AS recall,
              |  CASE WHEN n_cand = 0 THEN 1.0
              |       ELSE n_hit::DOUBLE / n_cand END AS "precision"
              |FROM nd, nt, nc, nh""".stripMargin)),

    Q("d04_jaccard_pairs",
      (s, d) => {
        val m = mgr(s, d)
        val docs = m.getDDFByName("documents").df
        val pairs = docs.filter(col("doc_id") < 29)
          .select(col("doc_id").as("id1"), (col("doc_id") + 1).as("id2"))
        pipeline.Dedup.jaccardOnPairs(pairs, docs, "text", "doc_id")
          .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("id1")
      },
      Some(s"""WITH sh AS (SELECT doc_id, ${duckShingles("text")} AS s FROM documents)
              |SELECT a.doc_id AS id1, b.doc_id AS id2,
              |  round(len(list_intersect(a.s, b.s))::DOUBLE
              |        / len(list_distinct(a.s || b.s)), 6) AS jaccard
              |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
              |WHERE a.doc_id < 29 ORDER BY id1""".stripMargin)),

    Q("d05_embedding_dedup",
      (s, d) => {
        val m = mgr(s, d)
        // native VectorCosine widens each float element to double inside
        // its loop — bit-identical to the oracle's list_transform(::DOUBLE)
        // with no interpreted per-row cast/allocation; brute-force is
        // restricted to a bounded id range — the full-scale path is
        // Dedup.embeddingDedup (LSH-bucketed)
        val vecs = m.getDDFByName("embeddings").df.filter(col("vec_id") < 200)
          .select(col("vec_id"), col("embedding").as("v"))
        val l = vecs.alias("l"); val r = vecs.alias("r")
        l.join(r, col("l.vec_id") < col("r.vec_id"))
          .select(col("l.vec_id").as("id1"), col("r.vec_id").as("id2"),
            pipeline.Similarity.cosine(col("l.v"), col("r.v")).as("c"))
          .filter(col("c") >= 0.3)
          .select(col("id1"), col("id2"), round(col("c"), 6).as("cosine"))
          .orderBy("id1", "id2")
      },
      Some(s"""WITH dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              |           FROM embeddings WHERE vec_id < 200)
              |SELECT a.vec_id AS id1, b.vec_id AS id2, round($duckCos, 6) AS cosine
              |FROM dv a JOIN dv b ON a.vec_id < b.vec_id
              |WHERE $duckCos >= 0.3 ORDER BY id1, id2""".stripMargin)),

    Q("a01_ann_brute",
      (s, d) => {
        val m = mgr(s, d)
        // raw float arrays: VectorCosine's loop widens losslessly, so the
        // result is bit-identical to the previous transform(cast) pre-pass
        // (removed — it was an interpreted per-row allocation)
        val all = m.getDDFByName("embeddings").df.select(col("vec_id"), col("embedding"))
        val queries = all.filter(col("vec_id") < 3)
          .withColumnRenamed("vec_id", "qid")
        pipeline.Similarity.bruteForceTopK(all, queries, "embedding", "vec_id", "qid", 10)
          .select(col("query_id"), col("id"), round(col("cosine"), 6).as("cosine"), col("rk"))
          .orderBy("query_id", "rk")
      },
      Some(s"""WITH dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              |            FROM embeddings),
              |scored AS (SELECT a.vec_id AS query_id, b.vec_id AS id, $duckCos AS c,
              |    row_number() OVER (PARTITION BY a.vec_id ORDER BY $duckCos DESC, b.vec_id) AS rk
              |  FROM (SELECT * FROM dv WHERE vec_id < 3) a CROSS JOIN dv b)
              |SELECT query_id, id, round(c, 6) AS cosine, rk FROM scored
              |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin)),

    Q("a02_ann_lsh",
      (s, d) => {
        val m = mgr(s, d)
        val all = m.getDDFByName("embeddings").df
        val queries = all.filter(col("vec_id") < 3).withColumnRenamed("vec_id", "qid")
        pipeline.Similarity.lshTopK(all, queries, "embedding", "vec_id", "qid", 10,
          planes = 8)
          .select(col("query_id"), col("id"), round(col("cosine"), 6).as("cosine"), col("rk"))
          .orderBy("query_id", "rk")
      },
      // The hyperplanes are seeded pseudo-randoms fixed at plan-build
      // time, so the SAME literals are inlined here (Double.toString
      // round-trips exactly; DuckDB's decimal→double cast preserves the
      // value) — bucketing, candidate join, scoring, and ranking are all
      // replicated. Embeddings fixture is 64-dim at every sf.
      Some {
        val hp = pipeline.Similarity.hyperplanes(dim = 64, planes = 8, seed = 7L)
        val bucketExpr = hp.zipWithIndex.map { case (p, i) =>
          val lits = p.map(_.toString).mkString("[", ", ", "]")
          s"(CASE WHEN list_dot_product(v, $lits::DOUBLE[]) >= 0 THEN ${1L << i} ELSE 0 END)"
        }.mkString(" + ")
        val cos = "list_dot_product(a.v, c.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v)))"
        s"""WITH dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           |            FROM embeddings),
           |bk AS (SELECT vec_id, v, $bucketExpr AS bucket FROM dv),
           |scored AS (SELECT a.vec_id AS query_id, c.vec_id AS id, $cos AS c,
           |    row_number() OVER (PARTITION BY a.vec_id ORDER BY $cos DESC, c.vec_id) AS rk
           |  FROM (SELECT * FROM bk WHERE vec_id < 3) a JOIN bk c ON a.bucket = c.bucket)
           |SELECT query_id, id, round(c, 6) AS cosine, rk FROM scored
           |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin
      }),

    Q("a09_ann_lsh_multiprobe",
      (s, d) => {
        val m = mgr(s, d)
        // the SERVING-LOOP form of a02: corpus bucketed once into an
        // index (buildLshIndex), queries probe their bucket PLUS every
        // Hamming-1 neighbor (multiProbe = 1) — the recall lever for
        // sign-LSH's boundary misses. Same seeded hyperplanes as a02, so
        // the oracle inlines identical literals and replays the probe
        // expansion with the same bit masks.
        val all = m.getDDFByName("embeddings").df
        val queries = all.filter(col("vec_id") < 3).withColumnRenamed("vec_id", "qid")
        val idx = pipeline.Similarity.buildLshIndex(all, "embedding", "vec_id",
          planes = 8)
        pipeline.Similarity.lshTopKIndexed(idx, queries, "embedding", "qid", 10,
          multiProbe = 1)
          .select(col("query_id"), col("id"), round(col("cosine"), 6).as("cosine"), col("rk"))
          .orderBy("query_id", "rk")
      },
      Some {
        val hp = pipeline.Similarity.hyperplanes(dim = 64, planes = 8, seed = 7L)
        val bucketExpr = hp.zipWithIndex.map { case (p, i) =>
          val lits = p.map(_.toString).mkString("[", ", ", "]")
          s"(CASE WHEN list_dot_product(v, $lits::DOUBLE[]) >= 0 THEN ${1L << i} ELSE 0 END)"
        }.mkString(" + ")
        val masks = pipeline.Similarity.probeMasks(planes = 8, multiProbe = 1)
          .mkString("[", ", ", "]")
        val cos = "list_dot_product(a.v, c.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v)))"
        s"""WITH dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           |            FROM embeddings),
           |bk AS (SELECT vec_id, v, $bucketExpr AS bucket FROM dv),
           |pr AS (SELECT q.vec_id AS query_id, q.v, xor(q.bucket, f.m) AS bucket
           |       FROM (SELECT * FROM bk WHERE vec_id < 3) q,
           |            (SELECT unnest($masks::BIGINT[]) AS m) f),
           |scored AS (SELECT a.query_id, c.vec_id AS id, $cos AS c,
           |    row_number() OVER (PARTITION BY a.query_id ORDER BY $cos DESC, c.vec_id) AS rk
           |  FROM pr a JOIN bk c ON a.bucket = c.bucket)
           |SELECT query_id, id, round(c, 6) AS cosine, rk FROM scored
           |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin
      }),

    Q("a07_ann_recall",
      (s, d) => {
        val m = mgr(s, d)
        // the ANN evaluation loop: recall@10 of the sign-LSH index
        // against the brute-force baseline, per query — the measurement
        // that justifies (or rejects) an approximate index's parameters
        // before it runs at corpus scale
        val all = m.getDDFByName("embeddings").df.select(col("vec_id"), col("embedding"))
        val queries = all.filter(col("vec_id") < 3).withColumnRenamed("vec_id", "qid")
        val exact = pipeline.Similarity.bruteForceTopK(all, queries, "embedding", "vec_id", "qid", 10)
        val approx = pipeline.Similarity.lshTopK(all, queries, "embedding", "vec_id", "qid", 10,
          planes = 8)
        pipeline.Similarity.annRecall(approx, exact, k = 10).orderBy("query_id")
      },
      // both pipelines' DuckDB twins (a01/a02) composed as CTEs, then the
      // same hits/denominator arithmetic — integer counts and ONE double
      // division, so the recall value is bit-identical across engines
      Some {
        val hp = pipeline.Similarity.hyperplanes(dim = 64, planes = 8, seed = 7L)
        val bucketExpr = hp.zipWithIndex.map { case (p, i) =>
          val lits = p.map(_.toString).mkString("[", ", ", "]")
          s"(CASE WHEN list_dot_product(v, $lits::DOUBLE[]) >= 0 THEN ${1L << i} ELSE 0 END)"
        }.mkString(" + ")
        val cosB = "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
        val cosL = "list_dot_product(a.v, c.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v)))"
        s"""WITH dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           |            FROM embeddings),
           |brute AS (SELECT query_id, id FROM (
           |    SELECT a.vec_id AS query_id, b.vec_id AS id,
           |      row_number() OVER (PARTITION BY a.vec_id ORDER BY $cosB DESC, b.vec_id) AS rk
           |    FROM (SELECT * FROM dv WHERE vec_id < 3) a CROSS JOIN dv b) WHERE rk <= 10),
           |bk AS (SELECT vec_id, v, $bucketExpr AS bucket FROM dv),
           |lsh AS (SELECT query_id, id FROM (
           |    SELECT a.vec_id AS query_id, c.vec_id AS id,
           |      row_number() OVER (PARTITION BY a.vec_id ORDER BY $cosL DESC, c.vec_id) AS rk
           |    FROM (SELECT * FROM bk WHERE vec_id < 3) a JOIN bk c ON a.bucket = c.bucket)
           |  WHERE rk <= 10),
           |hits AS (SELECT b.query_id, count(l.id) AS n_hits FROM brute b
           |    LEFT JOIN lsh l ON b.query_id = l.query_id AND b.id = l.id
           |  GROUP BY b.query_id),
           |den AS (SELECT query_id, count(*) AS n_truth FROM brute GROUP BY query_id)
           |SELECT d.query_id AS query_id, coalesce(h.n_hits, 0) AS n_hits,
           |  d.n_truth, coalesce(h.n_hits, 0)::DOUBLE / d.n_truth AS recall
           |FROM den d LEFT JOIN hits h ON d.query_id = h.query_id
           |ORDER BY d.query_id""".stripMargin
      }),

    Q("a08_matryoshka_ann",
      (s, d) => {
        val m = mgr(s, d)
        // matryoshka tiering: search at prefix dim 16 (4× cheaper dot
        // products, 4× smaller index). renormalize=false here because
        // cosine ranking is scale-invariant and raw slices are bit-exact
        // against DuckDB's list slicing; the renormalized path is
        // CurationSpec-pinned (unit norms, ranking preserved)
        val all = m.getDDFByName("embeddings").df.select(col("vec_id"), col("embedding"))
        val trunc = pipeline.Similarity.matryoshkaTruncate(
          all, "embedding", k = 16, renormalize = false)
        val queries = trunc.filter(col("vec_id") < 3).withColumnRenamed("vec_id", "qid")
        pipeline.Similarity.bruteForceTopK(trunc, queries, "embedding", "vec_id", "qid", 5)
          .select(col("query_id"), col("id"), round(col("cosine"), 6).as("cosine"), col("rk"))
          .orderBy("query_id", "rk")
      },
      Some(s"""WITH dv AS (SELECT vec_id,
              |    list_transform(embedding[1:16], x -> x::DOUBLE) AS v
              |  FROM embeddings),
              |scored AS (SELECT a.vec_id AS query_id, b.vec_id AS id, $duckCos AS c,
              |    row_number() OVER (PARTITION BY a.vec_id ORDER BY $duckCos DESC, b.vec_id) AS rk
              |  FROM (SELECT * FROM dv WHERE vec_id < 3) a CROSS JOIN dv b)
              |SELECT query_id, id, round(c, 6) AS cosine, rk FROM scored
              |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin)),

    Q("a03_ann_ivf",
      (s, d) => {
        val m = mgr(s, d)
        val all = m.getDDFByName("embeddings").df
        val queries = all.filter(col("vec_id") < 3).withColumnRenamed("vec_id", "qid")
        // Deterministic centroids (the first 16 corpus vectors) instead of
        // the k-means|| build: the k-means path's init is engine-specific
        // RNG (spec-checked for recall instead), while fixed centroids
        // make assign→probe→score exactly replicable by the oracle below.
        // 16×64 doubles — config-size driver collect, not data-scale.
        val centroids = all.filter(col("vec_id") < 16).orderBy("vec_id")
          .select("embedding").collect()
          .map(_.getSeq[Float](0).toArray.map(_.toDouble))
        val idx = pipeline.IvfIndex.buildFromCentroids(all, "embedding", "vec_id", centroids)
        pipeline.IvfIndex.topK(idx, queries, "embedding", "qid", k = 10, nprobe = 4)
          .select(col("query_id"), col("id"), round(col("cosine"), 6).as("cosine"), col("rk"))
          .orderBy("query_id", "rk")
      },
      // Mirror of the whole IVF pipeline: cell = argmax(dot − ‖c‖²/2)
      // (ties → HIGHER cell, as array_max/max_by break them), probe the 4
      // cells nearest by the SAME L2 score (ties → lower cell, as the
      // window orders), score only vectors in probed cells, rank
      // (cosine DESC, id). Probe-by-assignment-metric keeps the index
      // geometry consistent (review fix).
      Some {
        val cos = (a: String, b: String) =>
          s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"
        s"""WITH dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           |            FROM embeddings),
           |cents AS (SELECT vec_id AS cell, v AS cv FROM dv WHERE vec_id < 16),
           |assigned AS (SELECT id, v, cell FROM (
           |    SELECT d.vec_id AS id, d.v, c.cell,
           |      row_number() OVER (PARTITION BY d.vec_id ORDER BY
           |        list_dot_product(d.v, c.cv) - list_dot_product(c.cv, c.cv) / 2.0 DESC,
           |        c.cell DESC) AS rn
           |    FROM dv d CROSS JOIN cents c) WHERE rn = 1),
           |probes AS (SELECT query_id, qv, cell FROM (
           |    SELECT q.vec_id AS query_id, q.v AS qv, c.cell,
           |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
           |        list_dot_product(q.v, c.cv) - list_dot_product(c.cv, c.cv) / 2.0 DESC,
           |        c.cell) AS crk
           |    FROM (SELECT * FROM dv WHERE vec_id < 3) q CROSS JOIN cents c)
           |  WHERE crk <= 4),
           |scored AS (SELECT p.query_id, a.id, ${cos("p.qv", "a.v")} AS cs
           |  FROM probes p JOIN assigned a ON a.cell = p.cell)
           |SELECT query_id, id, round(cs, 6) AS cosine, rk FROM (
           |  SELECT *, row_number() OVER (PARTITION BY query_id
           |    ORDER BY cs DESC, id) AS rk FROM scored)
           |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin
      }),

    Q("a10_ivf_append",
      (s, d) => {
        val m = mgr(s, d)
        val all = m.getDDFByName("embeddings").df
        // corpus = 90% of vectors; batch = every 10th id, appended later
        val corpus = all.filter(col("vec_id") % 10 =!= 0)
        val batch = all.filter(col("vec_id") % 10 === 0)
        // deterministic frozen centroids: the 16 lowest corpus ids
        // (vec_id < 18, excluding the two multiples of 10)
        val centroids = all
          .filter(col("vec_id") < 18 && col("vec_id") % 10 =!= 0)
          .orderBy("vec_id").select("embedding").collect()
          .map(_.getSeq[Float](0).toArray.map(_.toDouble))
        val idx = pipeline.IvfIndex.buildFromCentroids(corpus, "embedding", "vec_id", centroids)
        val idx2 = pipeline.IvfIndex.append(idx, batch, "embedding", "vec_id")
        // batch rows' cells out of the APPENDED index — the append path's
        // assignment, not a rebuild's
        idx2.corpus.filter(col("id") % 10 === 0)
          .select("id", "cell").orderBy("id")
      },
      // replay: cell = argmax(dot − ‖c‖²/2), ties → HIGHER cell (array_max
      // struct order), centroids ranked by vec_id
      Some("""WITH dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
             |            FROM embeddings),
             |cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
             |          FROM dv WHERE vec_id < 18 AND vec_id % 10 != 0)
             |SELECT id, cell FROM (
             |  SELECT d.vec_id AS id, c.cell,
             |    row_number() OVER (PARTITION BY d.vec_id ORDER BY
             |      list_dot_product(d.v, c.cv) - list_dot_product(c.cv, c.cv) / 2.0 DESC,
             |      c.cell DESC) AS rn
             |  FROM (SELECT * FROM dv WHERE vec_id % 10 = 0) d CROSS JOIN cents c)
             |WHERE rn = 1 ORDER BY id""".stripMargin)),

    Q("a11_ivf_int8_rerank",
      (s, d) => {
        val m = mgr(s, d)
        val all = m.getDDFByName("embeddings").df
        // memory-tiered IVF: int8 sidecar scores the probed cells, the
        // float corpus is touched only for the per-query shortlist
        // (IvfIndex.topKQuantized scaladoc). Same deterministic frozen
        // centroids as a03; the oracle replays quantize → shortlist →
        // exact re-rank step for step.
        val centroids = all.filter(col("vec_id") < 16).orderBy("vec_id")
          .select("embedding").collect()
          .map(_.getSeq[Float](0).toArray.map(_.toDouble))
        val idx = pipeline.IvfIndex.buildFromCentroids(all, "embedding", "vec_id", centroids)
        val queries = all.filter(col("vec_id") < 3).withColumnRenamed("vec_id", "qid")
        pipeline.IvfIndex.topKQuantized(idx, queries, "embedding", "qid",
          k = 10, nprobe = 4, shortlist = 20)
          .select(col("query_id"), col("id"), round(col("cosine"), 6).as("cosine"), col("rk"))
          .orderBy("query_id", "rk")
      },
      // a03's assign/probe mirror + the int8 tier: per-vector scale =
      // max|x|/127, codes = floor(x/scale + 0.5) (the a04 portable
      // rounding), shortlist = top-20 by dequantized cosine (ties → id),
      // exact cosine re-rank of the shortlist to top-10
      Some("""WITH dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
             |            FROM embeddings),
             |cents AS (SELECT vec_id AS cell, v AS cv FROM dv WHERE vec_id < 16),
             |assigned AS (SELECT id, v, cell FROM (
             |    SELECT d.vec_id AS id, d.v, c.cell,
             |      row_number() OVER (PARTITION BY d.vec_id ORDER BY
             |        list_dot_product(d.v, c.cv) - list_dot_product(c.cv, c.cv) / 2.0 DESC,
             |        c.cell DESC) AS rn
             |    FROM dv d CROSS JOIN cents c) WHERE rn = 1),
             |q8 AS (SELECT id, cell,
             |    CASE WHEN scale = 0 THEN list_transform(v, x -> 0.0)
             |         ELSE list_transform(v, x -> floor(x / scale + 0.5)) END AS codes,
             |    scale FROM (SELECT id, cell, v,
             |      greatest(coalesce(list_max(list_transform(v, x -> abs(x))), 0.0), 0.0)
             |        / 127.0 AS scale FROM assigned)),
             |dq AS (SELECT id, cell, list_transform(codes, c -> c * scale) AS dv8 FROM q8),
             |probes AS (SELECT query_id, qv, cell FROM (
             |    SELECT q.vec_id AS query_id, q.v AS qv, c.cell,
             |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
             |        list_dot_product(q.v, c.cv) - list_dot_product(c.cv, c.cv) / 2.0 DESC,
             |        c.cell) AS crk
             |    FROM (SELECT * FROM dv WHERE vec_id < 3) q CROSS JOIN cents c)
             |  WHERE crk <= 4),
             |approx AS (SELECT p.query_id, d.id,
             |    list_dot_product(p.qv, d.dv8)
             |      / (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(d.dv8, d.dv8)))
             |      AS cos8
             |  FROM probes p JOIN dq d ON d.cell = p.cell),
             |short AS (SELECT query_id, id FROM (
             |    SELECT *, row_number() OVER (PARTITION BY query_id
             |      ORDER BY cos8 DESC, id) AS srk FROM approx) WHERE srk <= 20),
             |exact AS (SELECT s.query_id, s.id,
             |    list_dot_product(q.v, a.v)
             |      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(a.v, a.v))) AS cs
             |  FROM short s JOIN dv q ON q.vec_id = s.query_id
             |  JOIN assigned a ON a.id = s.id)
             |SELECT query_id, id, round(cs, 6) AS cosine, rk FROM (
             |  SELECT *, row_number() OVER (PARTITION BY query_id
             |    ORDER BY cs DESC, id) AS rk FROM exact)
             |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin)),

    Q("a12_diversity_sample",
      (s, d) => {
        val m = mgr(s, d)
        val all = m.getDDFByName("embeddings").df
        // cluster-balanced coverage sample: cap every IVF cell at 20
        // vectors picked by the portable hash rank of the id — the
        // diversity-preserving subsample (a uniform sample would mirror
        // cluster-size skew; the cap keeps embedding-space coverage).
        // Deterministic frozen centroids as in a03 so the oracle can
        // replay assignment; the per-cell cap is the q08 rank idiom.
        val centroids = all.filter(col("vec_id") < 16).orderBy("vec_id")
          .select("embedding").collect()
          .map(_.getSeq[Float](0).toArray.map(_.toDouble))
        val idx = pipeline.IvfIndex.buildFromCentroids(all, "embedding", "vec_id", centroids)
        pipeline.IvfIndex.diversitySample(idx, perCell = 20)
          .select(col("id"), col("cell"))
          .orderBy("cell", "id")
      },
      // a03's assignment mirror (argmax(dot − ‖c‖²/2), ties → HIGHER
      // cell), then q08's xor-fold rank capped at 20 per cell
      Some("""WITH dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
             |            FROM embeddings),
             |cents AS (SELECT vec_id AS cell, v AS cv FROM dv WHERE vec_id < 16),
             |assigned AS (SELECT id, cell FROM (
             |    SELECT d.vec_id AS id, c.cell,
             |      row_number() OVER (PARTITION BY d.vec_id ORDER BY
             |        list_dot_product(d.v, c.cv) - list_dot_product(c.cv, c.cv) / 2.0 DESC,
             |        c.cell DESC) AS rn
             |    FROM dv d CROSS JOIN cents c) WHERE rn = 1),
             |h AS (SELECT id, cell, (id % 1000000000) * 2654435761 AS p FROM assigned),
             |r AS (SELECT id, cell, row_number() OVER (PARTITION BY cell
             |      ORDER BY xor(p, p >> 31) % 1000000007, id) AS rn FROM h)
             |SELECT id, cell FROM r WHERE rn <= 20 ORDER BY cell, id""".stripMargin)),

    Q("a13_knn_classify",
      (s, d) => {
        val m = mgr(s, d)
        // leave-one-out kNN majority vote over the embedding index — the
        // auto-labeling / embedding-sanity primitive: each query's own
        // row is excluded BEFORE ranking, the ≤5 neighbors vote, ties
        // break to the smallest label (deterministic, no float tie)
        val all = m.getDDFByName("embeddings").df
        val queries = all.filter(col("vec_id") < 30).withColumnRenamed("vec_id", "qid")
        val nn = pipeline.Similarity.bruteForceTopK(all, queries, "embedding",
          "vec_id", "qid", k = 5, excludeSelf = true)
        pipeline.Similarity.knnClassify(nn, all.select("vec_id", "label"),
            "vec_id", "label", k = 5)
          .orderBy("query_id")
      },
      Some(s"""WITH dv AS (SELECT vec_id, label,
              |    list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
              |nn AS (SELECT query_id, id FROM (
              |    SELECT a.vec_id AS query_id, b.vec_id AS id,
              |      row_number() OVER (PARTITION BY a.vec_id
              |        ORDER BY $duckCos DESC, b.vec_id) AS rk
              |    FROM (SELECT * FROM dv WHERE vec_id < 30) a
              |    JOIN dv b ON a.vec_id != b.vec_id) WHERE rk <= 5),
              |v AS (SELECT n.query_id, d.label, count(*) AS nv
              |  FROM nn n JOIN dv d ON d.vec_id = n.id GROUP BY 1, 2),
              |r AS (SELECT query_id, label, nv, row_number() OVER (
              |    PARTITION BY query_id ORDER BY nv DESC, label) AS rn FROM v)
              |SELECT query_id, label AS pred_label, nv AS n_votes FROM r
              |WHERE rn = 1 ORDER BY query_id""".stripMargin)),

    Q("a14_centroid_outliers",
      (s, d) => {
        val m = mgr(s, d)
        // noisy/mislabeled-example detection: the 5 vectors farthest
        // (cosine) from their OWN label's centroid. exact=true folds each
        // centroid dimension in vec_id order (bit-identical to the
        // oracle's ordered list_reduce); the default associative sum is
        // the corpus-scale twin, spec-checked instead.
        pipeline.Similarity.centroidOutliers(m.getDDFByName("embeddings").df,
            "embedding", "vec_id", "label", k = 5, exact = true)
          .select(col("label"), col("vec_id"),
            round(col("dist"), 6).as("dist"), col("rk"))
          .orderBy("label", "rk")
      },
      Some("""WITH dv AS (SELECT vec_id, label,
             |    list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
             |ex AS (SELECT vec_id, label, i AS dim, v[i] AS val
             |  FROM dv, unnest(range(1, len(v) + 1)) AS t(i)),
             |cent AS (SELECT label, dim,
             |    list_reduce(list_prepend(0.0, list(val ORDER BY vec_id)),
             |      (acc, x) -> acc + x) / count(*) AS c
             |  FROM ex GROUP BY 1, 2),
             |cl AS (SELECT label, list(c ORDER BY dim) AS cv FROM cent GROUP BY 1),
             |sc AS (SELECT dv.vec_id, dv.label,
             |    1 - list_dot_product(dv.v, cl.cv)
             |        / (sqrt(list_dot_product(dv.v, dv.v))
             |           * sqrt(list_dot_product(cl.cv, cl.cv))) AS dist
             |  FROM dv JOIN cl USING (label))
             |SELECT label, vec_id, round(dist, 6) AS dist, rk FROM (
             |  SELECT *, row_number() OVER (PARTITION BY label
             |    ORDER BY dist DESC, vec_id) AS rk FROM sc)
             |WHERE rk <= 5 ORDER BY label, rk""".stripMargin)),

    Q("a15_hard_negatives",
      (s, d) => {
        val m = mgr(s, d)
        // contrastive hard negatives: per query, the 8 nearest vectors
        // whose LABEL DIFFERS — label filter applied before ranking so
        // every slot is a true negative
        val all = m.getDDFByName("embeddings").df
          .select(col("vec_id"), col("embedding"), col("label"))
        val queries = all.filter(col("vec_id") < 5)
          .withColumnRenamed("vec_id", "qid")
        pipeline.Similarity.hardNegatives(all, queries, "embedding",
            "vec_id", "qid", "label", k = 8)
          .select(col("query_id"), col("id"),
            round(col("cosine"), 6).as("cosine"), col("rk"))
          .orderBy("query_id", "rk")
      },
      Some(s"""WITH dv AS (SELECT vec_id, label,
              |    list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
              |scored AS (SELECT a.vec_id AS query_id, b.vec_id AS id, $duckCos AS c,
              |    row_number() OVER (PARTITION BY a.vec_id
              |      ORDER BY $duckCos DESC, b.vec_id) AS rk
              |  FROM (SELECT * FROM dv WHERE vec_id < 5) a
              |  JOIN dv b ON a.label != b.label)
              |SELECT query_id, id, round(c, 6) AS cosine, rk FROM scored
              |WHERE rk <= 8 ORDER BY query_id, rk""".stripMargin)),

    Q("a16_random_projection",
      (s, d) => {
        val m = mgr(s, d)
        // JL sign projection 64→16: one codegen'd MatrixProject pass; the
        // ±1 matrix is reproduced in the oracle as inlined literals from
        // the same SplitMix64 arithmetic. Both engines fold i ascending.
        val emb = m.getDDFByName("embeddings").df.filter(col("vec_id") < 50)
        pipeline.Similarity.randomProject(emb, "embedding", "proj",
            outDim = 16, seed = 7L)
          .select(col("vec_id"), posexplode(col("proj")).as(Seq("j", "val")))
          .select(col("vec_id"), col("j"), round(col("val"), 6).as("val"))
          .orderBy("vec_id", "j")
      },
      Some(s"""WITH mt AS (SELECT $a16MatrixSql::DOUBLE[][] AS mat),
              |m AS (SELECT j - 1 AS j, mat[j] AS mrow
              |  FROM mt, unnest(range(1, 17)) AS t(j)),
              |dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              |  FROM embeddings WHERE vec_id < 50)
              |SELECT vec_id, j, round(0.25 * list_dot_product(v, mrow), 6) AS val
              |FROM dv CROSS JOIN m ORDER BY vec_id, j""".stripMargin)),

    Q("a17_projected_recall",
      (s, d) => {
        val m = mgr(s, d)
        // the JL projection's eval loop: recall@10 of brute-force top-k
        // in PROJECTED (16-dim) space vs the full-dim exact baseline —
        // the measurement that justifies (or rejects) a projection dim
        // before the cheap space becomes the index key at corpus scale.
        // On THIS corpus recall is ~0.1-0.2 BY CONSTRUCTION: the synthetic
        // embeddings are isotropic noise (near-orthogonal, no low-dim
        // structure), the provable worst case for any 4× reduction —
        // which is exactly what the eval loop exists to catch before an
        // index is built on the projected key. Real embedding manifolds
        // (low intrinsic dim) are the case the projection serves.
        val all = m.getDDFByName("embeddings").df
          .select(col("vec_id"), col("embedding"))
        val queries = all.filter(col("vec_id") < 5)
          .withColumnRenamed("vec_id", "qid")
        val exact = pipeline.Similarity.bruteForceTopK(
          all, queries, "embedding", "vec_id", "qid", 10)
        val pc = pipeline.Similarity.randomProject(all, "embedding",
          "proj", outDim = 16, seed = 7L).select(col("vec_id"), col("proj"))
        val pq = pipeline.Similarity.randomProject(queries, "embedding",
          "proj", outDim = 16, seed = 7L).select(col("qid"), col("proj"))
        val approx = pipeline.Similarity.bruteForceTopK(
          pc, pq, "proj", "vec_id", "qid", 10)
        pipeline.Similarity.annRecall(approx, exact, k = 10)
          .orderBy("query_id")
      },
      Some {
        val cosB = "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
        val cosP = "list_dot_product(a.p, b.p) / (sqrt(list_dot_product(a.p, a.p)) * sqrt(list_dot_product(b.p, b.p)))"
        s"""WITH mt AS (SELECT $a16MatrixSql::DOUBLE[][] AS mat),
           |m AS (SELECT j, mat[j] AS mrow FROM mt, unnest(range(1, 17)) AS t(j)),
           |dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           |       FROM embeddings),
           |brute AS (SELECT query_id, id FROM (
           |    SELECT a.vec_id AS query_id, b.vec_id AS id,
           |      row_number() OVER (PARTITION BY a.vec_id
           |        ORDER BY $cosB DESC, b.vec_id) AS rk
           |    FROM (SELECT * FROM dv WHERE vec_id < 5) a CROSS JOIN dv b)
           |  WHERE rk <= 10),
           |pv AS (SELECT dv.vec_id,
           |    list(0.25 * list_dot_product(dv.v, m.mrow) ORDER BY m.j) AS p
           |  FROM dv CROSS JOIN m GROUP BY dv.vec_id),
           |pb AS (SELECT query_id, id FROM (
           |    SELECT a.vec_id AS query_id, b.vec_id AS id,
           |      row_number() OVER (PARTITION BY a.vec_id
           |        ORDER BY $cosP DESC, b.vec_id) AS rk
           |    FROM (SELECT * FROM pv WHERE vec_id < 5) a CROSS JOIN pv b)
           |  WHERE rk <= 10),
           |hits AS (SELECT b.query_id, count(l.id) AS n_hits FROM brute b
           |    LEFT JOIN pb l ON b.query_id = l.query_id AND b.id = l.id
           |  GROUP BY b.query_id),
           |den AS (SELECT query_id, count(*) AS n_truth FROM brute GROUP BY query_id)
           |SELECT d.query_id AS query_id, coalesce(h.n_hits, 0) AS n_hits,
           |  d.n_truth, coalesce(h.n_hits, 0)::DOUBLE / d.n_truth AS recall
           |FROM den d LEFT JOIN hits h ON d.query_id = h.query_id
           |ORDER BY d.query_id""".stripMargin
      }),

    Q("a18_ivf_save_load",
      (s, d) => {
        val m = mgr(s, d)
        // durability round trip (r15): the a03 search, but the index is
        // SAVED (manifest-verified parquet: centroids + cell-partitioned
        // corpus + int8 sidecar + raw float tier) and LOADED back before
        // searching. The oracle is a03's search math untouched — storage
        // must be invisible to results, which is exactly the
        // search-after-load ≡ search-before-save contract.
        val all = m.getDDFByName("embeddings").df
        val queries = all.filter(col("vec_id") < 3).withColumnRenamed("vec_id", "qid")
        val centroids = all.filter(col("vec_id") < 16).orderBy("vec_id")
          .select("embedding").collect()
          .map(_.getSeq[Float](0).toArray.map(_.toDouble))
        val idx = pipeline.IvfIndex.buildFromCentroids(all, "embedding", "vec_id", centroids)
        withScratch("graft_a18") { tmp =>
          pipeline.IvfIndex.save(idx, s"$tmp/ivf")
          val loaded = pipeline.IvfIndex.load(s, s"$tmp/ivf", verify = true)
          collectAndClean(s,
            pipeline.IvfIndex.topK(loaded, queries, "embedding", "qid",
                k = 10, nprobe = 4)
              .select(col("query_id"), col("id"),
                round(col("cosine"), 6).as("cosine"), col("rk"))
              .orderBy("query_id", "rk"), tmp)
        }
      },
      // identical to a03's oracle: persistence must not change one bit
      Some {
        val cos = (a: String, b: String) =>
          s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"
        s"""WITH dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           |            FROM embeddings),
           |cents AS (SELECT vec_id AS cell, v AS cv FROM dv WHERE vec_id < 16),
           |assigned AS (SELECT id, v, cell FROM (
           |    SELECT d.vec_id AS id, d.v, c.cell,
           |      row_number() OVER (PARTITION BY d.vec_id ORDER BY
           |        list_dot_product(d.v, c.cv) - list_dot_product(c.cv, c.cv) / 2.0 DESC,
           |        c.cell DESC) AS rn
           |    FROM dv d CROSS JOIN cents c) WHERE rn = 1),
           |probes AS (SELECT query_id, qv, cell FROM (
           |    SELECT q.vec_id AS query_id, q.v AS qv, c.cell,
           |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
           |        list_dot_product(q.v, c.cv) - list_dot_product(c.cv, c.cv) / 2.0 DESC,
           |        c.cell) AS crk
           |    FROM (SELECT * FROM dv WHERE vec_id < 3) q CROSS JOIN cents c)
           |  WHERE crk <= 4),
           |scored AS (SELECT p.query_id, a.id, ${cos("p.qv", "a.v")} AS cs
           |  FROM probes p JOIN assigned a ON a.cell = p.cell)
           |SELECT query_id, id, round(cs, 6) AS cosine, rk FROM (
           |  SELECT *, row_number() OVER (PARTITION BY query_id
           |    ORDER BY cs DESC, id) AS rk FROM scored)
           |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin
      }),

    Q("a19_projected_recall_clustered",
      (s, d) => {
        val m = mgr(s, d)
        // a17's PASSING twin (r15): same eval loop, but the corpus is
        // given genuine low intrinsic dimension (signal confined to the
        // first 4 coordinates — the structure real embedding manifolds
        // have) before the 64→16 JL projection. a17 demonstrates the
        // gate REJECTING a projection (isotropic noise, recall ~0.15);
        // this demonstrates it passing — together they show the eval
        // measures the corpus, not the harness.
        val all = m.getDDFByName("embeddings").df
          .select(col("vec_id"),
            transform(col("embedding"),
              (x, i) => when(i < 4, x).otherwise(lit(0.0f))).as("embedding"))
        val queries = all.filter(col("vec_id") < 5)
          .withColumnRenamed("vec_id", "qid")
        val exact = pipeline.Similarity.bruteForceTopK(
          all, queries, "embedding", "vec_id", "qid", 10)
        val pc = pipeline.Similarity.randomProject(all, "embedding",
          "proj", outDim = 16, seed = 7L).select(col("vec_id"), col("proj"))
        val pq = pipeline.Similarity.randomProject(queries, "embedding",
          "proj", outDim = 16, seed = 7L).select(col("qid"), col("proj"))
        val approx = pipeline.Similarity.bruteForceTopK(
          pc, pq, "proj", "vec_id", "qid", 10)
        pipeline.Similarity.annRecall(approx, exact, k = 10)
          .orderBy("query_id")
      },
      Some {
        val cosB = "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
        val cosP = "list_dot_product(a.p, b.p) / (sqrt(list_dot_product(a.p, a.p)) * sqrt(list_dot_product(b.p, b.p)))"
        s"""WITH mt AS (SELECT $a16MatrixSql::DOUBLE[][] AS mat),
           |m AS (SELECT j, mat[j] AS mrow FROM mt, unnest(range(1, 17)) AS t(j)),
           |dv AS (SELECT vec_id, list_transform(embedding,
           |         (x, i) -> CASE WHEN i <= 4 THEN x::DOUBLE ELSE 0.0 END) AS v
           |       FROM embeddings),
           |brute AS (SELECT query_id, id FROM (
           |    SELECT a.vec_id AS query_id, b.vec_id AS id,
           |      row_number() OVER (PARTITION BY a.vec_id
           |        ORDER BY $cosB DESC, b.vec_id) AS rk
           |    FROM (SELECT * FROM dv WHERE vec_id < 5) a CROSS JOIN dv b)
           |  WHERE rk <= 10),
           |pv AS (SELECT dv.vec_id,
           |    list(0.25 * list_dot_product(dv.v, m.mrow) ORDER BY m.j) AS p
           |  FROM dv CROSS JOIN m GROUP BY dv.vec_id),
           |pb AS (SELECT query_id, id FROM (
           |    SELECT a.vec_id AS query_id, b.vec_id AS id,
           |      row_number() OVER (PARTITION BY a.vec_id
           |        ORDER BY $cosP DESC, b.vec_id) AS rk
           |    FROM (SELECT * FROM pv WHERE vec_id < 5) a CROSS JOIN pv b)
           |  WHERE rk <= 10),
           |hits AS (SELECT b.query_id, count(l.id) AS n_hits FROM brute b
           |    LEFT JOIN pb l ON b.query_id = l.query_id AND b.id = l.id
           |  GROUP BY b.query_id),
           |den AS (SELECT query_id, count(*) AS n_truth FROM brute GROUP BY query_id)
           |SELECT d.query_id AS query_id, coalesce(h.n_hits, 0) AS n_hits,
           |  d.n_truth, coalesce(h.n_hits, 0)::DOUBLE / d.n_truth AS recall
           |FROM den d LEFT JOIN hits h ON d.query_id = h.query_id
           |ORDER BY d.query_id""".stripMargin
      }),

    Q("d17_source_overlap",
      (s, d) => {
        val m = mgr(s, d)
        // source-admission analysis: a synthetic aggregator source
        // ("crawl_dup", every 4th doc re-tagged) overlaps each real
        // source — the matrix reports containment/jaccard per direction.
        // The synthetic corpus has no natural cross-source dups (verified
        // at sf0.01), so the aggregator is the deterministic fixture.
        val docs = m.getDDFByName("documents").df
        val aug = docs.select(col("source"), col("text"))
          .unionByName(docs.filter(col("doc_id") % 4 === 0)
            .select(lit("crawl_dup").as("source"), col("text")))
        pipeline.Dedup.sourceOverlap(aug, "text", "source")
          .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
            col("n_shared"), round(col("containment"), 6).as("containment"),
            round(col("jaccard"), 6).as("jaccard"))
          .orderBy("source_a", "source_b")
      },
      Some(s"""WITH aug AS (SELECT source, text FROM documents
              |    UNION ALL
              |    SELECT 'crawl_dup' AS source, text FROM documents
              |    WHERE doc_id % 4 = 0),
              |sk AS (SELECT DISTINCT source, md5(${duckNorm("text")}) AS k FROM aug),
              |t AS (SELECT source, count(*) AS n FROM sk GROUP BY 1),
              |p AS (SELECT a.source AS source_a, b.source AS source_b,
              |    count(*) AS n_shared
              |  FROM sk a JOIN sk b ON a.k = b.k AND a.source != b.source
              |  GROUP BY 1, 2)
              |SELECT source_a, source_b, t1.n::BIGINT AS n_a, t2.n::BIGINT AS n_b,
              |  n_shared::BIGINT AS n_shared,
              |  round(n_shared::DOUBLE / t1.n, 6) AS containment,
              |  round(n_shared::DOUBLE / (t1.n + t2.n - n_shared), 6) AS jaccard
              |FROM p JOIN t t1 ON t1.source = p.source_a
              |JOIN t t2 ON t2.source = p.source_b
              |ORDER BY source_a, source_b""".stripMargin)),

    Q("d16_soft_dedup_weights",
      (s, d) => {
        val m = mgr(s, d)
        // downweight-instead-of-remove dedup: every doc keeps a row, a
        // dup cluster's members share one document's worth of weight —
        // the trainer (or a later weighted sample) consumes the column
        val docs = m.getDDFByName("embeddings").df
          .filter(col("vec_id") < 200).select("vec_id")
        pipeline.Dedup.softDedupWeights(docs, embeddingPairs(m), "vec_id")
          .select(col("vec_id"), round(col("weight"), 6).as("weight"))
          .orderBy("vec_id")
      },
      Some(s"""WITH RECURSIVE
              |$duckClusterCtes,
              |cs AS (SELECT cluster_id, count(*) AS n FROM c GROUP BY cluster_id),
              |w AS (SELECT c.id, 1.0::DOUBLE / cs.n AS weight
              |      FROM c JOIN cs USING (cluster_id))
              |SELECT e.vec_id, round(coalesce(w.weight, 1.0::DOUBLE), 6) AS weight
              |FROM (SELECT vec_id FROM embeddings WHERE vec_id < 200) e
              |LEFT JOIN w ON w.id = e.vec_id
              |ORDER BY e.vec_id""".stripMargin)),

    Q("d06_dup_clusters",
      (s, d) => {
        val m = mgr(s, d)
        pipeline.Dedup.dupClusters(embeddingPairs(m))
          .groupBy("cluster_id").agg(count(lit(1)).as("csize"))
          .orderBy("cluster_id")
      },
      Some(s"""WITH RECURSIVE
              |$duckClusterCtes
              |SELECT cluster_id, count(*) AS csize FROM c
              |GROUP BY cluster_id ORDER BY cluster_id""".stripMargin)),

    Q("d09_cluster_reps",
      (s, d) => {
        val m = mgr(s, d)
        // quality-aware survivor choice: keep the max-L2-norm member of
        // each near-dup cluster (norm² via the codegen'd dot product on
        // the raw array<double> column — same left-to-right double
        // summation as DuckDB's list_dot_product, so the ranking key is
        // bit-identical; d05 proves the raw column needs no cast)
        val scores = m.getDDFByName("embeddings").df.filter(col("vec_id") < 200)
          .select(col("vec_id"),
            graft.functions.VectorFunctions.dot(
              col("embedding"), col("embedding")).as("norm2"))
        pipeline.Dedup.clusterRepresentativesBy(
            pipeline.Dedup.dupClusters(embeddingPairs(m)), scores, "vec_id", "norm2")
          .orderBy("cluster_id")
      },
      Some(s"""WITH RECURSIVE
              |$duckClusterCtes,
              |sc AS (SELECT vec_id AS id, list_dot_product(v, v) AS norm2 FROM dv),
              |rr AS (SELECT c.cluster_id, c.id,
              |    row_number() OVER (PARTITION BY c.cluster_id
              |      ORDER BY sc.norm2 DESC, c.id DESC) AS rn
              |  FROM c JOIN sc ON sc.id = c.id)
              |SELECT cluster_id, id AS keep_id FROM rr WHERE rn = 1
              |ORDER BY cluster_id""".stripMargin)),

    Q("t01_text_enrich",
      (s, d) => {
        val m = mgr(s, d)
        pipeline.TextAnalysis.enrich(m.getDDFByName("documents").df, "text")
          .select(col("doc_id"), col("token_count"), col("subword_count"),
            col("lang_pred"), round(col("quality"), 6).as("quality"), col("fingerprint"))
          .orderBy("doc_id")
      },
      Some(
        s"""WITH sc AS (SELECT doc_id, text, $duckLangScores FROM documents)
           |SELECT doc_id,
           |  ${duckTokenCount("text")} AS token_count,
           |  coalesce(list_sum(list_transform(${duckToks("text")},
           |    t -> greatest(1, ceil(length(t) / 6.0)::BIGINT))), 0)::BIGINT AS subword_count,
           |  $duckLangCase AS lang_pred,
           |  round(${duckQuality("text")}, 6) AS quality,
           |  md5(${duckNorm("text")}) AS fingerprint
           |FROM sc ORDER BY doc_id""".stripMargin)),

    Q("t08_balanced_lang_sample",
      (s, d) => {
        val m = mgr(s, d)
        // composition: language-ID the corpus, then a deterministic
        // exact-n sample per language — the "balance the mixture" step
        val tagged = m.getDDFByName("documents").df
          .select(col("doc_id"), pipeline.TextAnalysis.langId("text").as("lang_pred"))
        Views.stratifiedSample(m.register(tagged), "lang_pred", 25, "doc_id")
          .df.orderBy("lang_pred", "doc_id")
      },
      Some(
        s"""WITH sc AS (SELECT doc_id, $duckLangScores FROM documents),
           |lang AS (SELECT doc_id, $duckLangCase AS lang_pred FROM sc),
           |h AS (SELECT doc_id, lang_pred,
           |    (doc_id % 1000000000) * 2654435761 AS p FROM lang),
           |r AS (SELECT doc_id, lang_pred,
           |    row_number() OVER (PARTITION BY lang_pred
           |      ORDER BY xor(p, p >> 31) % 1000000007, doc_id) AS rn FROM h)
           |SELECT doc_id, lang_pred FROM r WHERE rn <= 25
           |ORDER BY lang_pred, doc_id""".stripMargin)),

    Q("t02_rolling_hash",
      (s, d) => {
        val m = mgr(s, d)
        m.getDDFByName("documents").df
          .select(col("doc_id"), pipeline.TextAnalysis.rollingHash("text").as("rhash"))
          .orderBy("doc_id")
      },
      // same char fold in DuckDB: list_reduce with a prepended 0 seed;
      // % == pmod here because every operand is non-negative
      Some(s"""WITH n AS (SELECT doc_id, ${duckNorm("text")} AS t FROM documents)
              |SELECT doc_id,
              |  list_reduce(
              |    list_prepend(0::BIGINT, list_transform(regexp_split_to_array(t, ''),
              |      c -> coalesce(ascii(c), 0)::BIGINT)),
              |    (acc, x) -> (acc * 31 + x) % 1000000007) AS rhash
              |FROM n ORDER BY doc_id""".stripMargin)),

    Q("d08_incremental_dedup",
      (s, d) => {
        val m = mgr(s, d)
        val docs = m.getDDFByName("documents").df
        // ingest shape: first half of the corpus is the existing index,
        // second half arrives as the new batch
        val index = pipeline.Dedup.exact(docs.filter(col("doc_id") % 2 === 0),
          "text", "doc_id").select("fingerprint")
        pipeline.Dedup.incrementalExact(docs.filter(col("doc_id") % 2 === 1),
            index, "text", "doc_id")
          .orderBy("fingerprint")
      },
      Some(s"""WITH fp AS (SELECT doc_id, md5(${duckNorm("text")}) AS fingerprint
              |  FROM documents),
              |idx AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 2 = 0),
              |batch AS (SELECT fingerprint, min(doc_id) AS keep_id FROM fp
              |  WHERE doc_id % 2 = 1 GROUP BY 1)
              |SELECT fingerprint, keep_id FROM batch
              |WHERE fingerprint NOT IN (SELECT fingerprint FROM idx)
              |ORDER BY fingerprint""".stripMargin)),

    Q("t03_repetition",
      (s, d) => {
        val m = mgr(s, d)
        pipeline.TextAnalysis.repetitionMetrics(
            m.getDDFByName("documents").df, "text", "doc_id")
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      // all fractions are small-int ratios — identical IEEE division on
      // both engines, no rounding needed. top-bigram count via
      // unnest+groupBy mirrors the explode+partial-agg shape.
      Some(s"""WITH toks AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
              |ng AS (SELECT doc_id,
              |  ${duckNgrams("tk", 2)} AS bgs,
              |  ${duckNgrams("tk", 3)} AS tgs FROM toks),
              |bgex AS (SELECT doc_id, unnest(bgs) AS b FROM ng),
              |cnt AS (SELECT doc_id, b, count(*) AS c FROM bgex GROUP BY 1, 2),
              |mx AS (SELECT doc_id, max(c) AS m FROM cnt GROUP BY 1)
              |SELECT t.doc_id, len(tk)::BIGINT AS token_count,
              |  CASE WHEN len(tk) = 0 THEN 0.0
              |       ELSE 1.0 - len(list_distinct(tk)) / len(tk)::DOUBLE END AS dup_word_frac,
              |  CASE WHEN len(bgs) = 0 THEN 0.0
              |       ELSE coalesce(m, 0) / len(bgs)::DOUBLE END AS top_bigram_frac,
              |  CASE WHEN len(tgs) = 0 THEN 0.0
              |       ELSE 1.0 - len(list_distinct(tgs)) / len(tgs)::DOUBLE END AS dup_trigram_frac
              |FROM toks t JOIN ng USING (doc_id) LEFT JOIN mx USING (doc_id)
              |ORDER BY doc_id""".stripMargin)),

    Q("t04_decontaminate",
      (s, d) => {
        val m = mgr(s, d)
        val docs = m.getDDFByName("documents").df
        // benchmark/eval corpus stand-in: every 37th document; 5-gram
        // overlap flags its planted near-duplicates in the corpus
        val bench = docs.filter(col("doc_id") % 37 === 0)
        pipeline.TextAnalysis.decontaminate(
            docs.filter(col("doc_id") % 37 =!= 0), bench, "text", "doc_id", n = 5)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      // oracle joins raw shingle STRINGS (the engine joins their 64-bit
      // hashes — identical counts absent a collision in this data)
      Some(s"""WITH toks AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
              |sh AS (SELECT doc_id, ${duckNgrams("tk", 5)} AS shs FROM toks),
              |ex AS (SELECT DISTINCT doc_id, unnest(shs) AS s FROM sh),
              |bench AS (SELECT DISTINCT s FROM ex WHERE doc_id % 37 = 0),
              |hits AS (SELECT e.doc_id, count(*) AS n FROM ex e JOIN bench USING (s)
              |  WHERE e.doc_id % 37 != 0 GROUP BY 1)
              |SELECT t.doc_id, coalesce(n, 0)::BIGINT AS overlap_shingles,
              |  coalesce(n, 0) > 0 AS contaminated
              |FROM toks t LEFT JOIN hits USING (doc_id)
              |WHERE t.doc_id % 37 != 0 ORDER BY doc_id""".stripMargin)),

    Q("t17_contamination_matrix",
      (s, d) => {
        // multi-suite decontamination in ONE corpus pass: the held-out
        // docs (doc_id % 37 == 0) split into three benchmark suites by
        // doc_id % 3; the matrix gives per-(doc, suite) distinct-shingle
        // overlap. Engine joins 64-bit shingle hashes; the oracle joins
        // the raw shingle strings (t04's identical-absent-collision
        // argument).
        val m = mgr(s, d)
        val docs = m.getDDFByName("documents").df
        val benches = docs.filter(col("doc_id") % 37 === 0)
          .select(concat(lit("b"), (col("doc_id") % 3).cast("string")).as("bench_id"),
            col("text"))
        pipeline.TextAnalysis.contaminationMatrix(
            docs.filter(col("doc_id") % 37 =!= 0), benches,
            "text", "doc_id", "bench_id", n = 3)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id", "bench_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
              |sh AS (SELECT doc_id, ${duckNgrams("tk", 3)} AS shs FROM toks),
              |ex AS (SELECT DISTINCT doc_id, unnest(shs) AS s FROM sh),
              |bench AS (SELECT DISTINCT 'b' || (doc_id % 3) AS bench_id, s
              |  FROM ex WHERE doc_id % 37 = 0)
              |SELECT e.doc_id, b.bench_id, count(*)::BIGINT AS overlap_shingles
              |FROM ex e JOIN bench b USING (s) WHERE e.doc_id % 37 <> 0
              |GROUP BY 1, 2 ORDER BY doc_id, bench_id""".stripMargin)),

    Q("t18_contamination_report",
      (s, d) => {
        // the publish-gate rollup of t17: per-suite contaminated-doc and
        // overlap totals, zero rows for clean suites — config-sized
        val m = mgr(s, d)
        val docs = m.getDDFByName("documents").df
        val benches = docs.filter(col("doc_id") % 37 === 0)
          .select(concat(lit("b"), (col("doc_id") % 3).cast("string")).as("bench_id"),
            col("text"))
        pipeline.TextAnalysis.contaminationReport(
            docs.filter(col("doc_id") % 37 =!= 0), benches,
            "text", "doc_id", "bench_id", n = 3)
          .orderBy("bench_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
              |sh AS (SELECT doc_id, ${duckNgrams("tk", 3)} AS shs FROM toks),
              |ex AS (SELECT DISTINCT doc_id, unnest(shs) AS s FROM sh),
              |bench AS (SELECT DISTINCT 'b' || (doc_id % 3) AS bench_id, s
              |  FROM ex WHERE doc_id % 37 = 0),
              |m AS (SELECT e.doc_id, b.bench_id, count(*) AS o
              |  FROM ex e JOIN bench b USING (s) WHERE e.doc_id % 37 <> 0
              |  GROUP BY 1, 2),
              |r AS (SELECT bench_id, count(DISTINCT doc_id)::BIGINT AS contaminated_docs,
              |    sum(o)::BIGINT AS total_overlap_shingles
              |  FROM m GROUP BY 1),
              |ids AS (SELECT DISTINCT 'b' || (doc_id % 3) AS bench_id
              |  FROM documents WHERE doc_id % 37 = 0)
              |SELECT ids.bench_id,
              |  coalesce(contaminated_docs, 0) AS contaminated_docs,
              |  coalesce(total_overlap_shingles, 0) AS total_overlap_shingles
              |FROM ids LEFT JOIN r USING (bench_id)
              |ORDER BY bench_id""".stripMargin)),

    Q("t05_redact_pii",
      (s, d) => {
        val m = mgr(s, d)
        // synthesize PII-bearing text from customer fields — one planted
        // instance per redaction class (r16 adds IBAN, payment card,
        // IPv6 to the original phone/email/IPv4), then redact all six
        val phone = concat(
          lpad((col("c_nationkey") + 10).cast("string"), 2, "0"), lit("-"),
          lpad(pmod(col("c_custkey"), lit(1000)).cast("string"), 3, "0"), lit("-"),
          lpad(pmod(col("c_custkey") * 7, lit(1000)).cast("string"), 3, "0"), lit("-"),
          lpad(pmod(col("c_custkey") * 13, lit(10000)).cast("string"), 4, "0"))
        val iban = concat(lit("GB"),
          lpad((col("c_nationkey") + 10).cast("string"), 2, "0"),
          lit("NWBK6016"),
          lpad(pmod(col("c_custkey"), lit(100000000)).cast("string"), 8, "0"))
        val card = concat(lit("4"),
          lpad(pmod(col("c_custkey"), lit(1000)).cast("string"), 3, "0"), lit(" "),
          lpad(pmod(col("c_custkey") * 3, lit(10000)).cast("string"), 4, "0"), lit(" "),
          lpad(pmod(col("c_custkey") * 7, lit(10000)).cast("string"), 4, "0"), lit(" "),
          lpad(pmod(col("c_custkey") * 11, lit(10000)).cast("string"), 4, "0"))
        val txt = concat(lit("contact "), col("c_name"), lit(" at "), phone,
          lit(" or mail "),
          lower(regexp_replace(col("c_name"), "[^A-Za-z0-9]", ".")),
          lit("@example.com from host 10.1."),
          pmod(col("c_custkey"), lit(200)).cast("string"), lit(".7"),
          lit("; iban "), iban, lit(" card "), card,
          lit(" via fe80::"), pmod(col("c_custkey"), lit(997)).cast("string"))
        m.getDDFByName("customer").df
          .select(col("c_custkey"), pipeline.TextAnalysis.redactPII(txt).as("redacted"))
          .orderBy("c_custkey")
      },
      Some("""WITH t AS (SELECT c_custkey,
             |  'contact ' || c_name || ' at '
             |    || lpad((c_nationkey + 10)::VARCHAR, 2, '0') || '-'
             |    || lpad((c_custkey % 1000)::VARCHAR, 3, '0') || '-'
             |    || lpad((c_custkey * 7 % 1000)::VARCHAR, 3, '0') || '-'
             |    || lpad((c_custkey * 13 % 10000)::VARCHAR, 4, '0') || ' or mail '
             |    || lower(regexp_replace(c_name, '[^A-Za-z0-9]', '.', 'g'))
             |    || '@example.com from host 10.1.'
             |    || (c_custkey % 200)::VARCHAR || '.7'
             |    || '; iban GB' || lpad((c_nationkey + 10)::VARCHAR, 2, '0')
             |    || 'NWBK6016' || lpad((c_custkey % 100000000)::VARCHAR, 8, '0')
             |    || ' card 4' || lpad((c_custkey % 1000)::VARCHAR, 3, '0') || ' '
             |    || lpad((c_custkey * 3 % 10000)::VARCHAR, 4, '0') || ' '
             |    || lpad((c_custkey * 7 % 10000)::VARCHAR, 4, '0') || ' '
             |    || lpad((c_custkey * 11 % 10000)::VARCHAR, 4, '0')
             |    || ' via fe80::' || (c_custkey % 997)::VARCHAR AS txt
             |  FROM customer)
             |SELECT c_custkey, regexp_replace(regexp_replace(regexp_replace(
             |  regexp_replace(regexp_replace(regexp_replace(txt,
             |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |  '\b[A-Z]{2}[0-9]{2}( ?[A-Z0-9]{4}){2,7}( ?[A-Z0-9]{1,3})?\b',
             |    '<IBAN>', 'g'),
             |  '\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{1,4}\b', '<CARD>', 'g'),
             |  '\d{2,3}[-. ]\d{3}[-. ]\d{3,4}[-. ]\d{4}', '<PHONE>', 'g'),
             |  '(?i)(\b([0-9a-f]{1,4}:){7}[0-9a-f]{1,4}\b|\b[0-9a-f]{1,4}(:[0-9a-f]{1,4})*::([0-9a-f]{1,4}(:[0-9a-f]{1,4})*\b)?|::[0-9a-f]{1,4}(:[0-9a-f]{1,4})*\b)',
             |    '<IPV6>', 'g'),
             |  '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS redacted
             |FROM t ORDER BY c_custkey""".stripMargin)),

    Q("t06_vocabulary",
      (s, d) => {
        val m = mgr(s, d)
        pipeline.TextAnalysis.vocabulary(
            m.getDDFByName("documents").df, "text", "doc_id", minDocFreq = 5)
          .orderBy("token")
      },
      Some(s"""WITH ex AS (SELECT doc_id, unnest(${duckToks("text")}) AS token
              |  FROM documents),
              |g AS (SELECT token, doc_id, count(*) AS c FROM ex GROUP BY 1, 2)
              |SELECT token, count(*)::BIGINT AS doc_freq,
              |  sum(c)::BIGINT AS term_count
              |FROM g GROUP BY token HAVING count(*) >= 5
              |ORDER BY token""".stripMargin)),

    Q("t22_ngram_novelty",
      (s, d) => {
        val m = mgr(s, d)
        // corpus-order novelty: share of each doc's distinct 3-gram
        // shingles first seen in THAT doc (min doc_id over the corpus).
        // Portable string shingles so the oracle joins the same keys;
        // the default hashShingles=true path is the 64-bit scale twin
        // (same identical-absent-collision trade as t04/t17).
        pipeline.TextAnalysis.ngramNovelty(
          m.getDDFByName("documents").df, "text", "doc_id",
          hashShingles = false)
          .orderBy("doc_id")
      },
      Some(s"""WITH docs AS (SELECT doc_id, text FROM documents
              |  WHERE text IS NOT NULL AND doc_id IS NOT NULL),
              |posts AS (SELECT doc_id, unnest(${duckShingles("text")}) AS sh FROM docs),
              |tot AS (SELECT doc_id, count(*) AS n_shingles FROM posts GROUP BY doc_id),
              |fst AS (SELECT sh, min(doc_id) AS doc_id FROM posts GROUP BY sh),
              |nov AS (SELECT doc_id, count(*) AS novel_shingles FROM fst GROUP BY doc_id)
              |SELECT t.doc_id, t.n_shingles,
              |  coalesce(n.novel_shingles, 0)::BIGINT AS novel_shingles,
              |  coalesce(n.novel_shingles, 0) / t.n_shingles::DOUBLE AS novelty
              |FROM tot t LEFT JOIN nov n ON n.doc_id = t.doc_id
              |ORDER BY t.doc_id""".stripMargin)),

    Q("t23_ngram_novelty_fast",
      (s, d) => {
        val m = mgr(s, d)
        // the benched 100 TB path: 8-byte xxhash64 shingle keys through
        // the postings shuffle (t22's d02-style rows-only twin — the
        // result is identical absent a 64-bit collision, which the t22
        // oracle pins on this corpus)
        pipeline.TextAnalysis.ngramNovelty(
          m.getDDFByName("documents").df, "text", "doc_id",
          hashShingles = true)
          .orderBy("doc_id")
      },
      None),

    Q("t26_distinct_ngrams",
      (s, d) => {
        val m = mgr(s, d)
        // per-source diversity: distinct-1/2/3 over the source slices.
        // Counts are exact via the two-level aggregate; the ratio is one
        // IEEE division of identical ints — unrounded, bit-exact
        pipeline.TextAnalysis.distinctNgrams(
            m.getDDFByName("documents").df, "text", "source", Seq(1, 2, 3))
          .orderBy("source", "n")
      },
      Some(s"""WITH tok AS (SELECT source, ${duckToks("text")} AS tk
              |  FROM documents WHERE text IS NOT NULL),
              |g1 AS (SELECT source, unnest(tk) AS gram FROM tok),
              |g2 AS (SELECT source, unnest(list_transform(range(1, len(tk)),
              |    i -> tk[i] || ' ' || tk[i+1])) AS gram FROM tok),
              |g3 AS (SELECT source, unnest(list_transform(range(1, len(tk) - 1),
              |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS gram FROM tok),
              |a1 AS (SELECT source, gram, count(*) AS c FROM g1 GROUP BY 1, 2),
              |a2 AS (SELECT source, gram, count(*) AS c FROM g2 GROUP BY 1, 2),
              |a3 AS (SELECT source, gram, count(*) AS c FROM g3 GROUP BY 1, 2),
              |u AS (
              |  SELECT source, 1 AS n, sum(c)::BIGINT AS total_ngrams,
              |    count(*)::BIGINT AS distinct_ngrams FROM a1 GROUP BY source
              |  UNION ALL
              |  SELECT source, 2 AS n, sum(c)::BIGINT, count(*)::BIGINT
              |    FROM a2 GROUP BY source
              |  UNION ALL
              |  SELECT source, 3 AS n, sum(c)::BIGINT, count(*)::BIGINT
              |    FROM a3 GROUP BY source)
              |SELECT source, n, total_ngrams, distinct_ngrams,
              |  distinct_ngrams::DOUBLE / total_ngrams::DOUBLE AS distinct_ratio
              |FROM u ORDER BY source, n""".stripMargin)),

    Q("t14_token_ids",
      (s, d) => {
        val m = mgr(s, d)
        // vocabulary → frequency-ranked ids → per-doc id sequences; the
        // rank's (term_count desc, token) tiebreak is a total order, so
        // the oracle's row_number reproduces it exactly. token_ids is
        // emitted as a comma string — oracle outputs are scalar-typed
        val docs = m.getDDFByName("documents").df
        val ranked = pipeline.TextAnalysis.rankVocabulary(
          pipeline.TextAnalysis.vocabulary(docs, "text", "doc_id", minDocFreq = 5))
        pipeline.TextAnalysis.encodeTokens(docs, "text", "doc_id", ranked)
          .select(col("id").as("doc_id"), col("n_tokens"),
            concat_ws(",", col("token_ids")).as("token_ids"))
          .orderBy("doc_id")
      },
      Some(s"""WITH dt AS (SELECT doc_id, ${duckToks("text")} AS toks FROM documents),
              |v0 AS (SELECT doc_id, unnest(toks) AS token FROM dt),
              |g AS (SELECT token, doc_id, count(*) AS c FROM v0 GROUP BY 1, 2),
              |v AS (SELECT token, sum(c) AS term_count FROM g GROUP BY token
              |      HAVING count(*) >= 5),
              |r AS (SELECT token,
              |    cast(row_number() OVER (ORDER BY term_count DESC, token) - 1 AS int) AS tid
              |  FROM v),
              |ex AS (SELECT doc_id, i AS pos, toks[i] AS token
              |  FROM dt, unnest(range(1, len(toks) + 1)) AS u(i)),
              |j AS (SELECT doc_id, pos, coalesce(r.tid, -1) AS tid
              |  FROM ex LEFT JOIN r USING (token))
              |SELECT doc_id, count(*)::BIGINT AS n_tokens,
              |  string_agg(tid::varchar, ',' ORDER BY pos) AS token_ids
              |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("t15_bpe_train",
      (s, d) => {
        val m = mgr(s, d)
        // real BPE trainer, BYTE-LEVEL (round 11): 6 greedy merges over a
        // corpus enriched with digits, punctuation, and non-ASCII text —
        // exactly what the alphabetic fast path silently drops. Symbols
        // are UTF-8 bytes as hex pairs; minFreq=1 mirrors the oracle's
        // unconditional 6 stages. Alphabetic mode stays spec-covered
        // (PipelineSpec "bpe").
        pipeline.TextAnalysis.bpeTrain(
            bpeCorpus(m.getDDFByName("documents").df),
            "text", nMerges = 6, minFreq = 1L, byteLevel = true)
          .orderBy("merge_rank")
      },
      Some(s"""WITH $duckBpeCorpus,
              |${duckBpeStages(6, "corpus", byteLevel = true)}
              |SELECT * FROM (${(0 until 6).map(k =>
                 s"SELECT $k AS merge_rank, l AS lhs, r AS rhs, l||r AS merged, " +
                 s"n AS pair_freq FROM b$k").mkString(" UNION ALL ")})
              |ORDER BY merge_rank""".stripMargin)),

    Q("t16_bpe_encode",
      (s, d) => {
        val m = mgr(s, d)
        val docs = bpeCorpus(m.getDDFByName("documents").df)
        val merges = pipeline.TextAnalysis.bpeTrain(docs, "text", nMerges = 6,
            minFreq = 1L, byteLevel = true)
          .orderBy("merge_rank").collect()
          .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq
        // byte-level encode with the learned merges — one chained codegen
        // expression, no join, no OOV branch (every word byte-decomposes);
        // emit hex tokens space-joined (oracle outputs are scalar)
        pipeline.TextAnalysis.bpeEncode(docs.filter(col("doc_id") < 30), "text",
            merges, byteLevel = true)
          .select(col("doc_id").as("id"),
            array_join(col("bpe_tokens"), " ").as("bpe_text"))
          .orderBy("id")
      },
      Some(duckBpeEncodeSql)),

    Q("t19_bpe_vocab_roundtrip",
      (s, d) => {
        // tokenizer-artifact persistence: train → SAVE the merge table to
        // parquet → LOAD it back → encode. The oracle is t16's encode SQL
        // verbatim — the round-trip must be invisible in the result, which
        // is exactly the artifact contract (a vocab trained today encodes
        // identically from storage forever).
        val m = mgr(s, d)
        val docs = bpeCorpus(m.getDDFByName("documents").df)
        val trained = pipeline.TextAnalysis.bpeTrain(docs, "text", nMerges = 6,
          minFreq = 1L, byteLevel = true)
        withScratch("graft_t19") { tmp =>
          pipeline.TextAnalysis.bpeSave(trained, s"$tmp/vocab")
          val merges = pipeline.TextAnalysis.bpeLoad(s, s"$tmp/vocab")
          collectAndClean(s,
            pipeline.TextAnalysis.bpeEncode(docs.filter(col("doc_id") < 30), "text",
                merges, byteLevel = true)
              .select(col("doc_id").as("id"),
                array_join(col("bpe_tokens"), " ").as("bpe_text"))
              .orderBy("id"), tmp)
        }
      },
      Some(duckBpeEncodeSql)),

    Q("t20_bpe_encode_scale",
      (s, d) => {
        // bpeEncodeAtScale — the production-vocabulary encoder (broadcast
        // merge ranks + per-partition greedy loop instead of nMerges
        // nested codegen HOFs) — against t16's oracle VERBATIM: the loop
        // must be token-for-token the same greedy fold the expression
        // form (and the DuckDB replay) computes.
        val m = mgr(s, d)
        val docs = bpeCorpus(m.getDDFByName("documents").df)
        val merges = pipeline.TextAnalysis.bpeTrain(docs, "text", nMerges = 6,
            minFreq = 1L, byteLevel = true)
          .orderBy("merge_rank").collect()
          .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toSeq
        pipeline.TextAnalysis.bpeEncodeAtScale(docs.filter(col("doc_id") < 30),
            "text", merges, byteLevel = true)
          .select(col("doc_id").as("id"),
            array_join(col("bpe_tokens"), " ").as("bpe_text"))
          .orderBy("id")
      },
      Some(duckBpeEncodeSql)),

    Q("t21_unicode_normalize",
      (s, d) => {
        val m = mgr(s, d)
        // NFC canonicalization in front of dedup keys (round 13): append
        // a decomposed combining sequence ("e"+U+0301, "A"+U+030A) to
        // every doc, normalize with the native codegen'd expression via
        // the SQL registration, and flag the byte change. DuckDB's
        // nfc_normalize is the oracle twin — both engines must emit
        // identical UTF-8 bytes (precomposed é/Å).
        val suffix = " caf\u0065\u0301 \u0041\u030A"
        val raw = concat(col("text"), lit(suffix))
        m.getDDFByName("documents").df
          .select(col("doc_id"),
            functions.VectorFunctions.unicodeNormalize(raw).as("nfc_text"),
            (functions.VectorFunctions.unicodeNormalize(raw) =!= raw).as("changed"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  nfc_normalize(text || ' caf' || chr(101) || chr(769) || ' ' || chr(65) || chr(778)) AS nfc_text,
             |  nfc_normalize(text || ' caf' || chr(101) || chr(769) || ' ' || chr(65) || chr(778))
             |    <> (text || ' caf' || chr(101) || chr(769) || ' ' || chr(65) || chr(778)) AS changed
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("t07_chunking",
      (s, d) => {
        val m = mgr(s, d)
        // context-window chunking: 16-token windows, 4-token overlap
        pipeline.TextAnalysis.chunkByTokens(
            m.getDDFByName("documents").df, "text", "doc_id",
            maxTokens = 16, overlap = 4)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id", "chunk_id")
      },
      // step = 12; chunk i = tokens [i*12+1, i*12+16] (1-based inclusive)
      Some(s"""WITH toks AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
              |nz AS (SELECT doc_id, tk,
              |    ceil(greatest(len(tk) - 4, 1) / 12.0)::INT AS n
              |  FROM toks WHERE len(tk) > 0),
              |ex AS (SELECT doc_id, tk, unnest(range(0, n)) AS chunk_id FROM nz)
              |SELECT doc_id, chunk_id,
              |  len(tk[chunk_id*12+1 : chunk_id*12+16])::BIGINT AS n_tokens,
              |  array_to_string(tk[chunk_id*12+1 : chunk_id*12+16], ' ') AS chunk
              |FROM ex ORDER BY doc_id, chunk_id""".stripMargin)),

    Q("m01_multimodal_meta",
      (s, d) => {
        val m = mgr(s, d)
        val docs = m.getDDFByName("documents").df.filter(col("doc_id") < 100)
        pipeline.Multimodal.withBinaryPayload(docs, "text", "text/plain")
          .select(col("doc_id"), col("meta.byte_len"), col("meta.content_hash"),
            col("meta.modality"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, octet_length(encode(text))::BIGINT AS byte_len,
             |  md5(text) AS content_hash, 'text/plain' AS modality
             |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin)),

    Q("e01_tumbling_30m",
      (s, d) => {
        val m = mgr(s, d)
        // same transform serves readStream sources (see StreamingSpec)
        streaming.EventStreams.tumblingCounts(m.getDDFByName("events").df, "30 minutes")
          .select(unix_timestamp(col("window_start")).as("bucket"),
            col("event_type"), col("n"), col("sum_value"))
          .orderBy("bucket", "event_type")
      },
      Some(s"""SELECT (floor(epoch(ts))::BIGINT // 1800) * 1800 AS bucket, event_type,
              |  count(*) AS n, ${dsumSql("value")} AS sum_value
              |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin)),

    Q("e02_interval_join",
      (s, d) => {
        val m = mgr(s, d)
        // stream-stream interval join, exercised on its batch twin (the
        // SAME function serves two readStream sources — StreamingSpec
        // pins batch==stream row parity): purchases within 30 min of a
        // click by the same user
        val ev = m.getDDFByName("events").df
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("ts").as("purchase_ts"), col("value"))
        streaming.EventStreams.intervalJoin(clicks, purchases, Seq("user_id"),
            "click_ts", "purchase_ts", lowerMs = 0L, upperMs = 30 * 60 * 1000L)
          .select(col("user_id"), col("click_id"), col("purchase_id"),
            (unix_millis(col("purchase_ts")) - unix_millis(col("click_ts"))).as("gap_ms"),
            col("value"))
          .orderBy("click_id", "purchase_id")
      },
      Some("""SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
             |  epoch_ms(p.ts) - epoch_ms(c.ts) AS gap_ms, p.value
             |FROM events c JOIN events p ON c.user_id = p.user_id
             |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
             |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
             |ORDER BY click_id, purchase_id""".stripMargin)),

    Q("e03_json_extract",
      (s, d) => {
        val m = mgr(s, d)
        // JSON string column → typed struct with an EXPLICIT schema
        // (one codegen'd parse per row, no inference job); integer sums
        // are exact on both engines. NULL-parse tolerance is part of
        // the contract: n counts all rows, n_parsed the parseable ones.
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType)))
        operators.Semistructured.extractJson(
            m.getDDFByName("events").df, "props", schema)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            count(col("json.k")).as("n_parsed"),
            sum(col("json.k")).as("sum_k"),
            min(col("json.k")).as("min_k"),
            max(col("json.k")).as("max_k"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
             |  count(cast(json_extract_string(props, '$.k') AS int)) AS n_parsed,
             |  cast(sum(cast(json_extract_string(props, '$.k') AS int)) AS bigint) AS sum_k,
             |  min(cast(json_extract_string(props, '$.k') AS int)) AS min_k,
             |  max(cast(json_extract_string(props, '$.k') AS int)) AS max_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    Q("e04_json_nested",
      (s, d) => {
        val m = mgr(s, d)
        // nested-payload depth: build a deterministic nested JSON string
        // FROM the table's own values (both engines construct the same
        // bytes), then drive the full extraction chain — explicit-schema
        // parse → dotted-path projection → nested-array explode. Rows
        // whose k fails to parse propagate NULL payload → NULL struct →
        // explode drops them, mirrored by the oracle's k IS NOT NULL.
        import org.apache.spark.sql.types._
        val k = get_json_object(col("props"), "$.k").cast("int")
        val ev = m.getDDFByName("events").df
          .withColumn("payload", concat(
            lit("{\"m\":{\"et\":\""), col("event_type"), lit("\",\"k\":"), k,
            lit("},\"a\":["), k, lit(","), (k * 2), lit("]}")))
        val schema = StructType(Seq(
          StructField("m", StructType(Seq(
            StructField("et", StringType), StructField("k", IntegerType)))),
          StructField("a", ArrayType(IntegerType))))
        val parsed = operators.Semistructured.extractJson(ev, "payload", schema)
        val proj = operators.Semistructured.selectPaths(parsed, "json", Seq("m.et", "m.k"))
        operators.Semistructured.explodeArray(proj, "json.a", "elem")
          .groupBy(col("m_et"))
          .agg(count(lit(1)).as("n_elems"), sum(col("m_k")).as("sum_k"),
            sum(col("elem")).as("sum_elem"))
          .orderBy("m_et")
      },
      Some("""WITH base AS (SELECT event_type,
             |    cast(json_extract_string(props, '$.k') AS int) AS k FROM events),
             |p AS (SELECT '{"m":{"et":"' || event_type || '","k":' || k::VARCHAR ||
             |    '},"a":[' || k::VARCHAR || ',' || (k*2)::VARCHAR || ']}' AS payload
             |  FROM base WHERE k IS NOT NULL),
             |e0 AS (SELECT json_extract_string(payload, '$.m.et') AS m_et,
             |    cast(json_extract_string(payload, '$.m.k') AS int) AS m_k,
             |    payload FROM p),
             |el AS (SELECT m_et, m_k,
             |    cast(json_extract_string(payload, '$.a[0]') AS int) AS elem FROM e0
             |  UNION ALL SELECT m_et, m_k,
             |    cast(json_extract_string(payload, '$.a[1]') AS int) FROM e0)
             |SELECT m_et, count(*) AS n_elems, sum(m_k)::BIGINT AS sum_k,
             |  sum(elem)::BIGINT AS sum_elem
             |FROM el GROUP BY m_et ORDER BY m_et""".stripMargin)),

    Q("e05_funnel",
      (s, d) => {
        // ordered conversion funnel view→click→purchase per user —
        // greedy match in the (ts, event_id) total order (unique
        // event_id ⇒ deterministic ties); one shuffle on user_id, no
        // windows (TimeSeries.funnel scaladoc). The oracle spells the
        // same greedy semantics as K chained first-after-previous CTEs.
        operators.TimeSeries.funnel(loadEvents(s, d),
          "user_id", "ts", "event_id", "event_type",
          Seq("view", "click", "purchase"))
          .orderBy("step_idx")
      },
      Some("""WITH f AS (SELECT user_id, ts, event_id, event_type FROM events
             |  WHERE event_type IN ('view','click','purchase')
             |    AND user_id IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL),
             |m1 AS (SELECT user_id, ts, event_id FROM f WHERE event_type='view'
             |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1),
             |m2 AS (SELECT f.user_id, f.ts, f.event_id FROM f JOIN m1 ON f.user_id = m1.user_id
             |  WHERE f.event_type='click'
             |    AND (f.ts > m1.ts OR (f.ts = m1.ts AND f.event_id > m1.event_id))
             |  QUALIFY row_number() OVER (PARTITION BY f.user_id ORDER BY f.ts, f.event_id) = 1),
             |m3 AS (SELECT f.user_id FROM f JOIN m2 ON f.user_id = m2.user_id
             |  WHERE f.event_type='purchase'
             |    AND (f.ts > m2.ts OR (f.ts = m2.ts AND f.event_id > m2.event_id))
             |  QUALIFY row_number() OVER (PARTITION BY f.user_id ORDER BY f.ts, f.event_id) = 1)
             |SELECT 1 AS step_idx, 'view' AS step, (SELECT count(*) FROM m1) AS reached
             |UNION ALL SELECT 2, 'click', (SELECT count(*) FROM m2)
             |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM m3)
             |ORDER BY step_idx""".stripMargin)),

    Q("s01_sessionize",
      (s, d) => {
        val m = mgr(s, d)
        import s.implicits._
        val ev = m.getDDFByName("events").df
          .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
          .as[streaming.EventStreams.EventRow]
        streaming.EventStreams.sessionize(ev, gapMs = 30 * 60 * 1000L)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("total_events"))
          .orderBy("user_id")
      },
      Some("""WITH g AS (SELECT user_id, ts,
             |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM events)
             |SELECT user_id,
             |  count(CASE WHEN prev IS NULL
             |             OR epoch_ms(ts) - epoch_ms(prev) > 1800000 THEN 1 END) AS n_sessions,
             |  count(*) AS total_events
             |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin)),

    Q("e06_temporal_split",
      (s, d) => {
        // entity-level purged temporal split: each USER lands wholly in
        // train/embargo/test by their FIRST event vs the cutoff (noon
        // Jan 1), 6 h embargo band dropped from both sides — the
        // leakage-safe eval prep for serially-correlated events
        operators.TimeSeries.entityTemporalSplit(loadEvents(s, d),
            "user_id", "ts",
            java.sql.Timestamp.valueOf("2024-01-01 12:00:00"),
            embargoMs = 6L * 3600 * 1000)
          .groupBy("split", "event_type")
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy("split", "event_type")
      },
      Some("""WITH f AS (SELECT user_id, min(ts) AS ft FROM events GROUP BY 1),
             |lab AS (SELECT user_id,
             |    CASE WHEN ft < TIMESTAMP '2024-01-01 06:00:00' THEN 'train'
             |         WHEN ft < TIMESTAMP '2024-01-01 12:00:00' THEN 'embargo'
             |         ELSE 'test' END AS split
             |  FROM f)
             |SELECT split, event_type, count(*)::BIGINT AS n,
             |  count(DISTINCT e.user_id)::BIGINT AS n_users
             |FROM events e JOIN lab USING (user_id)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("u02_mapreduce",
      (s, d) => {
        val m = mgr(s, d)
        import s.implicits._
        // typed map-reduce (reference U2): key by lang, reduce to
        // (n_docs, max_chars) — deterministic, SQL-mirrorable
        val docs = m.getDDFByName("documents")
        Transforms.mapReduce[String, (String, Long, Long)](docs)(_.getAs[String]("lang")) {
          case (k, rows) =>
            var n = 0L; var mx = 0L
            rows.foreach { r => n += 1; val c = r.getAs[Long]("n_chars"); if (c > mx) mx = c }
            (k, n, mx)
        }.df.toDF("lang", "n_docs", "max_chars").orderBy("lang")
      },
      Some("""SELECT lang, count(*) AS n_docs, max(n_chars) AS max_chars
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    Q("j01_asof_join",
      (s, d) => {
        val m = mgr(s, d)
        // every click gets the user's latest view at-or-before it —
        // checked against DuckDB's NATIVE ASOF JOIN (same <= semantics;
        // the fixture has no (user, ts) right-side ties). Times emitted
        // as epoch micros: exact integers in both engines.
        val ev = m.getDDFByName("events").df
        val clicks = ev.filter(col("event_type") === "click")
        val views = ev.filter(col("event_type") === "view")
        operators.Joins.asofJoin(clicks, views, Seq("user_id"),
            leftTime = "ts", rightTime = "ts",
            rightPayload = Seq("ts", "value"), rightOrder = "event_id")
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
            unix_micros(col("asof.ts")).as("matched_ts_us"),
            col("asof.value").as("matched_value"))
          .orderBy("event_id")
      },
      Some("""WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
             |r AS (SELECT * FROM events WHERE event_type = 'view')
             |SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
             |  epoch_us(r.ts) AS matched_ts_us, r.value AS matched_value
             |FROM l ASOF LEFT JOIN r
             |  ON l.user_id = r.user_id AND r.ts <= l.ts
             |ORDER BY l.event_id""".stripMargin)),

    Q("j07_asof_forward",
      (s, d) => {
        val m = mgr(s, d)
        // merge_asof direction="forward": every click gets the user's
        // EARLIEST view at-or-after it — DuckDB's native ASOF with the
        // inequality reversed is the oracle.
        val ev = m.getDDFByName("events").df
        val clicks = ev.filter(col("event_type") === "click")
        val views = ev.filter(col("event_type") === "view")
        operators.Joins.asofJoin(clicks, views, Seq("user_id"),
            leftTime = "ts", rightTime = "ts",
            rightPayload = Seq("ts", "value"), rightOrder = "event_id",
            direction = "forward")
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
            unix_micros(col("asof.ts")).as("matched_ts_us"),
            col("asof.value").as("matched_value"))
          .orderBy("event_id")
      },
      Some("""WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
             |r AS (SELECT * FROM events WHERE event_type = 'view')
             |SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
             |  epoch_us(r.ts) AS matched_ts_us, r.value AS matched_value
             |FROM l ASOF LEFT JOIN r
             |  ON l.user_id = r.user_id AND r.ts >= l.ts
             |ORDER BY l.event_id""".stripMargin)),

    Q("j08_asof_nearest",
      (s, d) => {
        val m = mgr(s, d)
        // merge_asof direction="nearest" with a 3600 s tolerance: the
        // closer of the backward/forward matches, ties backward, both
        // rejected beyond the tolerance. Oracle: both native ASOF
        // directions + the same CASE arithmetic on exact epoch micros.
        val ev = m.getDDFByName("events").df
        val clicks = ev.filter(col("event_type") === "click")
        val views = ev.filter(col("event_type") === "view")
        operators.Joins.asofJoin(clicks, views, Seq("user_id"),
            leftTime = "ts", rightTime = "ts",
            rightPayload = Seq("ts", "value"), rightOrder = "event_id",
            direction = "nearest", tolerance = Some(3600.0))
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
            unix_micros(col("asof.ts")).as("matched_ts_us"),
            col("asof.value").as("matched_value"))
          .orderBy("event_id")
      },
      Some("""WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
             |r AS (SELECT * FROM events WHERE event_type = 'view'),
             |b AS (SELECT l.event_id,
             |        CASE WHEN r.ts IS NOT NULL AND
             |          (epoch_us(l.ts) - epoch_us(r.ts)) / 1000000.0 <= 3600.0
             |          THEN r.ts END AS bts,
             |        CASE WHEN r.ts IS NOT NULL AND
             |          (epoch_us(l.ts) - epoch_us(r.ts)) / 1000000.0 <= 3600.0
             |          THEN r.value END AS bval
             |      FROM l ASOF LEFT JOIN r
             |        ON l.user_id = r.user_id AND r.ts <= l.ts),
             |f AS (SELECT l.event_id,
             |        CASE WHEN r.ts IS NOT NULL AND
             |          (epoch_us(r.ts) - epoch_us(l.ts)) / 1000000.0 <= 3600.0
             |          THEN r.ts END AS fts,
             |        CASE WHEN r.ts IS NOT NULL AND
             |          (epoch_us(r.ts) - epoch_us(l.ts)) / 1000000.0 <= 3600.0
             |          THEN r.value END AS fval
             |      FROM l ASOF LEFT JOIN r
             |        ON l.user_id = r.user_id AND r.ts >= l.ts)
             |SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
             |  epoch_us(CASE
             |    WHEN bts IS NULL THEN fts
             |    WHEN fts IS NULL THEN bts
             |    WHEN epoch_us(l.ts) - epoch_us(bts)
             |      <= epoch_us(fts) - epoch_us(l.ts) THEN bts
             |    ELSE fts END) AS matched_ts_us,
             |  CASE
             |    WHEN bts IS NULL THEN fval
             |    WHEN fts IS NULL THEN bval
             |    WHEN epoch_us(l.ts) - epoch_us(bts)
             |      <= epoch_us(fts) - epoch_us(l.ts) THEN bval
             |    ELSE fval END AS matched_value
             |FROM l JOIN b USING (event_id) JOIN f USING (event_id)
             |ORDER BY l.event_id""".stripMargin)),

    Q("j09_sorted_neighborhood",
      (s, d) => {
        val m = mgr(s, d)
        // Sorted-neighborhood record linkage over customer names:
        // rank by (name, id), compare only rank-window neighbors,
        // Levenshtein-verify. The oracle replays the window semantics
        // exactly (row_number in the same total order + rank-distance
        // join) — proving the distributed rank + two-bucket cover emits
        // precisely the in-window pairs, no more, no less.
        val out = pipeline.SetJoin.sortedNeighborhoodJoin(
          m.getDDFByName("customer").df, "c_name", "c_custkey",
          window = 10, maxDist = 1)
        out.orderBy("id_a", "id_b")
      },
      Some("""WITH r AS (SELECT c_custkey AS id, c_name AS k,
             |  row_number() OVER (ORDER BY c_name, c_custkey) - 1 AS rnk
             |  FROM customer)
             |SELECT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b,
             |  levenshtein(a.k, b.k)::BIGINT AS dist
             |FROM r a JOIN r b ON b.rnk > a.rnk AND b.rnk - a.rnk <= 9
             |WHERE levenshtein(a.k, b.k) <= 1
             |ORDER BY id_a, id_b""".stripMargin)),

    Q("j03_edit_distance_join",
      (s, d) => {
        // EXACT Levenshtein-1 self-join over customer names (the
        // entity-resolution join). k=1 takes the FastSS deletion-
        // neighborhood path: each name explodes to its len+1 single-
        // deletion variants, candidates are variant collisions — robust
        // to the "Customer#0000…" constant prefix that defeats
        // substring-signature filters — then codegen'd levenshtein
        // verifies. The oracle BRUTE-FORCES all n²/2 pairs in DuckDB:
        // equality proves zero false negatives on real data, not just
        // on spec fixtures.
        val m = mgr(s, d)
        pipeline.SetJoin.editDistanceJoin(
            m.getDDFByName("customer").df, "c_name", "c_custkey", maxDist = 1)
          .orderBy("id_a", "id_b")
      },
      Some("""SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             |  levenshtein(a.c_name, b.c_name)::BIGINT AS dist
             |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
             |WHERE abs(length(a.c_name) - length(b.c_name)) <= 1
             |  AND levenshtein(a.c_name, b.c_name) <= 1
             |ORDER BY id_a, id_b""".stripMargin)),

    Q("j04_edit_distance_join_k3",
      (s, d) => {
        // The k ≥ 3 POSITIONAL-Q-GRAM path of the edit-distance join
        // (j03's k=1 exercises only FastSS), on the corpus shape the
        // filter is FOR: pseudo-natural 20-char strings over a 16-letter
        // alphabet with a rich gram vocabulary (16⁴ = 65,536 at q=4) and
        // no constant region. Deterministically derived from customer
        // keys: groups of 4 sibling keys share an md5-derived base
        // string (a crypto hash — earlier algebraic recipes leaked
        // cyclic-shift/negation structure that made cross-group pairs
        // grow quadratically); sibling r carries r planted substitutions
        // at spread positions, so every group yields its 6 true pairs at
        // distances 0–3 and NOTHING else collides. q=4 over len 20
        // keeps the count bound meaningful (17 grams > q·k = 12 → bound
        // 5; at q=2 the bound would be 19−6=13 of 19 — also fine, but
        // 16² = 256 gram types would go stop-frequent at scale). The
        // oracle builds the SAME corpus and BRUTE-FORCES all n²/2 pairs
        // — completeness proven on data, not fixtures (the j03 argument,
        // now for the q-gram path).
        val m = mgr(s, d)
        pipeline.SetJoin.editDistanceJoin(
            editCorpus(m.getDDFByName("customer").df), "name", "k",
            maxDist = 3, q = 4)
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH $duckEditCorpus
              |SELECT a.k AS id_a, b.k AS id_b,
              |  levenshtein(a.name, b.name)::BIGINT AS dist
              |FROM b3 a JOIN b3 b ON a.k < b.k
              |WHERE levenshtein(a.name, b.name) <= 3
              |ORDER BY id_a, id_b""".stripMargin)),

    Q("j05_edit_distance_lookup",
      (s, d) => {
        // Two-table edit-distance LOOKUP, k=2 → the FastSS path's
        // cross-side variant collisions: probe batch (one fresh
        // substitution on every 5th group's base string) matched against
        // the j04 canonical corpus — the batch-vs-reference entity-
        // resolution shape. Oracle brute-forces the full probes×corpus
        // cross product.
        val m = mgr(s, d)
        val cust = m.getDDFByName("customer").df
        pipeline.SetJoin.editDistanceLookup(
            editProbes(cust), "pname", "pk",
            editCorpus(cust), "name", "k", maxDist = 2)
          .orderBy("id_l", "id_r")
      },
      Some(s"""WITH $duckEditCorpus,
              |$duckEditProbes
              |SELECT p.pk AS id_l, b.k AS id_r,
              |  levenshtein(p.pname, b.name)::BIGINT AS dist
              |FROM probes p CROSS JOIN b3 b
              |WHERE levenshtein(p.pname, b.name) <= 2
              |ORDER BY id_l, id_r""".stripMargin)),

    Q("j06_edit_distance_lookup_k3",
      (s, d) => {
        // the same lookup through the k ≥ 3 q-gram path (union-frequency
        // stop grams, poolL × poolR fallback) — both candidate
        // strategies of the two-table join under oracle
        val m = mgr(s, d)
        val cust = m.getDDFByName("customer").df
        pipeline.SetJoin.editDistanceLookup(
            editProbes(cust), "pname", "pk",
            editCorpus(cust), "name", "k", maxDist = 3, q = 4)
          .orderBy("id_l", "id_r")
      },
      Some(s"""WITH $duckEditCorpus,
              |$duckEditProbes
              |SELECT p.pk AS id_l, b.k AS id_r,
              |  levenshtein(p.pname, b.name)::BIGINT AS dist
              |FROM probes p CROSS JOIN b3 b
              |WHERE levenshtein(p.pname, b.name) <= 3
              |ORDER BY id_l, id_r""".stripMargin)),

    Q("j02_range_join",
      (s, d) => {
        val m = mgr(s, d)
        // attribution: clicks within [purchase − 30 min, purchase] per
        // user — the bucketized equi-join vs DuckDB's inequality join
        val ev = m.getDDFByName("events").df
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            (col("ts") - expr("INTERVAL 30 MINUTES")).as("w_start"), col("ts").as("w_end"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("c_ts"))
        operators.Joins.rangeJoin(clicks, purchases, Seq("user_id"),
            pointTime = "c_ts", startCol = "w_start", endCol = "w_end",
            bucketMs = 30 * 60 * 1000L)
          .select(col("purchase_id"), col("click_id"))
          .orderBy("purchase_id", "click_id")
      },
      Some("""SELECT p.event_id AS purchase_id, c.event_id AS click_id
             |FROM events p JOIN events c
             |  ON c.user_id = p.user_id
             | AND p.event_type = 'purchase' AND c.event_type = 'click'
             | AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
             |ORDER BY purchase_id, click_id""".stripMargin)),

    Q("p02_sequence_pack",
      (s, d) => {
        val m = mgr(s, d)
        // chunk → greedy-pack into 64-token training sequences; greedy is
        // sequential PER BUCKET but deterministic, so the oracle replays
        // it step-by-step in a DuckDB recursive CTE (frontier = one row
        // per bucket per iteration). PipelineSpec additionally pins the
        // packing invariants on a hand fixture.
        val chunks = pipeline.TextAnalysis.chunkByTokens(
          m.getDDFByName("documents").df, "text", "doc_id",
          maxTokens = 16, overlap = 0)
        pipeline.TextAnalysis.packChunks(chunks, budgetTokens = 64, nBuckets = 32)
          .groupBy("seq_id")
          .agg(count(lit(1)).as("n_chunks"), sum("n_tokens").as("n_tokens"))
          .orderBy("seq_id")
      },
      // Exact replay of packChunks' greedy loop: rows ordered by
      // (doc_id, chunk_id) within bucket = doc_id mod 32; a chunk opens a
      // new bin iff the running total would exceed the 64-token budget;
      // seq_id = bucket·2³³ + bin. `used` always includes the current
      // chunk, so the code's `used > 0` guard is implied.
      Some(s"""WITH RECURSIVE
              |toks AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
              |nz AS (SELECT doc_id, tk, ceil(greatest(len(tk), 1) / 16.0)::INT AS n
              |  FROM toks WHERE len(tk) > 0),
              |ch AS (SELECT doc_id, tk, unnest(range(0, n)) AS chunk_id FROM nz),
              |c2 AS (SELECT doc_id, chunk_id,
              |    len(tk[chunk_id*16+1 : chunk_id*16+16])::BIGINT AS n_tokens,
              |    doc_id % 32 AS bucket FROM ch),
              |b AS (SELECT *, row_number() OVER (PARTITION BY bucket
              |    ORDER BY doc_id, chunk_id) AS rn FROM c2),
              |pack AS (
              |  SELECT bucket, rn, n_tokens, 0::BIGINT AS bin, n_tokens AS used
              |  FROM b WHERE rn = 1
              |  UNION ALL
              |  SELECT b.bucket, b.rn, b.n_tokens,
              |    CASE WHEN p.used + b.n_tokens > 64 THEN p.bin + 1 ELSE p.bin END,
              |    CASE WHEN p.used + b.n_tokens > 64 THEN b.n_tokens
              |         ELSE p.used + b.n_tokens END
              |  FROM b JOIN pack p ON b.bucket = p.bucket AND b.rn = p.rn + 1)
              |SELECT (bucket * 8589934592 + bin)::BIGINT AS seq_id,
              |  count(*) AS n_chunks, sum(n_tokens)::BIGINT AS n_tokens
              |FROM pack GROUP BY 1 ORDER BY seq_id""".stripMargin)),

    Q("p03_corpus_shuffle",
      (s, d) => {
        val m = mgr(s, d)
        // deterministic training-order shuffle: shard + in-shard rank are
        // a pure function of (doc_id, salt) — DuckDB rederives the exact
        // order from the portableFold replica, so the whole epoch order
        // is oracle-checked, not just row counts
        Views.deterministicShuffle(
            m.register(m.getDDFByName("documents").df.select("doc_id")),
            "doc_id", salt = "ep1", numShards = 8)
          .df.orderBy("shard", "seq")
      },
      Some("""WITH h AS (SELECT doc_id,
             |    list_reduce(list_prepend(0::BIGINT,
             |      list_transform(regexp_split_to_array(doc_id::VARCHAR || ':ep1', ''),
             |        c -> coalesce(ascii(c), 0)::BIGINT)),
             |      (acc, x) -> (acc * 31 + x) % 1000000007) AS hh
             |  FROM documents)
             |SELECT doc_id, (hh % 8)::INT AS shard,
             |  row_number() OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id) AS seq
             |FROM h ORDER BY shard, seq""".stripMargin)),

    Q("p04_publish_verify",
      (s, d) => {
        val m = mgr(s, d)
        // publish → verify round trip through the driver gate: shard the
        // corpus by an EXPLICIT key column (hive partitionBy, so the
        // shard→rows mapping is a pure function of the data, not of file
        // splits), write with a manifest, re-scan and verify, and emit an
        // engine-portable verdict summary (file basenames and xxhash64
        // folds are Spark-specific; shard counts and ok-counts are not).
        // Tamper detection (hash mismatch → ok=false) is CoreSpec's job.
        val docs = m.getDDFByName("documents").df.filter(col("doc_id") < 400)
          .withColumn("shard", pmod(col("doc_id"), lit(4L)))
          .repartition(4, col("shard"))
        withScratch("graft_p04") { tmp =>
          sources.Manifest.writeWithManifest(docs, s"$tmp/corpus", partitionCols = Seq("shard"))
          collectAndClean(s, sources.Manifest.verifyManifest(s, s"$tmp/corpus")
            .agg(count(lit(1)).as("n_shards"),
              sum(when(col("ok"), 1L).otherwise(0L)).as("n_ok"),
              sum(col("actual_rows")).as("total_rows"),
              min(col("actual_rows")).as("min_shard_rows"),
              max(col("actual_rows")).as("max_shard_rows")), tmp)
        }
      },
      Some("""WITH s AS (SELECT doc_id % 4 AS shard, count(*) AS n
             |  FROM documents WHERE doc_id < 400 GROUP BY 1)
             |SELECT count(*)::BIGINT AS n_shards, count(*)::BIGINT AS n_ok,
             |  sum(n)::BIGINT AS total_rows, min(n)::BIGINT AS min_shard_rows,
             |  max(n)::BIGINT AS max_shard_rows FROM s""".stripMargin)),

    Q("p05_curation_corpus_build",
      (s, d) => {
        val m = mgr(s, d)
        // Round-11 composed corpus build: the round-10 curation families
        // chained end-to-end with no seam, every stage already gate-
        // proven alone — DSIR domain selection (ds02) → exact dedup
        // (p01) → portable MinHash near-dup drop (p01) → multi-suite
        // decontamination (t17) → curriculum ordering (c10) →
        // curriculum-striped sequence packing (p02) → publish with
        // manifest + column profile (p04/sk01). The publish is VERIFIED
        // and the final summary is read back FROM THE PUBLISHED FILES,
        // so the whole chain including the write round-trips through the
        // gate; the DuckDB twin replays every stage as stacked CTEs.
        val docs = m.getDDFByName("documents").df
        // 1. DSIR: top-300 raw docs by importance to the %7==0 target domain
        val selIds = pipeline.Dsir.resample(
            docs.filter(col("doc_id") % 7 =!= 0),
            docs.filter(col("doc_id") % 7 === 0),
            "text", "doc_id", k = 300, buckets = 4096)
          .select(col("id").as("doc_id"))
        val sel = docs.join(broadcast(selIds), Seq("doc_id"))
        // 2.+3. exact survivors, then drop the higher id of each near-dup pair
        val surv = pipeline.Dedup.exactSurvivors(sel, "text", "doc_id")
        val dups = pipeline.Dedup.minhashDedup(surv, "text", "doc_id",
            threshold = 0.7, portable = true)
          .select(col("id2").as("doc_id")).distinct()
        val nodup = surv.join(dups, Seq("doc_id"), "left_anti")
        // 4. decontaminate against all three %37==0 bench suites in one pass
        val benches = docs.filter(col("doc_id") % 37 === 0)
          .select(concat(lit("b"), (col("doc_id") % 3).cast("string")).as("bench_id"),
            col("text"))
        val clean = pipeline.TextAnalysis.decontaminatedAll(
          nodup, benches, "text", "doc_id", "bench_id", n = 3)
        // 5. curriculum order by token count (c10's cutoffs)
        val ordered = pipeline.TextAnalysis.curriculumOrder(
          clean.select(col("doc_id"),
            pipeline.TextAnalysis.tokenCount("text").cast("double").as("score")),
          "score", "doc_id", cutoffs = Seq(30.0, 60.0, 90.0))
        // 6. pack the curriculum stream into 256-token training sequences
        // striped over 8 bucket streams: position `ord` plays the pack id,
        // so bucket = ord % 8 and within-bucket order IS curriculum order
        val packed = pipeline.TextAnalysis.packChunks(
          ordered.select(col("ord").as("id"), lit(0L).as("chunk_id"),
            col("score").cast("long").as("n_tokens"), col("id").as("doc_id")),
          budgetTokens = 256, nBuckets = 8)
        // 7. publish sharded by pack bucket with manifest + profile,
        // verify, then answer from the published corpus itself
        withScratch("graft_p05") { tmp =>
          val out = packed.withColumn("shard", shiftright(col("seq_id"), 33))
          sources.Manifest.writeWithManifest(out, s"$tmp/corpus",
            partitionCols = Seq("shard"))
          sources.Manifest.writeProfileFor(s, s"$tmp/corpus")
          // coalesce: a 0-shard verify frame (empty-but-valid corpus —
          // every doc filtered out upstream) sums to NULL, and verifying
          // vacuously true is the correct reading
          val allOk = sources.Manifest.verifyManifest(s, s"$tmp/corpus")
            .agg(coalesce(sum(when(col("ok"), 0L).otherwise(1L)), lit(0L)))
            .first().getLong(0) == 0L
          val publishedDocs = sources.Manifest.mergedProfile(s, Seq(s"$tmp/corpus"))
            .filter(col("col_name") === "doc_id")
            .select("row_count").first().getLong(0)
          collectAndClean(s, s.read.parquet(s"$tmp/corpus")
            .groupBy("seq_id")
            .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
              min(col("id")).as("first_ord"), min("doc_id").as("min_doc_id"))
            .withColumn("publish_ok", lit(allOk))
            .withColumn("published_docs", lit(publishedDocs))
            .orderBy("seq_id"), tmp)
        }
      },
      // Stage-by-stage replay: DSIR select (shared full_w stack) → exact
      // dedup (min id per md5 of normalized text) → MinHash pairs
      // (shared mpairs stack) → decontamination (the union of all bench
      // suites' shingles is exactly decontaminatedAll's distinct-id drop
      // set; raw-string shingle join per t17's identical-absent-collision
      // argument) → c10's curriculum construction → p02's recursive
      // pack replay with bucket = ord % 8 and a 256-token budget.
      // publish_ok/published_docs replicate the Spark-side verification
      // constants: TRUE (manifest verified) and the profile's row count
      // (= clean docs, one packed row per doc).
      Some(s"""WITH RECURSIVE
              |$duckDsirW,
              |dsel AS (SELECT doc_id FROM full_w WHERE n_feats > 0
              |  ORDER BY weight DESC, doc_id LIMIT 300),
              |corp AS (SELECT d.* FROM documents d JOIN dsel USING (doc_id)),
              |reps AS (SELECT min(doc_id) AS doc_id FROM corp
              |  GROUP BY md5(${duckNorm("text")})),
              |surv AS (SELECT c.* FROM corp c JOIN reps USING (doc_id)),
              |${duckMinhashCtes("surv")},
              |ddups AS (SELECT DISTINCT id2 AS doc_id FROM mpairs WHERE jr >= 0.7),
              |nodup AS (SELECT * FROM surv
              |  WHERE doc_id NOT IN (SELECT doc_id FROM ddups)),
              |ntk AS (SELECT doc_id, ${duckToks("text")} AS tk FROM nodup),
              |csh AS (SELECT doc_id, ${duckNgrams("tk", 3)} AS shs FROM ntk),
              |cex AS (SELECT DISTINCT doc_id, unnest(shs) AS s FROM csh),
              |btk AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents
              |  WHERE doc_id % 37 = 0),
              |bshs AS (SELECT doc_id, ${duckNgrams("tk", 3)} AS shs FROM btk),
              |bex AS (SELECT DISTINCT unnest(shs) AS s FROM bshs),
              |contam AS (SELECT DISTINCT e.doc_id FROM cex e JOIN bex USING (s)),
              |clean AS (SELECT * FROM nodup
              |  WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
              |cscore AS (SELECT doc_id,
              |    len(${duckToks("text")})::DOUBLE AS score FROM clean),
              |cb AS (SELECT doc_id, score,
              |    (CASE WHEN score > 90 THEN 3 WHEN score > 60 THEN 2
              |          WHEN score > 30 THEN 1 ELSE 0 END) AS bucket FROM cscore),
              |cf AS (SELECT *, list_reduce(list_prepend(0::BIGINT,
              |      list_transform(regexp_split_to_array(doc_id::VARCHAR, ''),
              |        c -> coalesce(ascii(c), 0)::BIGINT)),
              |      (acc, x) -> (acc * 31 + x) % 1000000007) AS h FROM cb),
              |cord AS (SELECT doc_id, score, bucket,
              |    ((row_number() OVER (PARTITION BY bucket ORDER BY h, doc_id) - 1)
              |      * 4 + bucket)::BIGINT AS ord
              |  FROM cf),
              |pc AS (SELECT doc_id, ord, score::BIGINT AS n_tokens,
              |    ord % 8 AS pbucket FROM cord),
              |pb AS (SELECT *, row_number() OVER (PARTITION BY pbucket
              |    ORDER BY ord) AS rn FROM pc),
              |pack AS (
              |  SELECT pbucket, rn, n_tokens, ord, doc_id,
              |    0::BIGINT AS bin, n_tokens AS used
              |  FROM pb WHERE rn = 1
              |  UNION ALL
              |  SELECT b.pbucket, b.rn, b.n_tokens, b.ord, b.doc_id,
              |    CASE WHEN p.used + b.n_tokens > 256 THEN p.bin + 1 ELSE p.bin END,
              |    CASE WHEN p.used + b.n_tokens > 256 THEN b.n_tokens
              |         ELSE p.used + b.n_tokens END
              |  FROM pb b JOIN pack p ON b.pbucket = p.pbucket AND b.rn = p.rn + 1),
              |tot AS (SELECT count(*)::BIGINT AS n FROM clean)
              |SELECT (pbucket * 8589934592 + bin)::BIGINT AS seq_id,
              |  count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS n_tokens,
              |  min(ord)::BIGINT AS first_ord, min(doc_id)::BIGINT AS min_doc_id,
              |  TRUE AS publish_ok, tot.n AS published_docs
              |FROM pack, tot
              |GROUP BY pbucket, bin, tot.n ORDER BY seq_id""".stripMargin)),

    Q("p06_multimodal_corpus_build",
      (s, d) => {
        val m = mgr(s, d)
        // The multimodal twin of p05: the image-curation operators
        // composed end-to-end WITHOUT a seam — real PNG ingest → dHash →
        // banded near-dup pairs → pointer-doubling cluster
        // representatives (clusterSurvivors) → publish with manifest →
        // verify. 48 pattern images (8 per class); classes {P0, P1}
        // (Hamming 1) and {P3, P4} (Hamming 2) are near-dup CLIQUES, so
        // the oracle's no-smaller-neighbor rule equals the component
        // minimum, and everything replays from the pattern literals.
        import s.implicits._
        val docIds = m.getDDFByName("documents").df
          .filter(col("doc_id") < 48).select("doc_id")
          .collect().map(_.getLong(0)).toSeq.sorted
        val imgs = patternImages(docIds)
        val hashes = pipeline.Multimodal.imageDHashes(
          imgs.toDF("id", "payload"), "id", "payload")
        val pairs = pipeline.Multimodal.nearDupImagePairs(hashes, "id",
          maxHamming = 2, bands = 4)
        val reps = pipeline.Dedup.clusterSurvivors(
          hashes.select("id", "dhash"), pairs, "id")
        withScratch("graft_p06") { tmp =>
          sources.Manifest.writeWithManifest(reps.repartition(1), s"$tmp/corpus")
          val v = sources.Manifest.verifyManifest(s, s"$tmp/corpus")
            .agg(count(lit(1)).as("n_shards"),
              sum(when(col("ok"), 1L).otherwise(0L)).as("n_ok"))
          collectAndClean(s, reps.crossJoin(v).orderBy("id"), tmp)
        }
      },
      Some("""WITH pat(k, p) AS (VALUES
             |  (0, 4348954285570149135::BIGINT), (1, 4348954285570149134::BIGINT),
             |  (2, 4348954287449197327::BIGINT), (3, 1317473026990674775::BIGINT),
             |  (4, 1317473026990674772::BIGINT), (5, 6510615555426900570::BIGINT)),
             |imgs AS MATERIALIZED (
             |  SELECT doc_id AS id, p FROM documents
             |  JOIN pat ON pat.k = doc_id % 6 WHERE doc_id < 48)
             |SELECT a.id, a.p AS dhash, 1::BIGINT AS n_shards, 1::BIGINT AS n_ok
             |FROM imgs a WHERE NOT EXISTS (
             |  SELECT 1 FROM imgs b WHERE b.id < a.id
             |    AND bit_count(xor(a.p, b.p)) <= 2)
             |ORDER BY a.id""".stripMargin)),

    Q("p07_graph_curation_report",
      (s, d) => {
        val m = mgr(s, d)
        // The graph twin of p05/p06: the graph-analytics family composed
        // end-to-end WITHOUT a seam — the real entity-graph curation
        // step of "label components, profile their structure, check for
        // a giant component". connectedComponents (pointer-doubling min
        // label) over g03's multi-hop chain graph → per-component
        // degree/size/edge stats → component-SIZE distribution → the
        // exact skewReport over the component labels (is one component
        // absorbing the graph?) broadcast onto every distribution row.
        // Oracle: g03's 10-round CC replay extended with the degree,
        // stat, distribution, and skew stages as stacked MATERIALIZED
        // CTEs.
        val c = m.getDDFByName("customer").df
          .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"))
        val ed = c.join(
            c.select(col("k").as("k2"), col("seg").as("seg2")),
            col("k2") === col("k") + 7 && col("seg2") === col("seg"))
          .select(col("k").as("src"), col("k2").as("dst"))
        val comps = Graph.connectedComponents(ed, "src", "dst")
        val sym = ed.unionByName(
          ed.select(col("dst").as("src"), col("src").as("dst"))).distinct()
        val deg = sym.groupBy(col("src").as("id")).agg(count(lit(1)).as("dg"))
        val cstat = comps.join(deg, "id")
          .groupBy("cluster_id")
          .agg(count(lit(1)).as("size"), max("dg").as("max_deg"),
            sum("dg").as("deg_sum"))
        val dist = cstat.groupBy("size")
          .agg(count(lit(1)).as("n_components"),
            expr("sum(deg_sum div 2)").as("n_edges"),
            max("max_deg").as("max_deg"))
        val skew = Stats.skewReport(comps.select("cluster_id"), Seq("cluster_id"))
          .select(col("n_rows").as("n_nodes"),
            col("top_cnt").as("giant_size"),
            round(col("skew_ratio"), 6).as("skew_ratio"))
        dist.crossJoin(broadcast(skew))
          .select("size", "n_components", "n_edges", "max_deg",
            "n_nodes", "giant_size", "skew_ratio")
          .orderBy("size")
      },
      Some {
        val base =
          """c AS MATERIALIZED (SELECT c_custkey AS k, c_mktsegment AS seg FROM customer),
            |ed AS MATERIALIZED (SELECT a.k AS src, b.k AS dst FROM c a
            |       JOIN c b ON b.k = a.k + 7 AND b.seg = a.seg),
            |edges AS MATERIALIZED (SELECT src, dst FROM ed UNION SELECT dst, src FROM ed),
            |lab0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS label FROM edges)""".stripMargin
        val rounds = (0 until 10).map { k =>
          s"""n$k AS MATERIALIZED (SELECT e.dst AS id, min(l.label) AS nlabel
             |  FROM edges e JOIN lab$k l ON e.src = l.id GROUP BY e.dst),
             |hop$k AS MATERIALIZED (SELECT l.id, least(l.label, coalesce(n.nlabel, l.label)) AS label
             |  FROM lab$k l LEFT JOIN n$k n USING (id)),
             |lab${k + 1} AS MATERIALIZED (SELECT a.id, least(a.label, coalesce(b.label, a.label)) AS label
             |  FROM hop$k a LEFT JOIN hop$k b ON a.label = b.id)""".stripMargin
        }
        val stats =
          """comp AS MATERIALIZED (SELECT id, label AS cluster_id FROM lab10),
            |deg AS MATERIALIZED (SELECT src AS id, count(*)::BIGINT AS dg
            |  FROM edges GROUP BY src),
            |cstat AS MATERIALIZED (
            |  SELECT c.cluster_id, count(*)::BIGINT AS size,
            |    max(d.dg)::BIGINT AS max_deg, sum(d.dg)::BIGINT AS deg_sum
            |  FROM comp c JOIN deg d USING (id) GROUP BY c.cluster_id),
            |dist AS MATERIALIZED (
            |  SELECT size, count(*)::BIGINT AS n_components,
            |    sum(deg_sum // 2)::BIGINT AS n_edges, max(max_deg)::BIGINT AS max_deg
            |  FROM cstat GROUP BY size),
            |gk AS MATERIALIZED (
            |  SELECT coalesce(cluster_id::VARCHAR, '<NULL>') AS key,
            |    count(*)::BIGINT AS cnt FROM comp GROUP BY 1),
            |skew AS MATERIALIZED (
            |  SELECT sum(cnt)::BIGINT AS n_nodes,
            |    (SELECT cnt FROM gk ORDER BY cnt DESC, key DESC LIMIT 1) AS giant_size,
            |    round((SELECT cnt FROM gk ORDER BY cnt DESC, key DESC LIMIT 1)::DOUBLE
            |      * count(*) / sum(cnt), 6) AS skew_ratio
            |  FROM gk)""".stripMargin
        s"WITH ${((base +: rounds) :+ stats).mkString(",\n")}\n" +
          """SELECT d.size, d.n_components, d.n_edges, d.max_deg,
            |  s.n_nodes, s.giant_size, s.skew_ratio
            |FROM dist d CROSS JOIN skew s ORDER BY d.size""".stripMargin
      }),

    Q("p09_novelty_gated_build",
      (s, d) => {
        val m = mgr(s, d)
        // Round-15 composed chain: quality gate → exact dedup → corpus-
        // order novelty gate — the "how much of the survivor is
        // recycled" stage per-pair dedup can't provide (t22's operator
        // inside a build). The novelty threshold is the EXACT integer
        // predicate 2·novel ≥ n (≥ half the doc's shingles first seen in
        // it), so no cross-engine float margin exists by construction.
        val docs = m.getDDFByName("documents").df
        val keepIds = pipeline.TextAnalysis.c4Rules(docs, "text", "doc_id",
            minWords = 30, minMeanLen = 3.0, maxMeanLen = 4.5, maxWordLen = 25,
            requireTerminalPunct = false)
          .filter(col("keep")).select(col("id").as("doc_id"))
        val gated = docs.join(keepIds, Seq("doc_id"), "left_semi")
        val surv = pipeline.Dedup.exactSurvivors(gated, "text", "doc_id")
        val fresh = pipeline.TextAnalysis.ngramNovelty(surv, "text", "doc_id",
            hashShingles = false)
          .filter(col("novel_shingles") * 2 >= col("n_shingles"))
        surv.join(fresh, Seq("doc_id"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_shingles").as("total_shingles"),
            sum("novel_shingles").as("novel_shingles"),
            min("doc_id").as("first_doc"))
          .orderBy("lang")
      },
      Some(s"""WITH t AS (SELECT doc_id, text, lang, ${duckToks("text")} AS tk
              |  FROM documents),
              |kept AS (SELECT doc_id, text, lang FROM t WHERE
              |  len(tk) >= 30
              |  AND (CASE WHEN len(tk) = 0 THEN 0.0
              |       ELSE list_sum(list_transform(tk, x -> length(x))) / len(tk)::DOUBLE END)
              |      BETWEEN 3.0 AND 4.5
              |  AND coalesce(list_max(list_transform(tk, x -> length(x))), 0) <= 25
              |  AND NOT contains(lower(text), 'lorem ipsum')
              |  AND NOT contains(lower(text), 'javascript')
              |  AND NOT contains(lower(text), '{')),
              |reps AS (SELECT min(doc_id) AS doc_id FROM kept
              |  GROUP BY md5(${duckNorm("text")})),
              |surv AS (SELECT k.* FROM kept k JOIN reps USING (doc_id)),
              |posts AS (SELECT doc_id, unnest(${duckShingles("text")}) AS sh FROM surv),
              |tot AS (SELECT doc_id, count(*) AS n_sh FROM posts GROUP BY doc_id),
              |fst AS (SELECT sh, min(doc_id) AS doc_id FROM posts GROUP BY sh),
              |novn AS (SELECT doc_id, count(*) AS novel FROM fst GROUP BY doc_id),
              |fresh AS (SELECT t2.doc_id, t2.n_sh, coalesce(n.novel, 0) AS novel
              |  FROM tot t2 LEFT JOIN novn n USING (doc_id)
              |  WHERE 2 * coalesce(n.novel, 0) >= t2.n_sh)
              |SELECT s.lang, count(*)::BIGINT AS n_docs,
              |  sum(f.n_sh)::BIGINT AS total_shingles,
              |  sum(f.novel)::BIGINT AS novel_shingles,
              |  min(s.doc_id)::BIGINT AS first_doc
              |FROM surv s JOIN fresh f USING (doc_id)
              |GROUP BY s.lang ORDER BY s.lang NULLS FIRST""".stripMargin)),

    Q("p10_datacard",
      (s, d) => {
        val m = mgr(s, d)
        // the dataset datasheet: per-source doc/token counts, exact-dup
        // volume, quality-gate pass count, dominant language + spread —
        // every metric an integer count (or an argmax over them), so the
        // report is bit-identical across engines by construction
        pipeline.TextAnalysis.datacard(m.getDDFByName("documents").df,
            "text", "doc_id", "source")
          .orderBy("source")
      },
      Some(s"""WITH sc AS (SELECT doc_id, source, text, $duckLangScores
              |  FROM documents),
              |b AS (SELECT source, md5(${duckNorm("text")}) AS fp,
              |    ${duckTokenCount("text")} AS tc,
              |    $duckLangCase AS lang,
              |    CASE WHEN ${duckQuality("text")} >= 0.5 THEN 1 ELSE 0 END AS hi
              |  FROM sc),
              |g AS (SELECT source, fp, count(*) AS n, sum(tc) AS tok,
              |    sum(hi) AS hi, min(lang) AS lang
              |  FROM b GROUP BY source, fp),
              |per AS (SELECT source, sum(n)::BIGINT AS n_docs,
              |    sum(tok)::BIGINT AS n_tokens,
              |    (sum(n) - count(*))::BIGINT AS n_dup_docs,
              |    sum(hi)::BIGINT AS n_quality_hi
              |  FROM g GROUP BY source),
              |lc AS (SELECT source, lang, sum(n) AS ln FROM g GROUP BY source, lang),
              |top AS (SELECT source, lang,
              |    row_number() OVER (PARTITION BY source ORDER BY ln DESC, lang) AS rn,
              |    count(*) OVER (PARTITION BY source) AS nl FROM lc)
              |SELECT p.source, p.n_docs, p.n_tokens, p.n_dup_docs, p.n_quality_hi,
              |  t.lang AS top_lang, t.nl::BIGINT AS n_langs
              |FROM per p JOIN top t
              |  ON t.source IS NOT DISTINCT FROM p.source AND t.rn = 1
              |ORDER BY p.source""".stripMargin)),

    Q("p11_quality_ensemble_build",
      (s, d) => {
        val m = mgr(s, d)
        // Round-14 composed quality ensemble: two heterogeneous signals
        // (code-point entropy via the native char_entropy; doc length)
        // rank-normalized to [0,1] percentile space (window-free midrank
        // ECDF), averaged, and gated at the median blend — the
        // multi-signal quality-filter shape where rank blending replaces
        // unit gymnastics. Entropy is rounded to 6 BEFORE ranking so the
        // distinct-value grouping sees grid-aligned values on both
        // engines (cross-engine fold noise ~1e-15 vs the 1e-6 grid).
        val docs = m.getDDFByName("documents").df
        val sig = docs.select(col("doc_id"),
          expr("round(char_entropy(text), 6)").as("ent"),
          length(col("text")).cast("double").as("len"))
        Stats.percentileRank(sig, Seq("ent", "len"))
          .select(col("doc_id"),
            round((col("ent_pr") + col("len_pr")) / 2, 7).as("blend"))
          .filter(col("blend") >= 0.5)
          .orderBy("doc_id")
      },
      Some("""WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c
             |  FROM documents),
             |cnt AS (SELECT doc_id, c, count(*)::DOUBLE AS k FROM ch GROUP BY 1, 2),
             |tot AS (SELECT doc_id, sum(k) AS n FROM cnt GROUP BY 1),
             |ent AS (SELECT doc_id,
             |    round(-sum((k / n) * log2(k / n)), 6) AS ent
             |  FROM cnt JOIN tot USING (doc_id) GROUP BY 1),
             |sig AS (SELECT d.doc_id, e.ent, length(d.text)::DOUBLE AS len
             |  FROM documents d JOIN ent e USING (doc_id)),
             |ec AS (SELECT ent AS v, count(*) AS k FROM sig GROUP BY 1),
             |er AS (SELECT v,
             |    (coalesce(sum(k) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
             |       PRECEDING AND 1 PRECEDING), 0) + 0.5 * k)
             |      / (sum(k) OVER ()) AS pr FROM ec),
             |lc AS (SELECT len AS v, count(*) AS k FROM sig GROUP BY 1),
             |lr AS (SELECT v,
             |    (coalesce(sum(k) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
             |       PRECEDING AND 1 PRECEDING), 0) + 0.5 * k)
             |      / (sum(k) OVER ()) AS pr FROM lc)
             |SELECT s.doc_id, round((er.pr + lr.pr) / 2, 7) AS blend
             |FROM sig s JOIN er ON s.ent = er.v JOIN lr ON s.len = lr.v
             |WHERE round((er.pr + lr.pr) / 2, 7) >= 0.5
             |ORDER BY s.doc_id""".stripMargin)),

    Q("p08_mixture_recipe_build",
      (s, d) => {
        val m = mgr(s, d)
        // Round-13 composed mixture recipe: this round's three operators
        // chained end-to-end, each gate-proven alone (t21, q94, c12).
        // Every doc arrives TWICE — once with a decomposed combining
        // sequence appended, once with the precomposed equivalent under
        // a shifted id — so Unicode canonicalization is doing real work:
        // NFC makes the copies byte-identical, exact dedup folds each
        // pair back to the original id (without normalize, nothing would
        // merge). Survivors then pass per-source budget selection in
        // longest-documents-first quality order, and the result's lang
        // mix is matched to the src0-2 slice's mix. The DuckDB twin
        // replays all three stages as stacked CTEs.
        val docs = m.getDDFByName("documents").df
        val keep = Seq(col("lang"), col("source"), col("n_chars"))
        val variants = docs.select(col("doc_id") +:
            concat(col("text"), lit(" cafe\u0301")).as("text") +: keep: _*)
          .unionByName(docs.select((col("doc_id") + 1000000L).as("doc_id") +:
            concat(col("text"), lit(" caf\u00e9")).as("text") +: keep: _*))
        val canon = variants.withColumn("text",
          functions.VectorFunctions.unicodeNormalize(col("text")))
        // r14 (verdict ask #7, measured in P08Probe): BOTH multi-read
        // stages materialize once. The survivor frame feeds the budget
        // selector's regime-detection count plus its window pass; the
        // selection feeds matchDistribution's stats pass plus its two
        // output branches — unmaterialized, the normalize→dedup chain
        // re-executed per read (rebuild 3.05 s vs 1.51 s checkpointed,
        // min-of-3 at sf0.1). This is exactly the "persist it first"
        // caller contract in matchDistribution's scaladoc; the blocks
        // release on the session's next cache drain.
        // the text column's work is DONE once dedup picks survivors —
        // drop it before materializing so the checkpoint holds only the
        // four slim columns every later stage reads
        val surv = pipeline.Dedup.exactSurvivors(canon, "text", "doc_id")
          .select("doc_id", "lang", "source", "n_chars")
          .localCheckpoint(eager = true)
        val sel = operators.Views.budgetSelectByGroup(surv, "source",
          Seq(col("n_chars").desc, col("doc_id").asc), "n_chars",
          budgets = Map("src1" -> 5000L, "src7" -> 0L), defaultBudget = 3000L)
          .localCheckpoint(eager = true)
        val target = docs.filter(col("source").isin("src0", "src1", "src2"))
        Views.matchDistribution(m.register(sel), "lang", "doc_id", target)
          .df.select("doc_id", "source", "lang", "n_chars")
          .orderBy("doc_id")
      },
      // Stage replay: variant corpus (decomposed chr(101)+chr(769) /
      // precomposed chr(233)) → nfc_normalize → exact dedup (min id per
      // md5 of the whitespace-normalized text, Dedup.normText's contract)
      // → q94's per-source running-sum window → c12's BigInt quota +
      // xor-fold-rank selection computed over the BUDGETED survivor set.
      Some(s"""WITH vars AS (
              |  SELECT doc_id, text || ' caf' || chr(101) || chr(769) AS text,
              |    lang, source, n_chars FROM documents
              |  UNION ALL
              |  SELECT doc_id + 1000000 AS doc_id, text || ' caf' || chr(233) AS text,
              |    lang, source, n_chars FROM documents),
              |canon AS (SELECT doc_id, nfc_normalize(text) AS text,
              |    lang, source, n_chars FROM vars),
              |reps AS (SELECT min(doc_id) AS doc_id FROM canon
              |  GROUP BY md5(${duckNorm("text")})),
              |surv AS (SELECT c.* FROM canon c JOIN reps USING (doc_id)),
              |bsel AS (SELECT doc_id, lang, source, n_chars FROM (
              |    SELECT *, sum(n_chars) OVER (PARTITION BY source
              |      ORDER BY n_chars DESC, doc_id) AS rs FROM surv)
              |  WHERE rs <= CASE source WHEN 'src1' THEN 5000
              |                          WHEN 'src7' THEN 0 ELSE 3000 END),
              |tgt AS (SELECT lang, count(*) AS ct FROM documents
              |    WHERE source IN ('src0','src1','src2') GROUP BY 1),
              |dc AS (SELECT lang, count(*) AS cd FROM bsel GROUP BY 1),
              |j AS (SELECT dc.lang AS lang, cd, ct FROM dc JOIN tgt USING (lang)),
              |tot AS (SELECT sum(ct) AS t FROM j),
              |mm AS (SELECT min(cd * t // ct) AS m FROM j, tot),
              |q AS (SELECT lang, (m * ct // t) AS quota FROM j, tot, mm),
              |h AS (SELECT doc_id, lang, source, n_chars,
              |    (doc_id % 1000000000) * 2654435761 AS p FROM bsel),
              |r AS (SELECT doc_id, lang, source, n_chars,
              |    row_number() OVER (PARTITION BY lang
              |      ORDER BY xor(p, p >> 31) % 1000000007, doc_id) AS rn FROM h)
              |SELECT doc_id, source, lang, n_chars FROM r JOIN q USING (lang)
              |WHERE rn <= quota ORDER BY doc_id""".stripMargin)),

    Q("s05_stream_dedup_ingest",
      (s, d) => {
        val m = mgr(s, d)
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        // the streaming curation path driven END-TO-END through the gate:
        // three MemoryStream epochs (epoch = doc_id mod 3), exact-deduped
        // ingest against the epoch-partitioned fingerprint index, final
        // corpus = union of the per-epoch sink deliveries. The collect is
        // the MemoryStream test-source contract (driver-fed stream), not
        // an operator shape — production sources are kafka/files.
        val docs = m.getDDFByName("documents").df
          .select(col("doc_id"), col("text")).as[(Long, String)].collect()
        withScratch("graft_s05") { tmp =>
          val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
          val q = streaming.CurationStreams.dedupedIngest(
              stream.toDF().toDF("doc_id", "text"), "text", "doc_id", s"$tmp/index",
              (df, epoch) => df.select(col("doc_id"), lit(epoch).as("epoch"))
                .write.mode("append").parquet(s"$tmp/out"))
            .start()
          try (0L until 3L).foreach { e =>
            stream.addData(docs.filter(_._1 % 3 == e).toIndexedSeq: _*)
            q.processAllAvailable()
          } finally q.stop()
          collectAndClean(s, s.read.parquet(s"$tmp/out").orderBy("doc_id"), tmp)
        }
      },
      // a doc survives iff its epoch is the FIRST epoch its content
      // appears in AND it is the min doc_id of that content within the
      // epoch (in-batch winner) — the cross-batch index probe in SQL form
      Some(s"""WITH fp AS (SELECT doc_id, doc_id % 3 AS epoch,
              |    md5(${duckNorm("text")}) AS f FROM documents),
              |w AS (SELECT f, epoch, min(doc_id) AS keep FROM fp GROUP BY 1, 2),
              |fe AS (SELECT f, min(epoch) AS first_epoch FROM fp GROUP BY 1)
              |SELECT w.keep AS doc_id, w.epoch::BIGINT AS epoch
              |FROM w JOIN fe ON w.f = fe.f AND w.epoch = fe.first_epoch
              |ORDER BY doc_id""".stripMargin)),

    Q("s12_stream_url_ingest",
      (s, d) => {
        val m = mgr(s, d)
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        // the crawl-frontier loop through the gate (r15): three
        // MemoryStream epochs of messy URLs (epoch = doc_id mod 3),
        // canonical-URL-deduped ingest against the epoch-partitioned
        // fingerprint index; final corpus = union of per-epoch sink
        // deliveries. hostMod 5 makes raw spellings genuinely collide
        // after normalization across AND within epochs.
        val docs = m.getDDFByName("documents").df
          .select(col("doc_id"), syntheticUrl(5).as("url"))
          .as[(Long, String)].collect()
        withScratch("graft_s12") { tmp =>
          val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
          val q = streaming.CurationStreams.urlDedupIngest(
              stream.toDF().toDF("doc_id", "url"), "url", "doc_id", s"$tmp/index",
              (df, epoch) => df.select(col("doc_id"), lit(epoch).as("epoch"))
                .write.mode("append").parquet(s"$tmp/out"))
            .start()
          try (0L until 3L).foreach { e =>
            stream.addData(docs.filter(_._1 % 3 == e).toIndexedSeq: _*)
            q.processAllAvailable()
          } finally q.stop()
          collectAndClean(s, s.read.parquet(s"$tmp/out").orderBy("doc_id"), tmp)
        }
      },
      // a doc is delivered iff its epoch is the FIRST epoch its CANONICAL
      // url appears in AND it is the min doc_id of that url within the
      // epoch — the cross-batch index probe in SQL form over the same
      // normalization chain as w01/w04
      Some(s"""WITH u AS (SELECT doc_id, doc_id % 3 AS epoch,
              |    ${duckUrlRaw(5)} AS url FROM documents),
              |$duckUrlNormCtes,
              |fp AS (SELECT doc_id, epoch, md5(url_norm) AS f FROM p5
              |  WHERE url_norm IS NOT NULL),
              |w AS (SELECT f, epoch, min(doc_id) AS keep FROM fp GROUP BY 1, 2),
              |fe AS (SELECT f, min(epoch) AS first_epoch FROM fp GROUP BY 1)
              |SELECT w.keep AS doc_id, w.epoch::BIGINT AS epoch
              |FROM w JOIN fe ON w.f = fe.f AND w.epoch = fe.first_epoch
              |ORDER BY doc_id""".stripMargin)),

    Q("s11_stream_agg_rollup",
      (s, d) => {
        val m = mgr(s, d); val _ = m
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        // continuous rollup maintenance through the gate: two MemoryStream
        // epochs (epoch = event_id mod 2), each stores ONLY its O(groups)
        // finished partial; the rollup read folds the partials — never
        // the event history. Oracle: the direct aggregate over ALL events
        // (the mergeAggregates identity, here exercised epoch-wise).
        val spec = "event_type, n=count(*), sv=sum(value), mx=max(value)"
        val ev = loadEvents(s, d)
          .select(col("event_id"), col("event_type"), col("value"))
          .as[(Long, String, Double)].collect()
        withScratch("graft_s11") { tmp =>
          val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Double)]
          val q = streaming.CurationStreams.aggMaintain(
              stream.toDF().toDF("event_id", "event_type", "value"),
              spec, s"$tmp/rollup")
            .start()
          try (0L until 2L).foreach { e =>
            stream.addData(ev.filter(_._1 % 2 == e).toIndexedSeq: _*)
            q.processAllAvailable()
          } finally q.stop()
          collectAndClean(s,
            streaming.CurationStreams.readRollup(s, s"$tmp/rollup", spec)
              .select(col("event_type"), col("n"),
                round(col("sv"), 6).as("sv"), round(col("mx"), 6).as("mx"))
              .orderBy("event_type"), tmp)
        }
      },
      Some("""SELECT event_type, count(*)::BIGINT AS n,
             |  round(sum(value), 6) AS sv, round(max(value), 6) AS mx
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("s06_stream_neardup_ingest",
      (s, d) => {
        val m = mgr(s, d)
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        // streaming twin of d10 through the gate: epoch 0 = docs < 250,
        // epoch 1 = the rest; portable minhash so DuckDB replays every
        // stage. The index holds band rows of epoch-0 SURVIVORS only
        // (unlike d10's all-old-docs index), and the oracle mirrors that.
        val docs = m.getDDFByName("documents").df
          .select(col("doc_id"), col("text")).as[(Long, String)].collect()
        withScratch("graft_s06") { tmp =>
          val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
          val q = streaming.CurationStreams.nearDupIngest(
              stream.toDF().toDF("doc_id", "text"), "text", "doc_id", s"$tmp/index",
              (df, epoch) => df.select(col("doc_id"), lit(epoch).as("epoch"))
                .write.mode("append").parquet(s"$tmp/out"),
              threshold = 0.5, portable = true)
            .start()
          try Seq(docs.filter(_._1 < 250), docs.filter(_._1 >= 250)).foreach { batch =>
            stream.addData(batch.toIndexedSeq: _*)
            q.processAllAvailable()
          } finally q.stop()
          collectAndClean(s, s.read.parquet(s"$tmp/out").orderBy("doc_id"), tmp)
        }
      },
      Some(s"""WITH ${duckMinhashCtes("documents")},
              |l0 AS (SELECT DISTINCT id2 FROM mpairs
              |  WHERE jr >= 0.5 AND id1 < 250 AND id2 < 250),
              |s0 AS (SELECT doc_id FROM documents WHERE doc_id < 250
              |  AND doc_id NOT IN (SELECT id2 FROM l0)),
              |l1 AS (SELECT DISTINCT id2 FROM mpairs
              |  WHERE jr >= 0.5 AND id1 >= 250 AND id2 >= 250),
              |s1i AS (SELECT doc_id FROM documents WHERE doc_id >= 250
              |  AND doc_id NOT IN (SELECT id2 FROM l1)),
              |x1 AS (SELECT DISTINCT s.doc_id FROM msig s
              |  JOIN msig i ON s.band = i.band AND s.sig = i.sig
              |  WHERE s.doc_id IN (SELECT doc_id FROM s1i)
              |    AND i.doc_id IN (SELECT doc_id FROM s0))
              |SELECT doc_id, 0::BIGINT AS epoch FROM s0
              |UNION ALL
              |SELECT doc_id, 1::BIGINT AS epoch FROM s1i
              |  WHERE doc_id NOT IN (SELECT doc_id FROM x1)
              |ORDER BY doc_id""".stripMargin)),

    Q("s08_stream_quota_ingest",
      (s, d) => {
        val m = mgr(s, d)
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        // streaming twin of q94 through the gate: two MemoryStream
        // epochs (doc_id < 250 arrives first), per-source char quotas
        // enforced across the stream's LIFETIME via the epoch-
        // partitioned spend ledger — epoch 1's admissions run against
        // budget minus epoch 0's admitted spend. Admission is epoch-by-
        // epoch prefix-greedy (the only order a stream has), which the
        // oracle replays as two stacked per-epoch windows joined through
        // the per-source spent sums.
        val docs = m.getDDFByName("documents").df
          .select(col("doc_id"), col("source"), col("n_chars"))
          .as[(Long, String, Long)].collect()
        withScratch("graft_s08") { tmp =>
          val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long)]
          val q = streaming.CurationStreams.quotaIngest(
              stream.toDF().toDF("doc_id", "source", "n_chars"), "source",
              Seq(col("n_chars").desc, col("doc_id").asc), "n_chars",
              budgets = Map("src1" -> 5000L, "src7" -> 0L),
              defaultBudget = 3000L, s"$tmp/ledger",
              (df, epoch) => df.select(col("doc_id"), col("source"),
                  col("n_chars"), lit(epoch).as("epoch"))
                .write.mode("append").parquet(s"$tmp/out"))
            .start()
          try Seq(docs.filter(_._1 < 250), docs.filter(_._1 >= 250)).foreach { batch =>
            stream.addData(batch.toIndexedSeq: _*)
            q.processAllAvailable()
          } finally q.stop()
          collectAndClean(s, s.read.parquet(s"$tmp/out").orderBy("doc_id"), tmp)
        }
      },
      // epoch 0 admits per q94's window against the full budget; epoch 1
      // admits against budget - epoch-0 spend. A source's lifetime
      // admitted total never exceeds its budget by construction.
      Some("""WITH bud AS (SELECT DISTINCT source,
             |    CASE source WHEN 'src1' THEN 5000 WHEN 'src7' THEN 0
             |                ELSE 3000 END AS b FROM documents),
             |a0 AS (SELECT doc_id, source, n_chars FROM (
             |    SELECT doc_id, source, n_chars, sum(n_chars) OVER (
             |      PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rs
             |    FROM documents WHERE doc_id < 250) r
             |  JOIN bud USING (source) WHERE rs <= b),
             |sp AS (SELECT source, sum(n_chars) AS spent FROM a0 GROUP BY 1),
             |a1 AS (SELECT doc_id, source, n_chars FROM (
             |    SELECT doc_id, source, n_chars, sum(n_chars) OVER (
             |      PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rs
             |    FROM documents WHERE doc_id >= 250) r
             |  JOIN bud USING (source) LEFT JOIN sp USING (source)
             |  WHERE rs <= b - coalesce(spent, 0))
             |SELECT doc_id, source, n_chars, 0::BIGINT AS epoch FROM a0
             |UNION ALL
             |SELECT doc_id, source, n_chars, 1::BIGINT AS epoch FROM a1
             |ORDER BY doc_id""".stripMargin)),

    Q("s09_stream_ann_ingest",
      (s, d) => {
        val m = mgr(s, d)
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        // streaming twin of a10/a11's index build through the gate: two
        // MemoryStream epochs (vec_id parity), each assigned to the same
        // frozen 16 centroids and appended to the cell-partitioned int8
        // index. Assignment is a pure function of (vector, centroids),
        // so streamed-in-any-epoch ≡ rebuilt-at-once — the oracle replays
        // the assignment over ALL vectors and derives epoch from the
        // parity split. The collect is the MemoryStream test-source
        // contract (driver-fed stream), not an operator shape.
        val all = m.getDDFByName("embeddings").df
        val centroids = all.filter(col("vec_id") < 16).orderBy("vec_id")
          .select("embedding").collect()
          .map(_.getSeq[Float](0).toArray.map(_.toDouble))
        val vecs = all.select(col("vec_id"), col("embedding"))
          .as[(Long, Array[Float])].collect()
        withScratch("graft_s09") { tmp =>
          val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Float])]
          val q = streaming.CurationStreams.annIngest(
              stream.toDF().toDF("vec_id", "embedding"), "embedding", "vec_id",
              centroids, s"$tmp/index")
            .start()
          try Seq(vecs.filter(_._1 % 2 == 0), vecs.filter(_._1 % 2 == 1)).foreach { batch =>
            stream.addData(batch.toIndexedSeq: _*)
            q.processAllAvailable()
          } finally q.stop()
          collectAndClean(s,
            s.read.parquet(s"$tmp/index")
              .select(col("id"), col("cell"), col("epoch")).orderBy("id"), tmp)
        }
      },
      // a10's assignment replay (argmax(dot − ‖c‖²/2), ties → HIGHER
      // cell) over every vector; epoch = arrival batch = id parity
      Some("""WITH dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
             |            FROM embeddings),
             |cents AS (SELECT vec_id AS cell, v AS cv FROM dv WHERE vec_id < 16)
             |SELECT id, cell, id % 2 AS epoch FROM (
             |  SELECT d.vec_id AS id, c.cell,
             |    row_number() OVER (PARTITION BY d.vec_id ORDER BY
             |      list_dot_product(d.v, c.cv) - list_dot_product(c.cv, c.cv) / 2.0 DESC,
             |      c.cell DESC) AS rn
             |  FROM dv d CROSS JOIN cents c)
             |WHERE rn = 1 ORDER BY id""".stripMargin)),

    Q("s10_stream_psi_monitor",
      (s, d) => {
        // serve-time drift alarm, batch==stream code path: freeze the
        // reference histogram on the even-event slice, score every
        // hourly window of the full feed. One windowed aggregation
        // (per-bin conditional counts), PSI folds bins in ascending
        // order — the oracle replicates the exact fold, so psi and the
        // 0.25 alarm are bit-identical, with round(6) as belt+braces
        val ev = loadEvents(s, d)
        val spec = Stats.histogramSpec(
          ev.filter(col("event_id") % 2 === 0), "value", nBins = 8)
        streaming.EventStreams.psiMonitor(ev, "value", spec,
            windowLen = "1 hour")
          .select(unix_timestamp(col("window_start")).as("window_epoch"),
            col("n_events"), round(col("psi"), 6).as("psi"), col("drifted"))
          .orderBy("window_epoch")
      },
      Some("""WITH ev AS (SELECT cast(epoch(date_trunc('hour', ts)) AS bigint) AS wstart,
             |    value::DOUBLE AS v FROM events WHERE value IS NOT NULL),
             |ref AS (SELECT value::DOUBLE AS v FROM events
             |  WHERE event_id % 2 = 0 AND value IS NOT NULL),
             |b AS (SELECT min(v) AS lo,
             |    CASE WHEN (max(v) - min(v)) / 8 > 0
             |         THEN (max(v) - min(v)) / 8 ELSE 1.0 END AS w,
             |    count(*)::DOUBLE AS rn FROM ref),
             |rcnt AS (SELECT least(greatest(floor((v - lo) / w), 0), 7)::BIGINT AS bin,
             |    count(*)::DOUBLE AS rc FROM ref, b GROUP BY 1),
             |bins AS (SELECT unnest(range(8))::BIGINT AS bin),
             |rall AS (SELECT bin,
             |    greatest(coalesce(rc, 0.0) / (SELECT rn FROM b), 1e-6) AS r
             |  FROM bins LEFT JOIN rcnt USING (bin)),
             |wcnt AS (SELECT wstart, least(greatest(floor((v - lo) / w), 0), 7)::BIGINT AS bin,
             |    count(*)::BIGINT AS c FROM ev, b GROUP BY 1, 2),
             |wn AS (SELECT wstart, sum(c)::BIGINT AS n FROM wcnt GROUP BY 1),
             |terms AS (SELECT wn.wstart, rall.bin, wn.n,
             |    greatest(coalesce(wcnt.c, 0)::DOUBLE / wn.n::DOUBLE, 1e-6) AS p,
             |    rall.r
             |  FROM wn CROSS JOIN rall
             |  LEFT JOIN wcnt ON wcnt.wstart = wn.wstart AND wcnt.bin = rall.bin)
             |SELECT wstart AS window_epoch, n AS n_events,
             |  round(list_reduce(list_prepend(0.0,
             |      list((p - r) * ln(p / r) ORDER BY bin)), (a, x) -> a + x), 6) AS psi,
             |  list_reduce(list_prepend(0.0,
             |      list((p - r) * ln(p / r) ORDER BY bin)), (a, x) -> a + x) > 0.25
             |    AS drifted
             |FROM terms GROUP BY wstart, n ORDER BY window_epoch""".stripMargin)),

    Q("s07_stream_image_ingest",
      (s, d) => {
        val m = mgr(s, d)
        import s.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
        // streaming perceptual-dedup image ingest through the gate: the
        // m05 pattern corpus (dHash = known 64-bit literal per id % 6)
        // split into two MemoryStream epochs by id parity. Epoch-0
        // survivors are the first id of each even-class pattern (0, 2,
        // 4); epoch 1 must drop its exact in-batch dups AND both
        // cross-epoch near-dups — id 1 (Hamming 1 from indexed id 0)
        // and id 3 (Hamming 2 from indexed id 4) — leaving only id 5.
        // The oracle replays everything from the pattern literals:
        // all-pairs bit_count in SQL (complete banding at
        // maxHamming < bands makes the band filter transparent).
        val docIds = m.getDDFByName("documents").df
          .filter(col("doc_id") < 24).select("doc_id")
          .collect().map(_.getLong(0)).toSeq.sorted
        val imgs = patternImages(docIds)
        withScratch("graft_s07") { tmp =>
          val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Byte])]
          val q = streaming.CurationStreams.imageDedupIngest(
              stream.toDF().toDF("id", "payload"), "id", "payload", s"$tmp/index",
              (df, epoch) => df.select(col("id"), lit(epoch).as("epoch"))
                .write.mode("append").parquet(s"$tmp/out"))
            .start()
          try (0L until 2L).foreach { e =>
            stream.addData(imgs.filter(_._1 % 2 == e).toIndexedSeq: _*)
            q.processAllAvailable()
          } finally q.stop()
          collectAndClean(s, s.read.parquet(s"$tmp/out").orderBy("id"), tmp)
        }
      },
      Some("""WITH pat(k, p) AS (VALUES
             |  (0, 4348954285570149135::BIGINT), (1, 4348954285570149134::BIGINT),
             |  (2, 4348954287449197327::BIGINT), (3, 1317473026990674775::BIGINT),
             |  (4, 1317473026990674772::BIGINT), (5, 6510615555426900570::BIGINT)),
             |imgs AS MATERIALIZED (
             |  SELECT doc_id AS id, doc_id % 2 AS epoch, p FROM documents
             |  JOIN pat ON pat.k = doc_id % 6 WHERE doc_id < 24),
             |s0 AS MATERIALIZED (
             |  SELECT a.id, a.epoch, a.p FROM imgs a
             |  WHERE a.epoch = 0 AND NOT EXISTS (
             |    SELECT 1 FROM imgs b WHERE b.epoch = 0 AND b.id < a.id
             |      AND bit_count(xor(a.p, b.p)) <= 2)),
             |s1 AS MATERIALIZED (
             |  SELECT a.id, a.epoch, a.p FROM imgs a
             |  WHERE a.epoch = 1
             |    AND NOT EXISTS (
             |      SELECT 1 FROM imgs b WHERE b.epoch = 1 AND b.id < a.id
             |        AND bit_count(xor(a.p, b.p)) <= 2)
             |    AND NOT EXISTS (
             |      SELECT 1 FROM s0 WHERE bit_count(xor(a.p, s0.p)) <= 2))
             |SELECT id, epoch::BIGINT AS epoch FROM s0
             |UNION ALL SELECT id, epoch::BIGINT FROM s1
             |ORDER BY id""".stripMargin)),

    Q("p01_pipeline_e2e",
      (s, d) => {
        val m = mgr(s, d)
        // End-to-end training-data curation: quality gate → exact dedup
        // (keep min id per normalized-text fingerprint) → near-dup
        // removal (portable MinHash-LSH pairs at J ≥ 0.7; drop the
        // higher id of each pair) → per-language doc/token stats.
        // Every stage is deterministic, so the WHOLE pipeline is
        // replicated in DuckDB below. Quality threshold 0.55 has 0.0085
        // margin to the nearest doc at sf0.01 — far above cross-engine
        // fp noise on the unrounded score.
        val docs = m.getDDFByName("documents").df
        val enr = pipeline.TextAnalysis.enrich(docs, "text")
          .select("doc_id", "lang", "text", "token_count", "quality")
        val qual = enr.filter(col("quality") >= 0.55)
        val surv = pipeline.Dedup.exactSurvivors(qual, "text", "doc_id")
        val pairs = pipeline.Dedup.minhashDedup(surv, "text", "doc_id",
          threshold = 0.7, portable = true)
        val dups = pairs.select(col("id2").as("doc_id")).distinct()
        surv.join(dups, Seq("doc_id"), "left_anti")
          .groupBy("lang").agg(count(lit(1)).as("n_docs"),
            sum("token_count").as("sum_tokens"))
          .orderBy("lang")
      },
      Some(s"""WITH enr AS (SELECT doc_id, lang, text,
              |    ${duckTokenCount("text")} AS token_count,
              |    ${duckQuality("text")} AS quality
              |  FROM documents),
              |qual AS (SELECT * FROM enr WHERE quality >= 0.55),
              |reps AS (SELECT min(doc_id) AS doc_id FROM qual
              |  GROUP BY md5(${duckNorm("text")})),
              |surv AS (SELECT q.* FROM qual q JOIN reps USING (doc_id)),
              |${duckMinhashCtes("surv")},
              |dups AS (SELECT DISTINCT id2 AS doc_id FROM mpairs WHERE jr >= 0.7)
              |SELECT lang, count(*) AS n_docs, sum(token_count)::BIGINT AS sum_tokens
              |FROM surv WHERE doc_id NOT IN (SELECT doc_id FROM dups)
              |GROUP BY lang ORDER BY lang""".stripMargin)),

    Q("ml01_kmeans",
      (s, d) => {
        val m = mgr(s, d)
        import s.implicits._
        val emb = m.getDDFByName("embeddings").df
        // ML6 made oracle-exact by the a03 fixed-centroid move: k-means||
        // init is engine RNG (that path stays spec-checked in MLSpec), so
        // seed Lloyd from the first 5 corpus vectors and run 2
        // deterministic update rounds. 5×64 doubles — config-size driver
        // collect, not data-scale.
        val init = emb.filter(col("vec_id") < 5).orderBy("vec_id")
          .select("embedding").collect()
          .map(_.getSeq[Float](0).toArray.map(_.toDouble))
        val (assigned, cents) = ml.MLSupport.lloydKMeans(emb, "embedding", "vec_id",
          init, rounds = 2)
        val cdf = s.createDataset(cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) })
          .toDF("cell", "cv")
        // per-cluster size + mean squared distance to the FINAL centroid,
        // written in the oracle's exact operand order
        // (dot(v,v) − 2·dot(v,c) + dot(c,c))
        assigned.join(broadcast(cdf), "cell")
          .withColumn("__sq",
            functions.VectorFunctions.dot(col("v"), col("v"))
              - lit(2.0) * functions.VectorFunctions.dot(col("v"), col("cv"))
              + functions.VectorFunctions.dot(col("cv"), col("cv")))
          .groupBy(col("cell").cast("bigint").as("cluster"))
          .agg(count(lit(1)).as("n"), round(avg(col("__sq")), 6).as("avg_sqdist"))
          .orderBy("cluster")
      },
      // Mirror of the whole Lloyd loop: assignment = argmax(dot − ‖c‖²/2)
      // with ties → HIGHER cell (nearestCell's array_max order), centroid
      // update = per-dimension round(avg, 6) — rounding on BOTH sides
      // makes each round's centroid literals cross-engine identical, so
      // the engines' partial-sum orders can't drift the next assignment.
      // Empty cells keep the previous centroid (the LEFT JOIN coalesce).
      Some {
        def assignCte(name: String, from: String) =
          s"""$name AS (SELECT id, v, cell FROM (
             |    SELECT d.id, d.v, c.cell,
             |      row_number() OVER (PARTITION BY d.id ORDER BY
             |        list_dot_product(d.v, c.cv) - list_dot_product(c.cv, c.cv) / 2.0 DESC,
             |        c.cell DESC) AS rn
             |    FROM dv d CROSS JOIN $from c) WHERE rn = 1)""".stripMargin
        val rounds = (1 to 2).map { r =>
          s"""${assignCte(s"a$r", s"c${r - 1}")},
             |m$r AS (SELECT cell, pos, round(avg(v[pos + 1]), 6) AS m
             |  FROM a$r, unnest(range(0, 64)) AS u(pos) GROUP BY cell, pos),
             |n$r AS (SELECT cell, list(m ORDER BY pos) AS cv FROM m$r GROUP BY cell),
             |c$r AS (SELECT p.cell, coalesce(n.cv, p.cv) AS cv
             |  FROM c${r - 1} p LEFT JOIN n$r n ON p.cell = n.cell)""".stripMargin
        }.mkString(",\n")
        s"""WITH dv AS (SELECT vec_id AS id,
           |    list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
           |c0 AS (SELECT id AS cell, v AS cv FROM dv WHERE id < 5),
           |$rounds,
           |${assignCte("af", "c2")}
           |SELECT a.cell::BIGINT AS cluster, count(*) AS n,
           |  round(avg(list_dot_product(a.v, a.v) - 2 * list_dot_product(a.v, c.cv)
           |    + list_dot_product(c.cv, c.cv)), 6) AS avg_sqdist
           |FROM af a JOIN c2 c ON a.cell = c.cell
           |GROUP BY a.cell ORDER BY cluster""".stripMargin
      }),

    Q("ml02_linreg",
      (s, d) => {
        val m = mgr(s, d)
        import s.implicits._
        val li = m.getDDFByName("lineitem")
        val model = ml.MLSupport.train(li, "mlr", Seq("l_quantity"), "l_extendedprice")
        val scored = ml.MLSupport.applyModel(li, model)
        val r2 = ml.MLSupport.r2Score(scored.df, "l_extendedprice")
        val lm = model.model.asInstanceOf[org.apache.spark.ml.regression.LinearRegressionModel]
        Seq((math.round(lm.coefficients(0)), math.round(lm.intercept),
          math.round(r2 * 100) / 100.0)).toDF("slope", "intercept", "r2")
      },
      // Spark's LinearRegression with defaults (regParam=0, fitIntercept,
      // normal solver for 1 feature) IS ordinary least squares, so the
      // closed-form regr_* aggregates are an exact oracle; rounding absorbs
      // solver fp noise (checked margins: ≥0.016 abs / 3e-7 rel at sf0.01).
      Some("""SELECT round(regr_slope(l_extendedprice, l_quantity))::BIGINT AS slope,
             |  round(regr_intercept(l_extendedprice, l_quantity))::BIGINT AS intercept,
             |  round(regr_r2(l_extendedprice, l_quantity) * 100) / 100 AS r2
             |FROM lineitem""".stripMargin)),

    Q("ml03_cv_membership",
      (s, d) => {
        val m = mgr(s, d)
        // ML7 through the real API: cvKFold's k test bands, emitted as
        // (fold, id) membership pairs. Fold assignment is the xor-fold
        // hash of (id + seed) — exact integer arithmetic that DuckDB
        // replicates verbatim, so CV membership itself is oracle-checked
        // (the round-4 VERDICT ask; the old rand()-band path was
        // engine-RNG and spec-only by nature).
        val folds = ml.MLSupport.cvKFold(m.getDDFByName("orders"), 5, "o_orderkey", seed = 11)
        folds.zipWithIndex.map { case ((_, test), i) =>
          test.select(lit(i.toLong).as("fold"), col("o_orderkey"))
        }.reduce(_.unionAll(_)).orderBy("fold", "o_orderkey")
      },
      Some("""SELECT xor(((o_orderkey + 11) % 1000000000) * 2654435761,
             |           (((o_orderkey + 11) % 1000000000) * 2654435761) >> 31) % 5 AS fold,
             |  o_orderkey
             |FROM orders ORDER BY fold, o_orderkey""".stripMargin)),

    Q("ml04_confusion",
      (s, d) => {
        val m = mgr(s, d)
        import s.implicits._
        // ML8 oracle-checked: score lineitem with the ml02 closed-form
        // OLS model at INTEGER-ROUNDED coefficients (slope/intercept are
        // oracle-exact there; rounding makes the scoring arithmetic
        // bit-identical cross-engine — integer × integer-valued double),
        // then count the (label≥t, pred≥t) confusion cells through the
        // real confusionMatrix API. The synthetic lineitem has near-zero
        // qty→price correlation (slope 7, intercept 52872), so preds span
        // only [52879, 53222] — the threshold must sit INSIDE that band
        // to populate all four cells. 53050 does (measured cells ~15k
        // each at sf0.01) with integer preds ≥3 away from it; the label
        // side compares the same parquet doubles in both engines.
        val li = m.getDDFByName("lineitem")
        val model = ml.MLSupport.train(li, "mlr", Seq("l_quantity"), "l_extendedprice")
        val lm = model.model.asInstanceOf[org.apache.spark.ml.regression.LinearRegressionModel]
        val slope = math.round(lm.coefficients(0))
        val icept = math.round(lm.intercept)
        val scored = li.df.withColumn("yPredict",
          lit(slope) * col("l_quantity") + lit(icept))
        val cells = ml.MLSupport.confusionMatrix(scored, "l_extendedprice", "yPredict", 53050.0)
        cells.toSeq.map { case ((t, p), n) => (t, p, n) }
          .toDF("is_pos", "pred_pos", "n").orderBy("is_pos", "pred_pos")
      },
      Some("""WITH coef AS (SELECT
             |    round(regr_slope(l_extendedprice, l_quantity))::BIGINT AS s,
             |    round(regr_intercept(l_extendedprice, l_quantity))::BIGINT AS i
             |  FROM lineitem)
             |SELECT l_extendedprice >= 53050.0 AS is_pos,
             |  (s * l_quantity + i) >= 53050.0 AS pred_pos,
             |  count(*) AS n
             |FROM lineitem, coef
             |GROUP BY 1, 2 ORDER BY is_pos, pred_pos""".stripMargin)),

    Q("ml05_ridge_quality",
      (s, d) => {
        val m = mgr(s, d)
        import s.implicits._
        // The quality-classifier loop oracle-checked END-TO-END: t11's
        // hashing-trick featurization (two hashed buckets as the fixed
        // feature set) → closed-form ridge on exact integer sufficient
        // statistics (MLSupport.ridgeClosedForm2 — the deterministic
        // twin of the SVM training MLSpec covers) → ML8 confusionMatrix
        // on milli-unit INTEGER predictions. Every stage is replicated
        // in DuckDB; see ridgeClosedForm2's determinism contract.
        // Label y = token count (the simplest deterministic quality
        // signal); threshold 55 sits at the fixture's median (measured
        // cells 234/11/28/227 at sf0.01, min integer margin to the
        // threshold 876 milli-units).
        val docs = m.getDDFByName("documents").df
        val feats = pipeline.TextAnalysis.hashedTokenFeatures(
          docs, "text", "doc_id", dim = 8)
        def bucket(i: Int) = coalesce(
          when(array_position(col("indices"), i) > 0,
            element_at(col("vals"), array_position(col("indices"), i).cast("int"))),
          lit(0.0))
        val base = docs
          .select(col("doc_id"),
            expr(s"size(${pipeline.TextAnalysis.tokensExpr("text")})").cast("long").as("y"))
          .join(feats.select(col("id").as("doc_id"),
            bucket(1).cast("long").as("x1"), bucket(2).cast("long").as("x2")),
            Seq("doc_id"))
        val w = ml.MLSupport.ridgeClosedForm2(base, "x1", "x2", "y", lambda = 1.0)
        val scored = base
          .withColumn("pred_millis",
            (lit(w.w1Milli) * col("x1") + lit(w.w2Milli) * col("x2") + lit(w.bMilli))
              .cast("double"))
          .withColumn("y_millis", (col("y") * 1000L).cast("double"))
        val cells = ml.MLSupport.confusionMatrix(scored, "y_millis", "pred_millis", 55000.0)
        cells.toSeq.map { case ((t, p), nn) =>
            (w.w1Milli, w.w2Milli, w.bMilli, t, p, nn) }
          .toDF("w1_milli", "w2_milli", "b_milli", "is_pos", "pred_pos", "n")
          .orderBy("is_pos", "pred_pos")
      },
      Some(s"""WITH t AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
              |ex AS (SELECT doc_id, unnest(tk) AS token FROM t),
              |hb AS (SELECT doc_id,
              |    (list_reduce(list_prepend(0::BIGINT,
              |       list_transform(regexp_split_to_array(token, ''),
              |         c -> coalesce(ascii(c), 0)::BIGINT)),
              |     (acc, x) -> (acc * 31 + x) % 1000000007) % 8) AS bucket
              |  FROM ex),
              |f0 AS (SELECT doc_id,
              |    sum(CASE WHEN bucket = 1 THEN 1 ELSE 0 END) AS x1,
              |    sum(CASE WHEN bucket = 2 THEN 1 ELSE 0 END) AS x2
              |  FROM hb GROUP BY doc_id),
              |f AS (SELECT t.doc_id, coalesce(f0.x1, 0)::BIGINT AS x1,
              |    coalesce(f0.x2, 0)::BIGINT AS x2, len(t.tk)::BIGINT AS y
              |  FROM t LEFT JOIN f0 USING (doc_id)),
              |s AS (SELECT count(*)::DOUBLE AS n,
              |    sum(x1)::DOUBLE AS sx1, sum(x2)::DOUBLE AS sx2, sum(y)::DOUBLE AS sy,
              |    sum(x1*x1)::DOUBLE AS s11, sum(x1*x2)::DOUBLE AS s12,
              |    sum(x2*x2)::DOUBLE AS s22,
              |    sum(x1*y)::DOUBLE AS s1y, sum(x2*y)::DOUBLE AS s2y FROM f),
              |w AS (SELECT s11 - sx1*sx1/n AS c11, s12 - sx1*sx2/n AS c12,
              |    s22 - sx2*sx2/n AS c22, s1y - sx1*sy/n AS c1y,
              |    s2y - sx2*sy/n AS c2y, n, sx1, sx2, sy FROM s),
              |w2 AS (SELECT
              |    ((c22 + 1.0) * c1y - c12 * c2y)
              |      / ((c11 + 1.0) * (c22 + 1.0) - c12 * c12) AS w1,
              |    ((c11 + 1.0) * c2y - c12 * c1y)
              |      / ((c11 + 1.0) * (c22 + 1.0) - c12 * c12) AS w2,
              |    n, sx1, sx2, sy FROM w),
              |ww AS (SELECT CAST(floor(w1*1000 + 0.5) AS BIGINT) AS w1m,
              |    CAST(floor(w2*1000 + 0.5) AS BIGINT) AS w2m,
              |    CAST(floor((sy/n - w1*(sx1/n) - w2*(sx2/n))*1000 + 0.5) AS BIGINT) AS bm
              |  FROM w2)
              |SELECT ww.w1m AS w1_milli, ww.w2m AS w2_milli, ww.bm AS b_milli,
              |  (f.y * 1000 >= 55000) AS is_pos,
              |  (ww.w1m * f.x1 + ww.w2m * f.x2 + ww.bm >= 55000) AS pred_pos,
              |  count(*) AS n
              |FROM f, ww GROUP BY 1, 2, 3, 4, 5 ORDER BY is_pos, pred_pos""".stripMargin)),

    Q("ml06_als_topk",
      (s, d) => {
        // ML5 ALS finally gate-checked (round-9 verdict ask #6): the
        // factor matrices themselves are engine-RNG (spec-only in MLSpec,
        // like the reference's FlinkML ALS), but on a ratings matrix that
        // IS low-rank the fitted model must recover the true per-user
        // ARGMAX over held-out items wherever the true margin is wide —
        // that invariant is deterministic and the oracle computes it in
        // closed form. Ratings live on a config-sized customer×nation key
        // grid (50×25 — driver-side small by construction, like ml01's
        // centroid matrix) with INTEGER-valued structure, rank 2 exactly:
        //   r10(u,i) = 10 + (1 + u%4)·((i%5)·4) + ((u%3)−1)·(((i·7)%9)·3)
        //   rating   = r10 / 10  ∈ [~0.3, ~7]
        // Cells with (u+i)%4==0 are held out; ALS (rank 6 ≥ the true
        // matrix rank 3, 40 iters, reg 0.01, fixed seed) predicts them.
        // Output: top-1 held-out item per user, for users whose true
        // best-vs-second margin ≥ 8 r10-units. Thresholds measured in
        // tools/ProbeAls: at the pinned config max |pred − true| is 0.23
        // rating units (2.3 r10), so even two worst-case errors (4.6)
        // cannot invert an 8-unit margin; every user at margin ≥ 4
        // already agreed, and the only disagreements were the margin-0
        // exact ties (where argmax is genuinely arbitrary). Weaker
        // configs DO break this gate — rank 4 at 20 iters mis-ranks
        // 12/50 users — which is exactly the drift-detection the round-9
        // verdict asked for. The margin gate uses the TRUE integer
        // ratings on both sides, so the query is hash-exact.
        val m = mgr(s, d)
        val custs = m.getDDFByName("customer").df
          .filter(col("c_custkey") <= 50)
          .select(col("c_custkey").cast("int").as("user_id"))
        val nats = m.getDDFByName("nation").df
          .select(col("n_nationkey").cast("int").as("item"))
        val grid = custs.crossJoin(nats) // 50×25 key grid: config-sized
          .withColumn("r10",
            lit(10) + (lit(1) + col("user_id") % 4) * ((col("item") % 5) * lit(4))
              + ((col("user_id") % 3) - lit(1)) * (((col("item") * 7) % 9) * lit(3)))
          .withColumn("rating", col("r10").cast("double") / 10.0)
        val train = grid.filter((col("user_id") + col("item")) % 4 =!= 0)
        val hold = grid.filter((col("user_id") + col("item")) % 4 === 0)
        val model = ml.MLSupport.train(
          m.getDDFByName("customer").derive(train), "als", Nil,
          params = Map("userCol" -> "user_id", "itemCol" -> "item",
            "ratingCol" -> "rating", "rank" -> 6, "maxIter" -> 40,
            "regParam" -> 0.01, "seed" -> 7L))
        val pred = ml.MLSupport.applyModel(
          m.getDDFByName("customer").derive(hold), model).df
        val wp = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("yPredict").desc, col("item"))
        val top = pred.withColumn("rn", row_number().over(wp))
          .filter(col("rn") === 1).select(col("user_id"), col("item").as("top_item"))
        val wt = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("r10").desc, col("item"))
        val wide = hold.withColumn("rn", row_number().over(wt))
          .groupBy("user_id")
          .agg((max(when(col("rn") === 1, col("r10")))
            - max(when(col("rn") === 2, col("r10")))).as("margin"))
          .filter(col("margin") >= 8)
          .select("user_id")
        top.join(wide, "user_id").orderBy("user_id")
      },
      Some("""WITH u AS (SELECT c_custkey::INT AS user_id FROM customer
             |           WHERE c_custkey <= 50),
             |i AS (SELECT n_nationkey::INT AS item FROM nation),
             |g AS (SELECT user_id, item,
             |    10 + (1 + user_id % 4) * ((item % 5) * 4)
             |       + ((user_id % 3) - 1) * (((item * 7) % 9) * 3) AS r10
             |  FROM u CROSS JOIN i),
             |h AS (SELECT * FROM g WHERE (user_id + item) % 4 = 0),
             |rk AS (SELECT user_id, item, r10, row_number() OVER (
             |    PARTITION BY user_id ORDER BY r10 DESC, item) AS rn FROM h),
             |m AS (SELECT user_id,
             |    max(CASE WHEN rn = 1 THEN item END) AS top_item,
             |    max(CASE WHEN rn = 1 THEN r10 END)
             |      - max(CASE WHEN rn = 2 THEN r10 END) AS margin
             |  FROM rk GROUP BY user_id)
             |SELECT user_id, top_item FROM m WHERE margin >= 8
             |ORDER BY user_id""".stripMargin)),

    Q("ml07_svm_separable",
      (s, d) => {
        // ML3 SVM gate-checked (round-9 verdict ask #6): the hinge-loss
        // optimizer's weights are fp-order dependent (spec-only in
        // MLSpec), but on a SEPARABLE set with a wide margin band the
        // PREDICTION SET is an invariant — any separating hyperplane
        // labels every point by the generating rule, so LinearSVC's
        // predictions are deterministic even though its weights aren't.
        // Points derive from customer keys (x1 = key%21, x2 = key·7%23),
        // label = sign(2·x1 + 3·x2 − 53), with the band |score| < 8
        // dropped (margin 8/√13 ≈ 2.2 in feature units — LinearSVC at 100
        // iters lands ~two orders of magnitude inside it). Duplicate
        // (x1,x2) points are label-consistent by construction. A real SVM
        // drift (non-convergence, standardization regression) flips a
        // prediction and breaks the hash.
        val m = mgr(s, d)
        val pts = m.getDDFByName("customer").df
          .select(col("c_custkey").cast("long").as("id"))
          .withColumn("x1", (col("id") % 21).cast("double"))
          .withColumn("x2", ((col("id") * 7) % 23).cast("double"))
          .withColumn("score",
            lit(2.0) * col("x1") + lit(3.0) * col("x2") - lit(53.0))
          .filter(abs(col("score")) >= 8.0)
          .withColumn("label", (col("score") > 0).cast("double"))
          .drop("score")
        val ddf = m.getDDFByName("customer").derive(pts)
        val model = ml.MLSupport.train(ddf, "svm", Seq("x1", "x2"), "label",
          Map("maxIter" -> 100))
        ml.MLSupport.applyModel(ddf, model).df
          .select(col("id"), col("yPredict").cast("int").as("pred"))
          .orderBy("id")
      },
      Some("""SELECT c_custkey AS id,
             |  CASE WHEN 2.0 * (c_custkey % 21) + 3.0 * ((c_custkey * 7) % 23)
             |            - 53.0 > 0 THEN 1 ELSE 0 END AS pred
             |FROM customer
             |WHERE abs(2.0 * (c_custkey % 21) + 3.0 * ((c_custkey * 7) % 23)
             |          - 53.0) >= 8.0
             |ORDER BY id""".stripMargin)),

    Q("ml08_calibration",
      (s, d) => {
        val m = mgr(s, d)
        // reliability buckets + per-bin ECE gap for a pseudo-probability
        // derived arithmetically from order keys (k/1024 — every score is
        // an exact binary fraction, so avg() is bit-identical across
        // engines); label = order fulfilled. 8 equal-width bins.
        val scored = m.getDDFByName("orders").df.select(
          (((col("o_orderkey") * lit(2654435761L)) % 1024) / lit(1024.0))
            .as("score"),
          when(col("o_orderstatus") === "F", 1.0).otherwise(0.0).as("label"))
        ml.MLSupport.calibrationBuckets(scored, "score", "label", nBins = 8)
          .select(col("bin"), col("n"),
            round(col("confidence"), 6).as("confidence"),
            round(col("accuracy"), 6).as("accuracy"),
            round(col("gap"), 6).as("gap"))
          .orderBy("bin")
      },
      Some("""WITH s AS (SELECT
             |    ((o_orderkey * 2654435761) % 1024) / 1024.0 AS score,
             |    CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS label
             |  FROM orders)
             |SELECT CAST(least(floor(score * 8), 7) AS BIGINT) AS bin,
             |  count(*)::BIGINT AS n,
             |  round(avg(score), 6) AS confidence,
             |  round(avg(label), 6) AS accuracy,
             |  round(abs(avg(score) - avg(label)), 6) AS gap
             |FROM s GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("ml09_auc_by_group",
      (s, d) => {
        val m = mgr(s, d)
        // per-group Mann-Whitney AUC of "does discount predict a return"
        // sliced by linestatus. l_discount has 11 distinct values → heavy
        // ties, exercising the 0.5-credit path; every contribution is an
        // exact multiple of 0.5 so the sums are order-independent.
        ml.MLSupport.aucByGroup(m.getDDFByName("lineitem").df
            .select(col("l_linestatus"), col("l_discount"),
              when(col("l_returnflag") === "R", 1).otherwise(0).as("label")),
          "l_discount", "label", Seq("l_linestatus"))
          .select(col("l_linestatus"), round(col("auc"), 6).as("auc"),
            col("n_pos"), col("n_neg"))
          .orderBy("l_linestatus")
      },
      Some("""WITH b AS (SELECT l_linestatus, l_discount AS s,
             |    sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS np,
             |    sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS nn
             |  FROM lineitem GROUP BY 1, 2),
             |c AS (SELECT l_linestatus, np, nn,
             |    coalesce(sum(nn) OVER (PARTITION BY l_linestatus ORDER BY s
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
             |  FROM b)
             |SELECT l_linestatus,
             |  round(sum(np * (below + 0.5 * nn))
             |        / (sum(np) * sum(nn)), 6) AS auc,
             |  sum(np)::BIGINT AS n_pos, sum(nn)::BIGINT AS n_neg
             |FROM c GROUP BY 1 ORDER BY 1""".stripMargin))
  )

  // =====================================================================
  // Round-4 curation operators: relevance scoring, mixture rebalancing,
  // heuristic filtering, embedding quantization
  // =====================================================================

  private val curationQ: Seq[Q] = Seq(
    Q("c01_tfidf_topterms",
      (s, d) => {
        val m = mgr(s, d)
        // top-3 TF-IDF keyterms per document. Rank-boundary margin vs the
        // oracle's ln(): measured at sf0.01 — min non-tie score gap at the
        // rank-3/4 boundary is 2.6e-3 and min distance of score·1e6 to a
        // rounding boundary is 1.1e-2, vs cross-engine ln() noise ~1e-16.
        pipeline.Relevance.tfidfTopTerms(m.getDDFByName("documents").df,
            "text", "doc_id", k = 3)
          .select(col("id"), col("rk"), col("token"), col("tf"), col("doc_freq"),
            round(col("score"), 6).as("score"))
          .orderBy("id", "rk")
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest(${duckToks("text")}) AS token
              |  FROM documents),
              |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
              |dfq AS (SELECT token, count(*) AS doc_freq FROM tf GROUP BY 1),
              |n AS (SELECT count(*) AS n FROM documents),
              |sc AS (SELECT doc_id, token, tf, doc_freq,
              |    tf * (ln((n.n + 1.0) / (doc_freq + 1.0)) + 1.0) AS score
              |  FROM tf JOIN dfq USING (token), n),
              |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
              |    ORDER BY score DESC, token) AS rk FROM sc)
              |SELECT doc_id AS id, rk, token, tf, doc_freq, round(score, 6) AS score
              |FROM r WHERE rk <= 3 ORDER BY id, rk""".stripMargin)),

    Q("c02_bm25",
      (s, d) => {
        val m = mgr(s, d)
        // BM25 of every doc against a 3-term query; per-doc totals fold
        // term scores in token order on BOTH sides (bit-stable float sum)
        pipeline.Relevance.bm25(m.getDDFByName("documents").df, "text", "doc_id",
            Seq("spark", "query", "join"))
          .select(col("id"), col("terms_hit"), round(col("bm25"), 6).as("bm25"))
          .orderBy("id")
      },
      // literals are spelled as the same ARITHMETIC both sides ((1.2+1.0),
      // not 2.2) so each engine constant-folds the identical IEEE ops
      Some(s"""WITH tok AS (SELECT doc_id, unnest(${duckToks("text")}) AS token
              |  FROM documents),
              |dl AS (SELECT doc_id, ${duckTokenCount("text")} AS dl FROM documents),
              |stats AS (SELECT count(*) AS n, (SELECT sum(dl) FROM dl)::DOUBLE / count(*) AS avgdl
              |  FROM documents),
              |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
              |  WHERE token IN ('spark', 'query', 'join') GROUP BY 1, 2),
              |dfq AS (SELECT token, count(*) AS doc_freq FROM tf GROUP BY 1),
              |ts AS (SELECT doc_id, token,
              |    ln(1.0 + (n::DOUBLE - doc_freq + 0.5) / (doc_freq + 0.5))
              |      * (tf * (1.2 + 1.0))
              |      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) AS sc
              |  FROM tf JOIN dfq USING (token) JOIN dl USING (doc_id), stats)
              |SELECT doc_id AS id, count(*) AS terms_hit,
              |  round(list_reduce(list_prepend(0.0, list(sc ORDER BY token)),
              |    (acc, x) -> acc + x), 6) AS bm25
              |FROM ts GROUP BY doc_id ORDER BY id""".stripMargin)),

    Q("c03_temperature_sample",
      (s, d) => {
        val m = mgr(s, d)
        // power=2 (T=0.5) mixture sharpening over the lang column —
        // quotas are exact integer floor(200·c²/Σc²), selection is the
        // q07/q08 xor-fold hash rank, so the oracle reproduces both
        Views.temperatureResample(m.getDDFByName("documents"), "lang", "doc_id",
            power = 2, targetTotal = 200)
          .df.select("doc_id", "lang").orderBy("doc_id")
      },
      Some("""WITH c AS (SELECT lang, count(*) AS c FROM documents GROUP BY 1),
             |tot AS (SELECT sum(c * c) AS t FROM c),
             |q AS (SELECT lang, (200 * c * c) // t AS quota FROM c, tot),
             |h AS (SELECT doc_id, lang,
             |    (doc_id % 1000000000) * 2654435761 AS p FROM documents),
             |r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
             |    ORDER BY xor(p, p >> 31) % 1000000007, doc_id) AS rn FROM h)
             |SELECT doc_id, lang FROM r JOIN q USING (lang)
             |WHERE rn <= quota ORDER BY doc_id""".stripMargin)),

    Q("c12_match_distribution",
      (s, d) => {
        val m = mgr(s, d)
        // histogram matching (round 13): reshape the corpus's lang mix
        // to the mix exhibited by the src0-2 slice. Quotas are exact
        // BigInt arithmetic (M = min ⌊cd·T/ct⌋, quota = ⌊M·ct/T⌋) and
        // selection is the q07/q08 xor-fold rank, so the oracle
        // reproduces both to the row.
        val docs = m.getDDFByName("documents")
        val target = docs.df.filter(col("source").isin("src0", "src1", "src2"))
        Views.matchDistribution(docs, "lang", "doc_id", target)
          .df.select("doc_id", "lang").orderBy("doc_id")
      },
      Some("""WITH tgt AS (SELECT lang, count(*) AS ct FROM documents
             |    WHERE source IN ('src0','src1','src2') GROUP BY 1),
             |dc AS (SELECT lang, count(*) AS cd FROM documents GROUP BY 1),
             |j AS (SELECT dc.lang AS lang, cd, ct FROM dc JOIN tgt USING (lang)),
             |tot AS (SELECT sum(ct) AS t FROM j),
             |mm AS (SELECT min(cd * t // ct) AS m FROM j, tot),
             |q AS (SELECT lang, (m * ct // t) AS quota FROM j, tot, mm),
             |h AS (SELECT doc_id, lang,
             |    (doc_id % 1000000000) * 2654435761 AS p FROM documents),
             |r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
             |    ORDER BY xor(p, p >> 31) % 1000000007, doc_id) AS rn FROM h)
             |SELECT doc_id, lang FROM r JOIN q USING (lang)
             |WHERE rn <= quota ORDER BY doc_id""".stripMargin)),

    Q("c13_curation_audit",
      (s, d) => {
        val m = mgr(s, d)
        // per-doc disposition through the standard curation chain (round
        // 13): quality rules → exact dedup → near-dup → decontamination,
        // each stage judged among the PREVIOUS stage's survivors (the
        // order the pipeline actually runs) — the "why was my doc
        // dropped" explainability report a corpus owner asks for.
        // Stage configurations are the gate-proven ones (c04's rules,
        // d07's portable minhash at 0.5, p05's %37 bench suites at n=3),
        // so the oracle assembles from their proven fragments.
        val docs = m.getDDFByName("documents").df
        val rulePassIds = pipeline.TextAnalysis.c4Rules(docs, "text", "doc_id",
            minWords = 30, minMeanLen = 3.0, maxMeanLen = 4.5, maxWordLen = 25,
            requireTerminalPunct = false)
          .filter(col("keep")).select(col("id").as("doc_id"))
        val rulePass = docs.join(rulePassIds, Seq("doc_id"), "left_semi")
        val exactSurv = pipeline.Dedup.exactSurvivors(rulePass, "text", "doc_id")
        val ndLosers = pipeline.Dedup.minhashDedup(exactSurv, "text", "doc_id",
            threshold = 0.5, portable = true)
          .select(col("id2").as("doc_id")).distinct()
        val ndSurv = exactSurv.join(ndLosers, Seq("doc_id"), "left_anti")
        val benches = docs.filter(col("doc_id") % 37 === 0)
          .select(concat(lit("b"), (col("doc_id") % 3).cast("string")).as("bench_id"),
            col("text"))
        val clean = pipeline.TextAnalysis.decontaminatedAll(
          ndSurv, benches, "text", "doc_id", "bench_id", n = 3)
        docs.select("doc_id")
          .join(rulePassIds.withColumn("__rp", lit(true)), Seq("doc_id"), "left")
          .join(exactSurv.select("doc_id").withColumn("__es", lit(true)),
            Seq("doc_id"), "left")
          .join(ndSurv.select("doc_id").withColumn("__ns", lit(true)),
            Seq("doc_id"), "left")
          .join(clean.select("doc_id").withColumn("__cl", lit(true)),
            Seq("doc_id"), "left")
          .select(col("doc_id"),
            when(col("__rp").isNull, "rules")
              .when(col("__es").isNull, "exact_dup")
              .when(col("__ns").isNull, "near_dup")
              .when(col("__cl").isNull, "contaminated")
              .otherwise("kept").as("disposition"))
          .orderBy("doc_id")
      },
      // each stage's membership set replayed from its own gate's proven
      // SQL (c04 keep expression; p05's min-id dedup + shingle-union
      // contamination; d07's portable minhash stack over the exact
      // survivors), then one CASE walks the chain in pipeline order
      Some(s"""WITH t AS (SELECT doc_id AS id, text, ${duckToks("text")} AS tk
              |  FROM documents),
              |rl AS (SELECT id FROM t WHERE len(tk) >= 30
              |  AND (CASE WHEN len(tk) = 0 THEN 0.0
              |       ELSE list_sum(list_transform(tk, x -> length(x))) / len(tk)::DOUBLE END)
              |      BETWEEN 3.0 AND 4.5
              |  AND coalesce(list_max(list_transform(tk, x -> length(x))), 0) <= 25
              |  AND NOT contains(lower(text), 'lorem ipsum')
              |  AND NOT contains(lower(text), 'javascript')
              |  AND NOT contains(lower(text), '{')),
              |rp AS (SELECT d.* FROM documents d JOIN rl ON rl.id = d.doc_id),
              |reps AS (SELECT min(doc_id) AS doc_id FROM rp
              |  GROUP BY md5(${duckNorm("text")})),
              |es AS (SELECT rp.* FROM rp JOIN reps USING (doc_id)),
              |${duckMinhashCtes("es")},
              |ndl AS (SELECT DISTINCT id2 AS doc_id FROM mpairs WHERE jr >= 0.5),
              |ns AS (SELECT * FROM es
              |  WHERE doc_id NOT IN (SELECT doc_id FROM ndl)),
              |ntk AS (SELECT doc_id, ${duckToks("text")} AS tk FROM ns),
              |csh AS (SELECT doc_id, ${duckNgrams("tk", 3)} AS shs FROM ntk),
              |cex AS (SELECT DISTINCT doc_id, unnest(shs) AS s FROM csh),
              |btk AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents
              |  WHERE doc_id % 37 = 0),
              |bshs AS (SELECT doc_id, ${duckNgrams("tk", 3)} AS shs FROM btk),
              |bex AS (SELECT DISTINCT unnest(shs) AS s FROM bshs),
              |contam AS (SELECT DISTINCT e.doc_id FROM cex e JOIN bex USING (s))
              |SELECT d.doc_id,
              |  CASE WHEN d.doc_id NOT IN (SELECT doc_id FROM rp) THEN 'rules'
              |       WHEN d.doc_id NOT IN (SELECT doc_id FROM es) THEN 'exact_dup'
              |       WHEN d.doc_id IN (SELECT doc_id FROM ndl) THEN 'near_dup'
              |       WHEN d.doc_id IN (SELECT doc_id FROM contam) THEN 'contaminated'
              |       ELSE 'kept' END AS disposition
              |FROM documents d ORDER BY d.doc_id""".stripMargin)),

    Q("c04_c4_rules",
      (s, d) => {
        val m = mgr(s, d)
        // bounds chosen to SPLIT this corpus (mean word length spans
        // 3.7–5.3, token counts 20–90): every rule flips on real rows.
        // The synthetic text has no sentence punctuation, so
        // terminal_punct is reported but excluded from keep (the
        // non-prose config). Rule boundaries are exact-integer ratios —
        // no cross-engine float margin to measure.
        pipeline.TextAnalysis.c4Rules(m.getDDFByName("documents").df, "text", "doc_id",
            minWords = 30, minMeanLen = 3.0, maxMeanLen = 4.5, maxWordLen = 25,
            requireTerminalPunct = false)
          .orderBy("id")
      },
      Some(s"""WITH t AS (SELECT doc_id AS id, text, ${duckToks("text")} AS tk
              |  FROM documents)
              |SELECT id,
              |  len(tk) >= 30 AS enough_words,
              |  (CASE WHEN len(tk) = 0 THEN 0.0
              |   ELSE list_sum(list_transform(tk, x -> length(x))) / len(tk)::DOUBLE END)
              |    BETWEEN 3.0 AND 4.5 AS mean_word_len_ok,
              |  coalesce(list_max(list_transform(tk, x -> length(x))), 0) <= 25 AS no_long_word,
              |  regexp_matches(rtrim(text), '[.!?"]$$') AS terminal_punct,
              |  (NOT contains(lower(text), 'lorem ipsum')
              |   AND NOT contains(lower(text), 'javascript')
              |   AND NOT contains(lower(text), '{')) AS no_blacklist,
              |  (len(tk) >= 30
              |   AND (CASE WHEN len(tk) = 0 THEN 0.0
              |        ELSE list_sum(list_transform(tk, x -> length(x))) / len(tk)::DOUBLE END)
              |       BETWEEN 3.0 AND 4.5
              |   AND coalesce(list_max(list_transform(tk, x -> length(x))), 0) <= 25
              |   AND NOT contains(lower(text), 'lorem ipsum')
              |   AND NOT contains(lower(text), 'javascript')
              |   AND NOT contains(lower(text), '{')) AS keep
              |FROM t ORDER BY id""".stripMargin)),

    Q("c14_gopher_rules",
      (s, d) => {
        val m = mgr(s, d)
        // Gopher rules need formatting signals the synthetic corpus
        // lacks (it is single-line, symbol-free, all-alpha), so every
        // 5th doc gets a deterministic bullet/ellipsis/symbol suffix —
        // identically in the oracle — and the thresholds are tuned so
        // every rule flips on real rows (the c04 philosophy): symbols
        // 6/(nw+17) vs 0.05, bullets 3/6 vs 0.4, ellipses 2/6 vs 0.3,
        // alpha (nw+12)/(nw+17) vs 0.96; word count and stopwords split
        // the corpus naturally. All boundaries are exact-integer ratios.
        val docs = m.getDDFByName("documents").df
        val aug = docs.withColumn("text",
          when(col("doc_id") % 5 === 0,
            concat(col("text"), lit("\n- alpha beta\n- gamma delta" +
              "\n* epsilon zeta\nthis line trails off..." +
              "\n# head ### tail...")))
            .otherwise(col("text")))
        pipeline.TextAnalysis.gopherRules(aug, "text", "doc_id",
            minWords = 50, maxWords = 100000,
            minMeanLen = 3.0, maxMeanLen = 4.5,
            maxSymbolRatio = 0.05, maxBulletRatio = 0.4,
            maxEllipsisRatio = 0.3, minAlphaRatio = 0.96,
            minStopwords = 2)
          .orderBy("id")
      },
      Some(s"""WITH docs2 AS (SELECT doc_id AS id,
              |    CASE WHEN doc_id % 5 = 0 THEN text
              |      || chr(10) || '- alpha beta' || chr(10) || '- gamma delta'
              |      || chr(10) || '* epsilon zeta'
              |      || chr(10) || 'this line trails off...'
              |      || chr(10) || '# head ### tail...'
              |    ELSE text END AS text
              |  FROM documents),
              |t AS (SELECT id, text, ${duckToks("text")} AS tk,
              |    list_filter(string_split(text, chr(10)), l -> trim(l) != '') AS ln
              |  FROM docs2),
              |m AS (SELECT id,
              |    len(tk)::BIGINT AS nw, len(ln)::BIGINT AS nl,
              |    (CASE WHEN len(tk) = 0 THEN 0.0
              |     ELSE list_sum(list_transform(tk, x -> length(x))) / len(tk)::DOUBLE END)
              |      AS meanlen,
              |    ((length(text) - length(replace(text, '#', '')))
              |      + (length(text) - length(replace(text, '...', ''))) // 3)::BIGINT AS syms,
              |    len(list_filter(ln, l ->
              |      list_contains(['-', '*', '•'], substring(ltrim(l), 1, 1))))::BIGINT AS bullets,
              |    len(list_filter(ln, l -> ends_with(rtrim(l), '...')))::BIGINT AS ellipses,
              |    len(list_filter(tk, x -> regexp_matches(x, '[a-z]')))::BIGINT AS alphas,
              |    len(list_filter(tk, x -> list_contains(
              |      ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'], x)))::BIGINT AS sw
              |  FROM t),
              |f AS (SELECT id, nw AS n_words,
              |    nw BETWEEN 50 AND 100000 AS word_count_ok,
              |    meanlen BETWEEN 3.0 AND 4.5 AS mean_word_len_ok,
              |    (nw = 0 OR syms::DOUBLE / nw::DOUBLE <= 0.05) AS symbol_ratio_ok,
              |    (nl = 0 OR bullets::DOUBLE / nl::DOUBLE <= 0.4) AS bullet_ratio_ok,
              |    (nl = 0 OR ellipses::DOUBLE / nl::DOUBLE <= 0.3) AS ellipsis_ratio_ok,
              |    (nw = 0 OR alphas::DOUBLE / nw::DOUBLE >= 0.96) AS alpha_ratio_ok,
              |    sw >= 2 AS stopword_ok
              |  FROM m)
              |SELECT *, word_count_ok AND mean_word_len_ok AND symbol_ratio_ok
              |    AND bullet_ratio_ok AND ellipsis_ratio_ok AND alpha_ratio_ok
              |    AND stopword_ok AS keep
              |FROM f ORDER BY id""".stripMargin)),

    Q("c15_snapshot_diff",
      (s, d) => {
        val m = mgr(s, d)
        // release-over-release corpus diff: the "old" release drops every
        // 7th doc, the "new" one drops every 5th and revises every 11th —
        // snapshotDiff reports only the delta (added/removed/changed),
        // both text versions riding along for audit
        val docs = m.getDDFByName("documents").df
        val old = docs.filter(col("doc_id") % 7 =!= 0)
          .select("doc_id", "text", "source")
        val nw = docs.filter(col("doc_id") % 5 =!= 0)
          .select(col("doc_id"),
            when(col("doc_id") % 11 === 0, concat(col("text"), lit(" [v2]")))
              .otherwise(col("text")).as("text"),
            col("source"))
        operators.History.snapshotDiff(old, nw, Seq("doc_id"),
            Seq("text", "source"))
          .orderBy("doc_id")
      },
      Some("""WITH old AS (SELECT doc_id, text, source FROM documents
             |    WHERE doc_id % 7 != 0),
             |nw AS (SELECT doc_id,
             |    CASE WHEN doc_id % 11 = 0 THEN text || ' [v2]' ELSE text END
             |      AS text, source
             |  FROM documents WHERE doc_id % 5 != 0),
             |j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
             |    CASE WHEN o.doc_id IS NULL THEN 'added'
             |         WHEN n.doc_id IS NULL THEN 'removed'
             |         WHEN (o.text IS DISTINCT FROM n.text)
             |           OR (o.source IS DISTINCT FROM n.source) THEN 'changed'
             |    END AS change,
             |    o.text AS old_text, n.text AS text,
             |    o.source AS old_source, n.source AS source
             |  FROM old o FULL OUTER JOIN nw n ON o.doc_id = n.doc_id)
             |SELECT doc_id, change, old_text, text, old_source, source
             |FROM j WHERE change IS NOT NULL ORDER BY doc_id""".stripMargin)),

    Q("d10_incremental_minhash",
      (s, d) => {
        val m = mgr(s, d)
        // production ingest shape: docs < 250 are the "existing corpus"
        // (their band rows are the persisted index); docs >= 250 arrive
        // as a new batch — in-batch verify + index probe, no corpus
        // rescan. Portable hashes so DuckDB replicates every stage
        // (signatures are per-doc, so banding the batch alone equals
        // banding everything and filtering — the oracle exploits that).
        val docs = m.getDDFByName("documents").df
        val old = docs.filter(col("doc_id") < 250)
        val batch = docs.filter(col("doc_id") >= 250)
        val index = pipeline.Dedup.bandRows(
          pipeline.Dedup.minhashSignaturesPortable(
            pipeline.Dedup.shingled(old, "text", "doc_id")),
          32, 8, cs => concat_ws(",", cs: _*))
        val (kept, _) = pipeline.Dedup.incrementalMinhash(batch, index,
          "text", "doc_id", threshold = 0.5, portable = true)
        kept.select(col("doc_id")).orderBy("doc_id")
      },
      Some(s"""WITH ${duckMinhashCtes("documents")},
              |losers AS (SELECT DISTINCT id2 FROM mpairs
              |  WHERE jr >= 0.5 AND id1 >= 250 AND id2 >= 250),
              |surv AS (SELECT doc_id FROM documents WHERE doc_id >= 250
              |  AND doc_id NOT IN (SELECT id2 FROM losers)),
              |xdup AS (SELECT DISTINCT s.doc_id FROM msig s
              |  JOIN msig i ON s.band = i.band AND s.sig = i.sig
              |  WHERE s.doc_id IN (SELECT doc_id FROM surv) AND i.doc_id < 250)
              |SELECT doc_id FROM surv
              |WHERE doc_id NOT IN (SELECT doc_id FROM xdup)
              |ORDER BY doc_id""".stripMargin)),

    Q("d11_incremental_minhash_fast",
      (s, d) => {
        val m = mgr(s, d)
        // d10's xxhash64 twin — the codegen'd 100 TB path, benched;
        // engine-specific hashes → rows-only (same split as d02/d07)
        val docs = m.getDDFByName("documents").df
        val old = docs.filter(col("doc_id") < 250)
        val batch = docs.filter(col("doc_id") >= 250)
        val index = pipeline.Dedup.bandRows(
          pipeline.Dedup.minhashSignaturesFromShingles(
            pipeline.Dedup.shingled(old, "text", "doc_id")))
        val (kept, _) = pipeline.Dedup.incrementalMinhash(batch, index,
          "text", "doc_id", threshold = 0.5)
        kept.select(col("doc_id")).orderBy("doc_id")
      },
      None),

    Q("c05_leakage_safe_split",
      (s, d) => {
        val m = mgr(s, d)
        // cluster-aware train/val/test: members of a near-dup cluster
        // (the d06 oracle-able edge set) get the SAME split; singletons
        // hash on their own id. 8/1/1 weights out of 10 buckets.
        val universe = m.getDDFByName("embeddings").df
          .filter(col("vec_id") < 200).select(col("vec_id"))
        pipeline.Dedup.leakageSafeSplit(universe, embeddingPairs(m), "vec_id",
            Seq(("train", 8), ("val", 1), ("test", 1)))
          .select(col("vec_id"), col("split")).orderBy("vec_id")
      },
      Some(s"""WITH RECURSIVE
              |$duckClusterCtes,
              |u AS (SELECT vec_id FROM embeddings WHERE vec_id < 200),
              |lbl AS (SELECT u.vec_id, coalesce(c.cluster_id, u.vec_id) AS lab
              |        FROM u LEFT JOIN c ON c.id = u.vec_id),
              |hh AS (SELECT vec_id, (lab % 1000000000) * 2654435761 AS p FROM lbl),
              |b AS (SELECT vec_id, xor(p, p >> 31) % 10 AS bucket FROM hh)
              |SELECT vec_id, CASE WHEN bucket >= 9 THEN 'test'
              |  WHEN bucket >= 8 THEN 'val' ELSE 'train' END AS split
              |FROM b ORDER BY vec_id""".stripMargin)),

    Q("a04_quantize_roundtrip",
      (s, d) => {
        val m = mgr(s, d)
        // int8 round-trip fidelity per vector: scale + cosine(original,
        // dequantized). Rounding is floor(x/scale + 0.5) on both sides —
        // engine round() builtins disagree on ties
        val q = pipeline.Similarity.quantizeInt8(col("embedding"))
        m.getDDFByName("embeddings").df
          .withColumn("__q", q)
          .select(col("vec_id"),
            round(col("__q.scale"), 9).as("scale"),
            round(pipeline.Similarity.cosine(
              expr("transform(embedding, x -> cast(x as double))"),
              pipeline.Similarity.dequantize(col("__q"))), 6).as("cos_roundtrip"))
          .orderBy("vec_id")
      },
      Some("""WITH e AS (SELECT vec_id,
             |    list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
             |s AS (SELECT vec_id, v,
             |    greatest(coalesce(list_max(list_transform(v, x -> abs(x))), 0.0), 0.0)
             |      / 127.0 AS scale FROM e),
             |qq AS (SELECT vec_id, v, scale,
             |    CASE WHEN scale = 0 THEN list_transform(v, x -> 0.0)
             |    ELSE list_transform(v, x -> floor(x / scale + 0.5)) END AS codes FROM s),
             |d AS (SELECT vec_id, v, scale,
             |    list_transform(codes, c -> c * scale) AS dv FROM qq)
             |SELECT vec_id, round(scale, 9) AS scale,
             |  round(list_dot_product(v, dv)
             |    / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(dv, dv))), 6)
             |    AS cos_roundtrip
             |FROM d ORDER BY vec_id""".stripMargin)),

    Q("d12_incremental_bloom",
      (s, d) => {
        val m = mgr(s, d)
        val docs = m.getDDFByName("documents").df
        // same ingest shape as d08 on a different split; the Bloom
        // prefilter is result-invariant (no false negatives; false
        // positives resolved by the exact anti-join), so the oracle is
        // the plain incremental-dedup SQL
        val index = pipeline.Dedup.exact(docs.filter(col("doc_id") % 3 === 0),
          "text", "doc_id").select("fingerprint")
        pipeline.Dedup.incrementalExactBloom(docs.filter(col("doc_id") % 3 =!= 0),
            index, "text", "doc_id", fpp = 0.01)
          .orderBy("fingerprint")
      },
      Some(s"""WITH fp AS (SELECT doc_id, md5(${duckNorm("text")}) AS fingerprint
              |  FROM documents),
              |idx AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 3 = 0),
              |batch AS (SELECT fingerprint, min(doc_id) AS keep_id FROM fp
              |  WHERE doc_id % 3 != 0 GROUP BY 1)
              |SELECT fingerprint, keep_id FROM batch
              |WHERE fingerprint NOT IN (SELECT fingerprint FROM idx)
              |ORDER BY fingerprint""".stripMargin)),

    Q("a05_semantic_dedup",
      (s, d) => {
        val m = mgr(s, d)
        val all = m.getDDFByName("embeddings").df
        // fixed centroids (first 16 vectors) as in a03 — assignment,
        // within-cell pairing, and the cosine threshold are then exactly
        // replicable in the oracle. Margins measured at sf0.01: min
        // |cosine − 0.35| over the 7,781 within-cell pairs = 3.6e-4;
        // min assignment gap best→2nd cell = 2.3e-4 (fp noise ~1e-15)
        val centroids = all.filter(col("vec_id") < 16).orderBy("vec_id")
          .select("embedding").collect()
          .map(_.getSeq[Float](0).toArray.map(_.toDouble))
        val idx = pipeline.IvfIndex.buildFromCentroids(all, "embedding", "vec_id", centroids)
        pipeline.Dedup.semanticPairs(idx, threshold = 0.35)
          .select(col("id1"), col("id2"), round(col("cosine"), 6).as("cosine"))
          .orderBy("id1", "id2")
      },
      Some(s"""WITH dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              |            FROM embeddings),
              |cents AS (SELECT vec_id AS cell, v AS cv FROM dv WHERE vec_id < 16),
              |assigned AS (SELECT id, v, cell FROM (
              |    SELECT d.vec_id AS id, d.v, c.cell,
              |      row_number() OVER (PARTITION BY d.vec_id ORDER BY
              |        list_dot_product(d.v, c.cv) - list_dot_product(c.cv, c.cv) / 2.0 DESC,
              |        c.cell DESC) AS rn
              |    FROM dv d CROSS JOIN cents c) WHERE rn = 1)
              |SELECT a.id AS id1, b.id AS id2, round($duckCos, 6) AS cosine
              |FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.id < b.id
              |WHERE $duckCos >= 0.35
              |ORDER BY id1, id2""".stripMargin)),

    Q("a20_semantic_dedup_scaled",
      (s, d) => {
        val m = mgr(s, d)
        val all = m.getDDFByName("embeddings").df
        // the production 16·f contract (r15 verdict ask #5): the cell
        // count grows with the corpus — one centroid per ~125 vectors,
        // floored at 16 — so within-cell pair volume stays LINEAR in
        // corpus size instead of quadratic. At the oracle scale factors
        // (500-2,000 vectors) K floors at 16, identical semantics to
        // a05; at the bench's 10×-blown sf1 corpus (20,000 vectors)
        // K = 160 and the assignment takes the broadcast-join path
        // (past the 48-cell inline cutover) — the shape a real corpus
        // owner runs, and the bench row that replaced a05's
        // JIT-shelf-bound degenerate kernel in the sf1 tier (a05 stays
        // available as tools/ProbeA05's probe). Centroids are the first
        // K vectors by vec_id, exactly replicable in SQL.
        val n = all.count()
        val k = math.max(16L, n / 125L)
        val centroids = all.filter(col("vec_id") < k).orderBy("vec_id")
          .select("embedding").collect()
          .map(_.getSeq[Float](0).toArray.map(_.toDouble))
        val idx = pipeline.IvfIndex.buildFromCentroids(all, "embedding", "vec_id", centroids)
        pipeline.Dedup.semanticPairs(idx, threshold = 0.35)
          .select(col("id1"), col("id2"), round(col("cosine"), 6).as("cosine"))
          .orderBy("id1", "id2")
      },
      Some(s"""WITH dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              |            FROM embeddings),
              |cents AS (SELECT vec_id AS cell, v AS cv FROM dv
              |          WHERE vec_id < (SELECT greatest(16, count(*) // 125)
              |                          FROM embeddings)),
              |assigned AS (SELECT id, v, cell FROM (
              |    SELECT d.vec_id AS id, d.v, c.cell,
              |      row_number() OVER (PARTITION BY d.vec_id ORDER BY
              |        list_dot_product(d.v, c.cv) - list_dot_product(c.cv, c.cv) / 2.0 DESC,
              |        c.cell DESC) AS rn
              |    FROM dv d CROSS JOIN cents c) WHERE rn = 1)
              |SELECT a.id AS id1, b.id AS id2, round($duckCos, 6) AS cosine
              |FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.id < b.id
              |WHERE $duckCos >= 0.35
              |ORDER BY id1, id2""".stripMargin)),

    Q("c06_bm25_retrieve",
      (s, d) => {
        val m = mgr(s, d)
        import s.implicits._
        // batch retrieval: top-5 docs per query for a 3-query table; the
        // per-(query, doc) totals fold term scores in token order on both
        // sides (bit-stable), ranks break float ties by id
        val queries = Seq((1L, "spark join"), (2L, "window stream"),
          (3L, "hash filter scan")).toDF("query_id", "qtext")
        pipeline.Relevance.bm25Retrieve(m.getDDFByName("documents").df,
            "text", "doc_id", queries, "query_id", "qtext", k = 5)
          .select(col("query_id"), col("id"), round(col("bm25"), 6).as("bm25"),
            col("terms_hit"), col("rk"))
          .orderBy("query_id", "rk")
      },
      Some(s"""WITH ${duckBm25Ctes(5)}
              |SELECT query_id, id, round(bm25, 6) AS bm25, terms_hit, rk
              |FROM bmrank ORDER BY query_id, rk""".stripMargin)),

    Q("c11_hybrid_rrf",
      (s, d) => {
        val m = mgr(s, d)
        import s.implicits._
        // hybrid retrieval: BM25 and token-set-Jaccard rankings (top-10
        // each) fused by reciprocal rank — the standard two-retriever
        // stack. Both component rankings are independently bit-stable
        // (c06's BM25 fold; Jaccard is one double division of exact
        // ints), and the fused score 1/(60+r1) + 1/(60+r2) is a fixed
        // expression tree, so the whole hybrid is hash-exact.
        val queries = Seq((1L, "spark join"), (2L, "window stream"),
          (3L, "hash filter scan")).toDF("query_id", "qtext")
        val docs = m.getDDFByName("documents").df
        val bm = pipeline.Relevance.bm25Retrieve(docs, "text", "doc_id",
          queries, "query_id", "qtext", k = 10)
        val jc = pipeline.Relevance.jaccardRetrieve(docs, "text", "doc_id",
          queries, "query_id", "qtext", k = 10)
        pipeline.Relevance.rrfFuse(Seq(bm, jc), k = 5)
          .select(col("query_id"), col("id"), round(col("rrf"), 6).as("rrf"),
            col("rk"))
          .orderBy("query_id", "rk")
      },
      Some(s"""WITH ${duckBm25Ctes(10)},
              |ddt AS (SELECT doc_id, unnest(list_distinct(${duckToks("text")})) AS token
              |  FROM documents),
              |dsz AS (SELECT doc_id, count(*) AS dn FROM ddt GROUP BY 1),
              |qsz AS (SELECT query_id, count(*) AS qn FROM qt GROUP BY 1),
              |jint AS (SELECT qt.query_id, ddt.doc_id AS id, count(*) AS inter
              |  FROM qt JOIN ddt USING (token) GROUP BY 1, 2),
              |jrank AS (SELECT query_id, id, row_number() OVER (
              |    PARTITION BY query_id
              |    ORDER BY inter::DOUBLE / (qn + dn - inter) DESC, id) AS rk
              |  FROM jint JOIN qsz USING (query_id)
              |  JOIN dsz ON dsz.doc_id = jint.id),
              |jtop AS (SELECT query_id, id, rk FROM jrank WHERE rk <= 10),
              |f AS (SELECT coalesce(b.query_id, j.query_id) AS query_id,
              |    coalesce(b.id, j.id) AS id,
              |    coalesce(1.0 / (60 + b.rk), 0.0)
              |      + coalesce(1.0 / (60 + j.rk), 0.0) AS rrf
              |  FROM bmrank b FULL OUTER JOIN jtop j
              |    ON b.query_id = j.query_id AND b.id = j.id)
              |SELECT query_id, id, round(rrf, 6) AS rrf, rk FROM (
              |  SELECT *, row_number() OVER (PARTITION BY query_id
              |    ORDER BY rrf DESC, id) AS rk FROM f)
              |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin)),

    Q("d13_corpus_diff",
      (s, d) => {
        val m = mgr(s, d)
        val docs = m.getDDFByName("documents").df
        // two overlapping corpus versions: content-level added/removed/
        // common audit (ids don't matter, fingerprints do)
        pipeline.Dedup.corpusDiff(
            docs.filter(col("doc_id") < 300), docs.filter(col("doc_id") >= 200),
            "text")
          .orderBy("fingerprint")
      },
      // join + status are NULL-SAFE (IS NOT DISTINCT FROM / count
      // nullability), mirroring corpusDiff's <=> semantics — a NULL-text
      // doc on either side must diff as ONE 'common'/'added'/'removed'
      // row, not two mislabeled ones
      Some(s"""WITH fp AS (SELECT doc_id, md5(${duckNorm("text")}) AS f FROM documents),
              |o AS (SELECT f, count(*) AS old_n FROM fp WHERE doc_id < 300 GROUP BY 1),
              |n AS (SELECT f, count(*) AS new_n FROM fp WHERE doc_id >= 200 GROUP BY 1)
              |SELECT coalesce(n.f, o.f) AS fingerprint,
              |  CASE WHEN old_n IS NULL THEN 'added'
              |       WHEN new_n IS NULL THEN 'removed' ELSE 'common' END AS status,
              |  coalesce(old_n, 0)::BIGINT AS old_n,
              |  coalesce(new_n, 0)::BIGINT AS new_n
              |FROM n FULL OUTER JOIN o ON n.f IS NOT DISTINCT FROM o.f
              |ORDER BY fingerprint""".stripMargin)),

    Q("a06_semantic_decontaminate",
      (s, d) => {
        val m = mgr(s, d)
        val all = m.getDDFByName("embeddings").df
        // eval suite = first 20 vectors, corpus = the rest. Threshold
        // margin measured at sf0.01: min |max_cos − 0.4| = 1.3e-4 over
        // 480 corpus rows (4 contaminated); max is order-independent,
        // so no fold caveat
        pipeline.Similarity.semanticDecontaminate(
            all.filter(col("vec_id") >= 20), "embedding", "vec_id",
            all.filter(col("vec_id") < 20), threshold = 0.4)
          .select(col("id"), round(col("max_eval_cosine"), 6).as("max_eval_cosine"),
            col("contaminated"))
          .orderBy("id")
      },
      Some("""WITH dv AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
             |            FROM embeddings),
             |ev AS (SELECT v AS evv FROM dv WHERE vec_id < 20),
             |c AS (SELECT d.vec_id AS id,
             |    max(list_dot_product(d.v, evv) /
             |        (sqrt(list_dot_product(d.v, d.v)) * sqrt(list_dot_product(evv, evv)))) AS mc
             |  FROM (SELECT * FROM dv WHERE vec_id >= 20) d CROSS JOIN ev GROUP BY 1)
             |SELECT id, round(mc, 6) AS max_eval_cosine, mc >= 0.4 AS contaminated
             |FROM c ORDER BY id""".stripMargin)),

    Q("c07_weighted_sample",
      (s, d) => {
        val m = mgr(s, d)
        val docs = m.getDDFByName("documents")
        // length-weighted soft downsampling: keep probability
        // min(1, 1.2 · token_count/100), decided by the q07 xor-fold
        // hash. The weight derives from an EXACT INTEGER count through
        // one double division — both engines perform the identical IEEE
        // ops, so the floored threshold agrees BY CONSTRUCTION (a
        // rounded-precision float weight could flip rows at integer
        // boundaries of scale·w·10⁶ — see weightedSample's caveat)
        val scored = m.register(docs.df.withColumn("w",
          least(pipeline.TextAnalysis.tokenCount("text").cast("double") / lit(100.0),
            lit(1.0))))
        Views.weightedSample(scored, "doc_id", "w", scale = 1.2)
          .df.select(col("doc_id"), col("w"))
          .orderBy("doc_id")
      },
      // ::DOUBLE on the literals: DuckDB would otherwise divide
      // BIGINT/DECIMAL in exact decimal arithmetic and round ONCE where
      // Spark rounds per-op — forcing doubles reproduces Spark's exact
      // IEEE sequence
      Some(s"""WITH s AS (SELECT doc_id,
              |    least(${duckTokenCount("text")} / (100.0::DOUBLE), 1.0::DOUBLE) AS w
              |  FROM documents)
              |SELECT doc_id, w FROM s
              |WHERE xor((doc_id % 1000000000) * 2654435761,
              |          ((doc_id % 1000000000) * 2654435761) >> 31) % 1000000
              |      < floor(least(1.0::DOUBLE, (1.2::DOUBLE) * w) * (1000000.0::DOUBLE))
              |ORDER BY doc_id""".stripMargin)),

    Q("c08_mixture_sample",
      (s, d) => {
        val m = mgr(s, d)
        // data-mixture step: fill a 2000-token budget at 40/30/20/10%
        // from four sources, deterministic hash-order prefix per source.
        // The engine runs the BUCKETED two-pass (driver sees only
        // source×bucket sums); the oracle is the naive single-window
        // prefix — passing hash-exact proves the two formulations pick
        // identical rows (PipelineSpec pins the same equivalence on a
        // fixture).
        pipeline.TextAnalysis.mixtureSample(
            m.getDDFByName("documents").df, "text", "doc_id", "source",
            Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1),
            totalTokens = 2000, salt = "ep1", nBuckets = 64)
          .select(col("doc_id"), col("source"), col("n_tokens"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, source,
              |    len(${duckToks("text")})::BIGINT AS n_tokens,
              |    list_reduce(list_prepend(0::BIGINT,
              |      list_transform(regexp_split_to_array(doc_id::VARCHAR || ':ep1', ''),
              |        c -> coalesce(ascii(c), 0)::BIGINT)),
              |      (acc, x) -> (acc * 31 + x) % 1000000007) AS h
              |  FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3')),
              |c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t)
              |SELECT doc_id, source, n_tokens FROM c
              |WHERE cum <= CASE source WHEN 'src0' THEN 800 WHEN 'src1' THEN 600
              |  WHEN 'src2' THEN 400 ELSE 200 END
              |ORDER BY doc_id""".stripMargin)),

    Q("c09_mixture_upsample",
      (s, d) => {
        val m = mgr(s, d)
        // upsampling mix: each source's ~1300-token corpus fills a
        // 2000-token budget → 1 full epoch + a partial prefix epoch.
        // epoch is part of the output contract (repeat index for
        // downstream epoch-salted shuffles).
        pipeline.TextAnalysis.mixtureUpsample(
            m.getDDFByName("documents").df, "text", "doc_id", "source",
            Map("src0" -> 0.5, "src1" -> 0.5),
            totalTokens = 4000, salt = "ep1", nBuckets = 64)
          .select(col("doc_id"), col("source"), col("n_tokens"), col("epoch"))
          .orderBy("doc_id", "epoch")
      },
      Some(s"""WITH t AS (SELECT doc_id, source,
              |    len(${duckToks("text")})::BIGINT AS n_tokens,
              |    list_reduce(list_prepend(0::BIGINT,
              |      list_transform(regexp_split_to_array(doc_id::VARCHAR || ':ep1', ''),
              |        c -> coalesce(ascii(c), 0)::BIGINT)),
              |      (acc, x) -> (acc * 31 + x) % 1000000007) AS h
              |  FROM documents WHERE source IN ('src0', 'src1')),
              |tot AS (SELECT source, sum(n_tokens)::BIGINT AS tot FROM t GROUP BY 1),
              |f AS (SELECT source, tot,
              |    (CASE WHEN tot > 0 THEN 2000 // tot ELSE 0 END)::BIGINT AS k,
              |    (2000 - CASE WHEN tot > 0 THEN 2000 // tot ELSE 0 END * tot)::BIGINT AS rem
              |  FROM tot),
              |e AS (SELECT t.doc_id, t.source, t.n_tokens,
              |    unnest(range(0, f.k)) AS epoch FROM t JOIN f USING (source)),
              |c AS (SELECT t.*, f.k, f.rem,
              |    sum(n_tokens) OVER (PARTITION BY t.source ORDER BY h, doc_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              |  FROM t JOIN f USING (source)),
              |p AS (SELECT doc_id, source, n_tokens, k AS epoch FROM c WHERE cum <= rem)
              |SELECT doc_id, source, n_tokens, epoch::BIGINT AS epoch FROM e
              |UNION ALL SELECT doc_id, source, n_tokens, epoch::BIGINT FROM p
              |ORDER BY doc_id, epoch""".stripMargin)),

    Q("c10_curriculum_order",
      (s, d) => {
        // curriculum / stratified-shuffle training order: docs bucketed
        // by token count against fixed cutoffs (cutoff COMPUTATION is
        // Stats.quantiles' gated domain — q41/q84), pseudo-random
        // portable-fold order within bucket, buckets interleaved
        // round-robin into ord. Fully deterministic → whole construction
        // replayed in DuckDB.
        val m = mgr(s, d)
        val docs = m.getDDFByName("documents").df
          .select(col("doc_id"),
            pipeline.TextAnalysis.tokenCount("text").cast("double").as("score"))
        pipeline.TextAnalysis.curriculumOrder(docs, "score", "doc_id",
            cutoffs = Seq(30.0, 60.0, 90.0))
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some(s"""WITH s AS (SELECT doc_id,
              |    len(${duckToks("text")})::DOUBLE AS score FROM documents),
              |b AS (SELECT doc_id, score,
              |    (CASE WHEN score > 90 THEN 3 WHEN score > 60 THEN 2
              |          WHEN score > 30 THEN 1 ELSE 0 END) AS bucket FROM s),
              |f AS (SELECT *, list_reduce(list_prepend(0::BIGINT,
              |      list_transform(regexp_split_to_array(doc_id::VARCHAR, ''),
              |        c -> coalesce(ascii(c), 0)::BIGINT)),
              |      (acc, x) -> (acc * 31 + x) % 1000000007) AS h FROM b),
              |r AS (SELECT doc_id, score, bucket,
              |    (row_number() OVER (PARTITION BY bucket ORDER BY h, doc_id) - 1)::BIGINT AS pos
              |  FROM f)
              |SELECT doc_id, score, bucket, pos, pos * 4 + bucket AS ord
              |FROM r ORDER BY doc_id""".stripMargin)),

    Q("ds01_dsir_weights",
      (s, d) => {
        // DSIR importance weights (Dsir.importanceWeights): raw docs
        // scored by log p_target − log p_raw under hashed unigram+bigram
        // bag models. doc_id % 7 == 0 plays the target domain. Weights
        // are hash-exact portable: buckets from the portable fold, the
        // per-doc float sum folded in bucket order (t10 pattern), ln()
        // args built identically on both engines.
        val m = mgr(s, d)
        val docs = m.getDDFByName("documents").df
        pipeline.Dsir.importanceWeights(
            docs.filter(col("doc_id") % 7 =!= 0),
            docs.filter(col("doc_id") % 7 === 0),
            "text", "doc_id", buckets = 4096)
          .select(col("id").as("doc_id"), col("n_feats"),
            round(col("weight"), 6).as("weight"))
          .orderBy("doc_id")
      },
      // round(coalesce(x,0),6) == coalesce(round(x,6),0.0), so rounding
      // at the end over the shared full_w stack is the original query
      Some(s"""WITH $duckDsirW
              |SELECT doc_id, n_feats, round(weight, 6) AS weight
              |FROM full_w ORDER BY doc_id""".stripMargin)),

    Q("ds02_dsir_resample",
      (s, d) => {
        // the selection half of DSIR: deterministic top-k by importance
        // (weight DESC, doc_id) — rankable in DuckDB because the weights
        // themselves are bit-identical across engines (ds01), so the cut
        // lands on the same documents. Gumbel-noise draw stays spec-only
        // (DsirSpec) — it's seed-deterministic but adds a second float
        // transcendental per row to the cross-engine surface.
        val m = mgr(s, d)
        val docs = m.getDDFByName("documents").df
        pipeline.Dsir.resample(
            docs.filter(col("doc_id") % 7 =!= 0),
            docs.filter(col("doc_id") % 7 === 0),
            "text", "doc_id", k = 25, buckets = 4096)
          .select(col("id").as("doc_id"), col("n_feats"),
            round(col("weight"), 6).as("weight"))
          .orderBy(col("weight").desc, col("doc_id"))
      },
      Some(s"""WITH $duckDsirW,
              |sel AS (SELECT doc_id, n_feats, weight FROM full_w
              |  WHERE n_feats > 0
              |  ORDER BY weight DESC, doc_id LIMIT 25)
              |SELECT doc_id, n_feats, round(weight, 6) AS weight
              |FROM sel ORDER BY weight DESC, doc_id""".stripMargin)),

    Q("t09_span_dedup",
      (s, d) => {
        val m = mgr(s, d)
        // sub-document dedup at 6-token span granularity (the fixture has
        // no paragraph markup); winner selection and reassembly are exact
        // string/int work — hash-exact oracle
        pipeline.Dedup.spanDedup(m.getDDFByName("documents").df,
            "text", "doc_id", w = 6)
          .withColumnRenamed("id", "doc_id")
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, ${duckToks("text")} AS tk FROM documents),
              |spans AS (SELECT doc_id, i - 1 AS idx,
              |    array_to_string(tk[(i-1)*6+1:i*6], ' ') AS seg
              |  FROM toks, unnest(range(1, cast(ceil(len(tk) / 6.0) AS INT) + 1)) AS t(i)
              |  WHERE len(tk) > 0),
              |fp AS (SELECT doc_id, idx, seg, md5(seg) AS f FROM spans),
              |w1 AS (SELECT f, min(doc_id) AS wid FROM fp GROUP BY f),
              |w2 AS (SELECT fp.f, w1.wid, min(fp.idx) AS widx
              |  FROM fp JOIN w1 ON fp.f = w1.f AND fp.doc_id = w1.wid GROUP BY 1, 2),
              |kept AS (SELECT fp.doc_id, fp.idx, fp.seg
              |  FROM fp JOIN w2 ON fp.f = w2.f AND fp.doc_id = w2.wid AND fp.idx = w2.widx),
              |tot AS (SELECT doc_id, count(*) AS n_total FROM spans GROUP BY 1)
              |SELECT k.doc_id, string_agg(k.seg, ' ' ORDER BY k.idx) AS text,
              |  count(*) AS n_kept, any_value(t.n_total) AS n_total
              |FROM kept k JOIN tot t USING (doc_id)
              |GROUP BY k.doc_id ORDER BY k.doc_id""".stripMargin)),

    Q("t10_unigram_logprob",
      (s, d) => {
        val m = mgr(s, d)
        // corpus-unigram LM quality signal; per-doc totals fold term
        // contributions in token order (bit-stable float sum, as c02)
        pipeline.TextAnalysis.unigramLogProb(m.getDDFByName("documents").df,
            "text", "doc_id")
          .select(col("id").as("doc_id"), col("n_tokens"),
            round(col("avg_logp"), 6).as("avg_logp"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest(${duckToks("text")}) AS token
              |  FROM documents),
              |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
              |vocab AS (SELECT token, sum(tf) AS cnt FROM tf GROUP BY 1),
              |n AS (SELECT sum(cnt) AS n FROM vocab),
              |lp AS (SELECT doc_id, token,
              |    tf, tf * ln(cnt::DOUBLE / n::DOUBLE) AS lp
              |  FROM tf JOIN vocab USING (token), n)
              |SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
              |  round(list_reduce(list_prepend(0.0, list(lp ORDER BY token)),
              |    (acc, x) -> acc + x) / sum(tf), 6) AS avg_logp
              |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    Q("t13_bigram_logprob",
      (s, d) => {
        val m = mgr(s, d)
        // corpus-bigram LM with interpolated add-1 smoothing: one order
        // of context beyond t10 — the deterministic CCNet-perplexity
        // analog at bigram order; per-doc fold in bigram order
        pipeline.TextAnalysis.bigramLogProb(m.getDDFByName("documents").df,
            "text", "doc_id")
          .select(col("id").as("doc_id"), col("n_bigrams"),
            round(col("avg_logp2"), 6).as("avg_logp2"))
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, ${duckToks("text")} AS t FROM documents),
              |bgx AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
              |    i -> t[i] || ' ' || t[i+1])) AS bg FROM toks),
              |tf2 AS (SELECT doc_id, bg, count(*)::BIGINT AS tf2 FROM bgx GROUP BY 1, 2),
              |c2 AS (SELECT bg, sum(tf2)::BIGINT AS c2 FROM tf2 GROUP BY 1),
              |tok AS (SELECT doc_id, unnest(t) AS token FROM toks),
              |c1 AS (SELECT token, count(*)::BIGINT AS c1 FROM tok GROUP BY 1),
              |nn AS (SELECT count(*) AS n FROM tok),
              |lp AS (SELECT doc_id, bg, tf2,
              |    tf2 * ln((c2 + 1.0 * c1b.c1::DOUBLE / nn.n::DOUBLE)
              |             / (c1a.c1 + 1.0)) AS lp
              |  FROM tf2 JOIN c2 USING (bg)
              |  JOIN c1 c1a ON split_part(bg, ' ', 1) = c1a.token
              |  JOIN c1 c1b ON split_part(bg, ' ', 2) = c1b.token, nn),
              |sc AS (SELECT doc_id, sum(tf2)::BIGINT AS n_bigrams,
              |    round(list_reduce(list_prepend(0.0, list(lp ORDER BY bg)),
              |      (acc, x) -> acc + x) / sum(tf2), 6) AS avg_logp2
              |  FROM lp GROUP BY doc_id)
              |SELECT d.doc_id, coalesce(n_bigrams, 0) AS n_bigrams, avg_logp2
              |FROM documents d LEFT JOIN sc USING (doc_id)
              |ORDER BY d.doc_id""".stripMargin)),

    Q("t27_ccnet_buckets",
      (s, d) => {
        val m = mgr(s, d)
        val docs = m.getDDFByName("documents").df
        // CCNet head/middle/tail: t10's corpus-unigram LM score bucketed
        // PER LANGUAGE at the 1/3 and 2/3 nearest-rank boundaries (higher
        // avg_logp = more probable = head). Buckets are rank-determined —
        // the boundary is a selected data value, and docs tied at it land
        // together — so a sub-round-6 float wobble in the score cannot
        // flip membership across engines.
        val scored = pipeline.TextAnalysis.unigramLogProb(docs, "text", "doc_id")
          .select(col("id").as("doc_id"), col("avg_logp"))
          .join(docs.select("doc_id", "lang"), Seq("doc_id"))
        Stats.bucketByGroupQuantiles(scored, "avg_logp", "lang",
            Seq(1.0 / 3, 2.0 / 3), Seq("tail", "middle", "head"))
          .select(col("doc_id"), col("lang"),
            round(col("avg_logp"), 6).as("avg_logp"), col("bucket"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest(${duckToks("text")}) AS token
              |  FROM documents),
              |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
              |vocab AS (SELECT token, sum(tf) AS cnt FROM tf GROUP BY 1),
              |nt AS (SELECT sum(cnt) AS n FROM vocab),
              |lp AS (SELECT doc_id, token, tf,
              |    tf * ln(cnt::DOUBLE / n::DOUBLE) AS lp
              |  FROM tf JOIN vocab USING (token), nt),
              |sc AS (SELECT doc_id,
              |    list_reduce(list_prepend(0.0, list(lp ORDER BY token)),
              |      (acc, x) -> acc + x) / sum(tf) AS avg_logp
              |  FROM lp GROUP BY doc_id),
              |j AS (SELECT s.doc_id, d.lang, s.avg_logp
              |  FROM sc s JOIN documents d USING (doc_id)),
              |r AS (SELECT doc_id, lang, avg_logp,
              |    row_number() OVER (PARTITION BY lang ORDER BY avg_logp) AS rn,
              |    count(*) OVER (PARTITION BY lang) AS n FROM j),
              |b AS (SELECT lang,
              |    max(CASE WHEN rn = greatest(ceil(round((1.0/3) * n, 9))::BIGINT, 1)
              |        THEN avg_logp END) AS c1,
              |    max(CASE WHEN rn = greatest(ceil(round((2.0/3) * n, 9))::BIGINT, 1)
              |        THEN avg_logp END) AS c2
              |  FROM r GROUP BY lang)
              |SELECT j.doc_id, j.lang, round(j.avg_logp, 6) AS avg_logp,
              |  CASE WHEN j.avg_logp <= b.c1 THEN 'tail'
              |       WHEN j.avg_logp <= b.c2 THEN 'middle'
              |       ELSE 'head' END AS bucket
              |FROM j JOIN b USING (lang) ORDER BY j.doc_id""".stripMargin)),

    Q("t28_char_entropy",
      (s, d) => {
        val m = mgr(s, d)
        // code-point Shannon entropy (bits) — the model-free gibberish/
        // compressibility gate, as the native codegen'd char_entropy
        // (registered SQL function). Term-fold order differs between the
        // engines (ascending code point vs group order) — pure float
        // association noise ~1e-15 on ~4-bit entropies, 9 orders under
        // the round(6) grid.
        m.getDDFByName("documents").df
          .select(col("doc_id").as("id"),
            expr("round(char_entropy(text), 6)").as("entropy"))
          .orderBy("id")
      },
      Some("""WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c
             |  FROM documents),
             |cnt AS (SELECT doc_id, c, count(*)::DOUBLE AS k FROM ch GROUP BY 1, 2),
             |tot AS (SELECT doc_id, sum(k) AS n FROM cnt GROUP BY 1)
             |SELECT doc_id AS id,
             |  round(-sum((k / n) * log2(k / n)), 6) AS entropy
             |FROM cnt JOIN tot USING (doc_id)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("t11_hashed_features",
      (s, d) => {
        val m = mgr(s, d)
        // the hashing-trick featurization behind model-based quality
        // filtering: bucket = portableFold(token) mod 64, per-doc counts
        // as a sparse (indices, vals) pair — dictionary-free, so an
        // incremental batch featurizes identically at any corpus scale.
        // RULE (round-5 red cell): oracle query outputs must be
        // SCALAR-typed columns only — the driver's pandas checker cannot
        // sort/hash array cells (TypeError: unhashable ndarray), so the
        // sparse vector is serialized as csv strings, the move d10
        // already uses for its band signatures. vals are integral counts
        // by construction, so the csv goes through bigint (no float
        // formatting to disagree on).
        pipeline.TextAnalysis.hashedTokenFeatures(
            m.getDDFByName("documents").df.filter(col("doc_id") < 200),
            "text", "doc_id", dim = 64)
          .withColumnRenamed("id", "doc_id")
          .select(col("doc_id"),
            concat_ws(",", expr("transform(indices, i -> cast(i as string))"))
              .as("indices_csv"),
            concat_ws(",", expr("transform(vals, v -> cast(cast(v as bigint) as string))"))
              .as("vals_csv"))
          .orderBy("doc_id")
      },
      Some(s"""WITH ex AS (SELECT doc_id, unnest(${duckToks("text")}) AS token
              |  FROM documents WHERE doc_id < 200),
              |h AS (SELECT doc_id,
              |    (list_reduce(list_prepend(0::BIGINT,
              |       list_transform(regexp_split_to_array(token, ''),
              |         c -> coalesce(ascii(c), 0)::BIGINT)),
              |     (acc, x) -> (acc * 31 + x) % 1000000007) % 64)::INT AS bucket
              |  FROM ex),
              |c AS (SELECT doc_id, bucket, count(*)::BIGINT AS cnt
              |  FROM h GROUP BY 1, 2),
              |g AS (SELECT doc_id,
              |    string_agg(bucket::VARCHAR, ',' ORDER BY bucket) AS indices_csv,
              |    string_agg(cnt::VARCHAR, ',' ORDER BY bucket) AS vals_csv
              |  FROM c GROUP BY doc_id)
              |SELECT d.doc_id, coalesce(g.indices_csv, '') AS indices_csv,
              |  coalesce(g.vals_csv, '') AS vals_csv
              |FROM (SELECT doc_id FROM documents WHERE doc_id < 200) d
              |LEFT JOIN g USING (doc_id) ORDER BY d.doc_id""".stripMargin)),

    Q("t24_nb_quality",
      (s, d) => {
        val m = mgr(s, d)
        // hashed Naive Bayes quality classifier, trained on a source
        // split (src0-3 = the "high-quality seed", everything else the
        // crawl negative) and applied to the whole corpus in one job —
        // the fastText-classifier analog of LLM curation stacks. Per-doc
        // log-odds fold in bucket order (bit-stable float sum, as t10);
        // ln rounded at 6 per the t10 precedent.
        pipeline.TextAnalysis.nbQualityScore(m.getDDFByName("documents").df,
            "text", "doc_id",
            isPos = col("source").isin("src0", "src1", "src2", "src3"), dim = 64)
          .select(col("id").as("doc_id"), col("n_tokens"),
            round(col("logodds"), 6).as("logodds"), col("pred_hq"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest(${duckToks("text")}) AS token
              |  FROM documents),
              |fb AS (SELECT doc_id,
              |    (list_reduce(list_prepend(0::BIGINT,
              |       list_transform(regexp_split_to_array(token, ''),
              |         c -> coalesce(ascii(c), 0)::BIGINT)),
              |     (acc, x) -> (acc * 31 + x) % 1000000007) % 64)::INT AS b
              |  FROM tok),
              |db AS (SELECT doc_id, b, count(*)::BIGINT AS cnt FROM fb GROUP BY 1, 2),
              |lab AS (SELECT doc_id, source IN ('src0','src1','src2','src3') AS pos
              |  FROM documents),
              |cb AS (SELECT b,
              |    sum(CASE WHEN pos THEN cnt ELSE 0 END)::BIGINT AS cp,
              |    sum(CASE WHEN pos THEN 0 ELSE cnt END)::BIGINT AS cn
              |  FROM db JOIN lab USING (doc_id) GROUP BY b),
              |tots AS (SELECT sum(cp)::BIGINT AS tp, sum(cn)::BIGINT AS tn FROM cb),
              |w AS (SELECT b, ln((cp + 1.0::DOUBLE) / (tp + 64.0::DOUBLE))
              |    - ln((cn + 1.0::DOUBLE) / (tn + 64.0::DOUBLE)) AS lw FROM cb, tots),
              |per AS (SELECT doc_id, sum(cnt)::BIGINT AS n_tokens,
              |    list_reduce(list_prepend(0.0::DOUBLE, list(cnt * lw ORDER BY b)),
              |      (acc, x) -> acc + x) / sum(cnt) AS lo
              |  FROM db JOIN w USING (b) GROUP BY doc_id)
              |SELECT d.doc_id, coalesce(p.n_tokens, 0) AS n_tokens,
              |  round(p.lo, 6) AS logodds, p.lo > 0.0 AS pred_hq
              |FROM documents d LEFT JOIN per p USING (doc_id)
              |ORDER BY d.doc_id""".stripMargin)),

    Q("t25_pareto_sample",
      (s, d) => {
        val m = mgr(s, d)
        // the documented GPT-3 curation rule: keep a doc iff a Pareto
        // draw beats 1 − sigmoid(quality log-odds) — most high scorers
        // kept, a long tail of low scorers still admitted (no hard cliff
        // at the classifier boundary). The uniform driving the draw is
        // hash-derived from the doc id, so the kept set is a pure
        // function of (ids, scores) — replayable and engine-portable.
        val scored = pipeline.TextAnalysis.nbQualityScore(
          m.getDDFByName("documents").df, "text", "doc_id",
          isPos = col("source").isin("src0", "src1", "src2", "src3"), dim = 64)
        pipeline.TextAnalysis.paretoQualitySample(scored, "id", "logodds", alpha = 9.0)
          .select(col("id").as("doc_id"),
            round(col("q"), 6).as("q"), round(col("pareto"), 6).as("pareto"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest(${duckToks("text")}) AS token
              |  FROM documents),
              |fb AS (SELECT doc_id,
              |    (list_reduce(list_prepend(0::BIGINT,
              |       list_transform(regexp_split_to_array(token, ''),
              |         c -> coalesce(ascii(c), 0)::BIGINT)),
              |     (acc, x) -> (acc * 31 + x) % 1000000007) % 64)::INT AS b
              |  FROM tok),
              |db AS (SELECT doc_id, b, count(*)::BIGINT AS cnt FROM fb GROUP BY 1, 2),
              |lab AS (SELECT doc_id, source IN ('src0','src1','src2','src3') AS pos
              |  FROM documents),
              |cb AS (SELECT b,
              |    sum(CASE WHEN pos THEN cnt ELSE 0 END)::BIGINT AS cp,
              |    sum(CASE WHEN pos THEN 0 ELSE cnt END)::BIGINT AS cn
              |  FROM db JOIN lab USING (doc_id) GROUP BY b),
              |tots AS (SELECT sum(cp)::BIGINT AS tp, sum(cn)::BIGINT AS tn FROM cb),
              |w AS (SELECT b, ln((cp + 1.0::DOUBLE) / (tp + 64.0::DOUBLE))
              |    - ln((cn + 1.0::DOUBLE) / (tn + 64.0::DOUBLE)) AS lw FROM cb, tots),
              |per AS (SELECT doc_id,
              |    list_reduce(list_prepend(0.0::DOUBLE, list(cnt * lw ORDER BY b)),
              |      (acc, x) -> acc + x) / sum(cnt) AS lo
              |  FROM db JOIN w USING (b) GROUP BY doc_id),
              |pq AS (SELECT doc_id,
              |    1.0::DOUBLE / (1.0::DOUBLE + exp(-lo)) AS q,
              |    pow((list_reduce(list_prepend(0::BIGINT,
              |        list_transform(regexp_split_to_array(doc_id::VARCHAR, ''),
              |          c -> coalesce(ascii(c), 0)::BIGINT)),
              |      (acc, x) -> (acc * 31 + x) % 1000000007) % 1000003 + 1.0::DOUBLE)
              |        / 1000004.0::DOUBLE,
              |      ${-1.0 / 9.0}) - 1.0::DOUBLE AS pareto
              |  FROM per WHERE lo IS NOT NULL)
              |SELECT doc_id, round(q, 6) AS q, round(pareto, 6) AS pareto
              |FROM pq WHERE pareto > 1.0::DOUBLE - q
              |ORDER BY doc_id""".stripMargin)),

    Q("t12_boilerplate",
      (s, d) => {
        val m = mgr(s, d)
        // corpus-frequency boilerplate scoring: a doc is flagged when
        // most of its 3-gram shingles occur in > dfThreshold documents
        pipeline.TextAnalysis.boilerplateScore(
            m.getDDFByName("documents").df, "text", "doc_id",
            dfThreshold = 5L, maxRatio = 0.5)
          .orderBy("id")
      },
      Some(s"""WITH sh AS (SELECT doc_id, unnest(${duckShingles("text")}) AS sh
              |  FROM documents),
              |dfc AS (SELECT sh, count(*)::BIGINT AS dfc FROM sh GROUP BY sh),
              |sc AS (SELECT s.doc_id, count(*)::BIGINT AS n_shingles,
              |    cast(sum(CASE WHEN dfc > 5 THEN 1 ELSE 0 END) as bigint) AS n_common
              |  FROM sh s JOIN dfc USING (sh) GROUP BY s.doc_id)
              |SELECT d.doc_id AS id,
              |  coalesce(n_shingles, 0) AS n_shingles,
              |  coalesce(n_common, 0) AS n_common,
              |  CASE WHEN coalesce(n_shingles, 0) = 0 THEN 0.0
              |       ELSE coalesce(n_common, 0)::DOUBLE / n_shingles END AS boiler_ratio,
              |  (CASE WHEN coalesce(n_shingles, 0) = 0 THEN 0.0
              |        ELSE coalesce(n_common, 0)::DOUBLE / n_shingles END) <= 0.5 AS keep
              |FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY id""".stripMargin))
  )

  // =====================================================================
  // Round-5 ingest oracles (S1/S2): the LOAD/loadFile CSV surface checked
  // against DuckDB read_csv — the largest previously spec-only block.
  // Fixture CSVs are DERIVED deterministically from the driver's
  // documents.parquet (sorted by doc_id, planted NULL/empty cells at
  // fixed id residues) and written under target/ — generation is
  // driver-side 500-row work by design; the thing under test is the
  // distributed READ path (Dialect.load / DDFManager.loadFile).
  // =====================================================================

  // relocatable: the oracle SQL strings interpolate this path at runtime,
  // so deriving it from the working directory (or an explicit override)
  // keeps s02/s03/s04 working when the repo is cloned elsewhere
  private val fixtureDir = java.nio.file.Paths.get(
    sys.env.getOrElse("GRAFT_FIXTURE_DIR",
      java.nio.file.Paths.get(sys.props("user.dir"), "target", "graft_fixtures").toString))
  private val s02Path = fixtureDir.resolve("s02.csv").toString
  private val s03Path = fixtureDir.resolve("s03.csv").toString

  private def writeFixture(path: String, lines: Seq[String]): String = {
    java.nio.file.Files.createDirectories(fixtureDir)
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      lines.mkString("", "\n", "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    path
  }

  /** Fixture rows are PURE ARITHMETIC in the row id (langs/sizes from
    * fixed residues), deliberately NOT sampled from documents.parquet:
    * the fixture file sits at one fixed path the static oracle SQL can
    * name, so content derived from a particular sfDir would go stale the
    * moment Verify runs at another scale (the parquet dump and the
    * oracle's read_csv would see different bytes). Arithmetic content is
    * identical at every sf — the ingest path under test does not care
    * where cell values came from.
    */
  private val fixtureLangs = Seq("en", "fr", "de", "es", "zh")

  /** LOAD fixture: id,lang,n_chars,score,ts with planted null-string /
    * empty cells. Residues chosen so every column exercises its null
    * path: %7 → 'NA' in a bigint, %11 → empty string cell (verbatim ""
    * per the reference's string semantics), %13 → empty numeric cell,
    * %17 → 'NA' in the timestamp. score = n_chars + .25 stays exactly
    * representable so both engines parse the identical double.
    */
  private def s02Fixture(): String = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    val base = java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
    writeFixture(s02Path, (0L until 500L).map { id =>
      val nCharsVal = 100 + (id * 17) % 900
      val lang = if (id % 11 == 0) "" else fixtureLangs((id % 5).toInt)
      val nChars = if (id % 7 == 0) "NA" else nCharsVal.toString
      val score = if (id % 13 == 0) "" else s"$nCharsVal.25"
      val ts = if (id % 17 == 0) "NA" else base.plusMinutes(id).format(fmt)
      s"$id,$lang,$nChars,$score,$ts"
    })
  }

  /** Inference fixture for the reference-exact 5-row vote: V1 int,
    * V2 int-voted with post-sample garbage (type changes after row 5 —
    * the divergence the vote semantics pin: later unparseable cells null
    * rather than re-typing the column), V3 double, V4 boolean (T/f/
    * true/False spellings; an in-sample 'NA' is ignored by the vote),
    * V5 string with planted 'NA' → null (the loadFile reader's
    * nullValue). Only NON-NUMERIC garbage goes in the int column:
    * DuckDB TRY_CAST('12.5' AS INT) rounds to 13 where Spark nulls, so
    * decimal strings in an int column would split the engines.
    */
  private def s03Fixture(): String =
    writeFixture(s03Path, (0L until 500L).map { id =>
      val v2 = if (id >= 6 && id % 23 == 0) "oops" else (id * 10).toString
      val v4 = if (id == 2) "NA" else Seq("T", "f", "true", "False")((id % 4).toInt)
      val v5 = if (id % 19 == 0) "NA" else fixtureLangs((id % 5).toInt)
      s"$id,$v2,$id.5,$v4,$v5"
    })

  private val ingestQ: Seq[Q] = Seq(
    Q("s02_load_csv",
      (s, d) => {
        val m = mgr(s, d)
        val path = s02Fixture()
        // S2/S3 end-to-end through the dialect: declared schema, then
        // LOAD with reference cell semantics (strings verbatim, null
        // string / empty → null under NO DEFAULTS, pinned ts format)
        m.sql2ddf("CREATE TABLE s02_tbl (id bigint, lang varchar, " +
          "n_chars bigint, score double, ts timestamp)")
        m.sql2ddf(s"LOAD '$path' WITH NULL 'NA' WITH TIMESTAMP FORMAT " +
          "'yyyy-MM-dd HH:mm:ss' NO DEFAULTS INTO s02_tbl")
          .df.orderBy("id")
      },
      // DuckDB reads every cell as VARCHAR (empty → NULL) and applies
      // the SAME per-column semantics the loader declares: strings
      // verbatim-with-"" , null-string match then try-parse for typed
      // columns. NULLIF also routes the empty-as-NULL cells — TRY_CAST
      // of NULL is NULL either way.
      Some(s"""SELECT TRY_CAST(c0 AS BIGINT) AS id,
              |  COALESCE(c1, '') AS lang,
              |  TRY_CAST(NULLIF(c2, 'NA') AS BIGINT) AS n_chars,
              |  TRY_CAST(NULLIF(c3, 'NA') AS DOUBLE) AS score,
              |  try_strptime(NULLIF(c4, 'NA'), '%Y-%m-%d %H:%M:%S') AS ts
              |FROM read_csv('$s02Path', header=false, all_varchar=true,
              |  columns={'c0':'VARCHAR','c1':'VARCHAR','c2':'VARCHAR',
              |           'c3':'VARCHAR','c4':'VARCHAR'})
              |ORDER BY id""".stripMargin)),

    Q("s04_load_defaults",
      (s, d) => {
        val m = mgr(s, d)
        val path = s02Fixture()
        // the defaults path of the same LOAD: unparseable/null numeric
        // cells take the typed default (0) instead of null; timestamps
        // have no default and stay null (reference
        // RepresentationHandler.scala:115-137)
        m.sql2ddf("CREATE TABLE s04_tbl (id bigint, lang varchar, " +
          "n_chars bigint, score double, ts timestamp)")
        m.sql2ddf(s"LOAD '$path' WITH NULL 'NA' WITH TIMESTAMP FORMAT " +
          "'yyyy-MM-dd HH:mm:ss' INTO s04_tbl")
          .df.orderBy("id")
      },
      Some(s"""SELECT TRY_CAST(c0 AS BIGINT) AS id,
              |  COALESCE(c1, '') AS lang,
              |  COALESCE(TRY_CAST(NULLIF(c2, 'NA') AS BIGINT), 0) AS n_chars,
              |  COALESCE(TRY_CAST(NULLIF(c3, 'NA') AS DOUBLE), 0.0) AS score,
              |  try_strptime(NULLIF(c4, 'NA'), '%Y-%m-%d %H:%M:%S') AS ts
              |FROM read_csv('$s02Path', header=false, all_varchar=true,
              |  columns={'c0':'VARCHAR','c1':'VARCHAR','c2':'VARCHAR',
              |           'c3':'VARCHAR','c4':'VARCHAR'})
              |ORDER BY id""".stripMargin)),

    Q("s03_load_infer",
      (s, d) => {
        val m = mgr(s, d)
        val path = s03Fixture()
        // S1 five-row vote (reference Utils.java:97-150): V1 int, V2 int
        // despite post-sample garbage, V3 double, V4 boolean, V5 string
        m.loadFile(path, ",", sampleInference = true).df.orderBy("V1")
      },
      Some(s"""SELECT TRY_CAST(c0 AS INTEGER) AS V1,
              |  TRY_CAST(c1 AS INTEGER) AS V2,
              |  TRY_CAST(c2 AS DOUBLE) AS V3,
              |  CASE WHEN lower(c3) IN ('t', 'true') THEN true
              |       WHEN lower(c3) IN ('f', 'false') THEN false END AS V4,
              |  NULLIF(c4, 'NA') AS V5
              |FROM read_csv('$s03Path', header=false, all_varchar=true,
              |  columns={'c0':'VARCHAR','c1':'VARCHAR','c2':'VARCHAR',
              |           'c3':'VARCHAR','c4':'VARCHAR'})
              |ORDER BY V1""".stripMargin)),

    Q("m02_image_roundtrip",
      (s, d) => {
        val m = mgr(s, d)
        // The REAL image codec path, oracle-checked end-to-end: for each
        // doc_id < 20, build a 4×2 grayscale PNG whose halves hold
        // colors c1 = (id·37) mod 256 and c2 = (id·91) mod 256, then
        // PNG-encode → distributed nearest-neighbor resize to 2×1 →
        // PNG-re-encode → decode → pixel statistics. Grayscale makes
        // every emitted feature a closed-form EXACT value (channel means
        // = (c1+c2)/2, per-mille luma = 1000·c so meanLuma = (c1+c2)/2
        // and stdLuma = |c1−c2|/2 — all integers or halves, exact in
        // float and double), so DuckDB verifies the whole codec chain
        // from the id arithmetic alone. A decode/resize/encode bug
        // CANNOT reproduce these values.
        import s.implicits._
        val docIds = m.getDDFByName("documents").df
          .filter(col("doc_id") < 20).select("doc_id")
          .collect().map(_.getLong(0)).toSeq.sorted
        val imgs = docIds.map { id =>
          val c1 = ((id * 37) % 256).toInt; val c2 = ((id * 91) % 256).toInt
          val img = new java.awt.image.BufferedImage(4, 2,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          for (y <- 0 until 2; x <- 0 until 4) {
            val c = if (x < 2) c1 else c2
            img.setRGB(x, y, (c << 16) | (c << 8) | c)
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
        val df = imgs.toDF("id", "payload")
        val resized = pipeline.Multimodal.resizeImages(df, "id", "payload",
          targetW = 2, targetH = 1)
        pipeline.Multimodal.extractFeatures(
            resized.select("id", "payload"), "id", "payload")
          .select(col("id"),
            col("features")(0).cast("double").as("w"),
            col("features")(1).cast("double").as("h"),
            col("features")(2).cast("double").as("aspect"),
            col("features")(3).cast("double").as("mean_r"),
            col("features")(4).cast("double").as("mean_g"),
            col("features")(5).cast("double").as("mean_b"),
            col("features")(6).cast("double").as("mean_luma"),
            col("features")(7).cast("double").as("std_luma"))
          .orderBy("id")
      },
      Some("""SELECT doc_id AS id, 2.0::DOUBLE AS w, 1.0::DOUBLE AS h,
             |  2.0::DOUBLE AS aspect,
             |  (((doc_id*37)%256 + (doc_id*91)%256)/2.0)::DOUBLE AS mean_r,
             |  (((doc_id*37)%256 + (doc_id*91)%256)/2.0)::DOUBLE AS mean_g,
             |  (((doc_id*37)%256 + (doc_id*91)%256)/2.0)::DOUBLE AS mean_b,
             |  (((doc_id*37)%256 + (doc_id*91)%256)/2.0)::DOUBLE AS mean_luma,
             |  (abs((doc_id*37)%256 - (doc_id*91)%256)/2.0)::DOUBLE AS std_luma
             |FROM documents WHERE doc_id < 20 ORDER BY id""".stripMargin)),

    Q("m03_audio_roundtrip",
      (s, d) => {
        val m = mgr(s, d)
        // The REAL audio codec path, oracle-checked end-to-end: for each
        // doc_id < 20, build a 1024-frame mono 16-bit WAV at 8 kHz whose
        // first half holds +a and second half −a, a = 256 + 16·((id·37)
        // mod 1024). WAV-encode via the JDK → distributed decode →
        // sample statistics. Every emitted feature is a closed-form
        // EXACT integer (mean 0, meanAbs = peak = a, one zero crossing),
        // so DuckDB verifies the whole encode→decode chain from the id
        // arithmetic alone. A header-parse or sample-unpack bug CANNOT
        // reproduce these values.
        import s.implicits._
        val docIds = m.getDDFByName("documents").df
          .filter(col("doc_id") < 20).select("doc_id")
          .collect().map(_.getLong(0)).toSeq.sorted
        val wavs = docIds.map { id =>
          val a = (256 + 16 * ((id * 37) % 1024)).toShort
          val samples = Array.tabulate[Short](1024)(i => if (i < 512) a else (-a).toShort)
          (id, pipeline.Multimodal.encodeWav(samples, 8000f))
        }
        pipeline.Multimodal.extractFeatures(wavs.toDF("id", "payload"), "id", "payload")
          .select(col("id"),
            col("features")(0).cast("double").as("sample_rate"),
            col("features")(1).cast("double").as("channels"),
            col("features")(2).cast("double").as("n_frames"),
            col("features")(3).cast("double").as("bits"),
            col("features")(4).cast("double").as("mean_sample"),
            col("features")(5).cast("double").as("mean_abs"),
            col("features")(6).cast("double").as("peak_abs"),
            col("features")(7).cast("double").as("zero_crossings"))
          .orderBy("id")
      },
      Some("""SELECT doc_id AS id, 8000.0::DOUBLE AS sample_rate,
             |  1.0::DOUBLE AS channels, 1024.0::DOUBLE AS n_frames,
             |  16.0::DOUBLE AS bits, 0.0::DOUBLE AS mean_sample,
             |  (256 + 16*((doc_id*37)%1024))::DOUBLE AS mean_abs,
             |  (256 + 16*((doc_id*37)%1024))::DOUBLE AS peak_abs,
             |  1.0::DOUBLE AS zero_crossings
             |FROM documents WHERE doc_id < 20 ORDER BY id""".stripMargin)),

    Q("m04_frame_sample",
      (s, d) => {
        val m = mgr(s, d)
        // Video-style frame sampling oracle-checked end-to-end: payloads
        // are the UTF-8 bytes of documents text (ASCII in the fixtures,
        // so DuckDB's character substring is byte-identical to the
        // engine's binary substring), chunked at 64 bytes, every 2nd
        // frame kept. Emitting md5 of each frame pins the exact BYTES of
        // every sampled chunk — an off-by-one in the chunk arithmetic or
        // a dropped tail frame cannot reproduce the hashes.
        val docs = m.getDDFByName("documents").df
          .filter(col("doc_id") < 50).select(col("doc_id"), col("text"))
        val withBin = pipeline.Multimodal.withBinaryPayload(docs, "text", "video")
        pipeline.Multimodal.sampleFrames(withBin, "doc_id", "payload",
            chunkBytes = 64, everyK = 2)
          .select(col("id"), col("frame_no").cast("long").as("frame_no"),
            octet_length(col("frame_bytes")).cast("long").as("frame_len"),
            md5(col("frame_bytes")).as("frame_hash"))
          .orderBy("id", "frame_no")
      },
      Some("""WITH f AS (
             |  SELECT doc_id AS id, text AS p,
             |    greatest(1, CAST(ceil(length(text)/64.0) AS BIGINT)) AS nc
             |  FROM documents WHERE doc_id < 50),
             |e AS (SELECT id, p, unnest(range(0, nc)) AS frame_no FROM f)
             |SELECT id, frame_no,
             |  length(substring(p, CAST(frame_no*64+1 AS INT), 64)) AS frame_len,
             |  md5(substring(p, CAST(frame_no*64+1 AS INT), 64)) AS frame_hash
             |FROM e WHERE frame_no % 2 = 0
             |ORDER BY id, frame_no""".stripMargin)),

    Q("m05_image_neardup",
      (s, d) => {
        val m = mgr(s, d)
        // Perceptual near-dup detection through the REAL codec chain:
        // 24 actual 9×8 grayscale PNGs whose dHash is a KNOWN 64-bit
        // pattern — each pixel row walks ±8 from 128 following the bits
        // of pat(doc_id % 6), so decode → NN-resample → luma → dHash
        // must reproduce the pattern bits exactly (m02's closed-form
        // trick, extended from pixel statistics to gradient signs).
        // pat1 = pat0^1 (Hamming 1) and pat4 = pat3^3 (Hamming 2) are
        // the designed near-dups; pat2 = pat0 with 3 flipped bits must
        // be REJECTED at maxHamming = 2; same-k ids are exact dups
        // (Hamming 0). The oracle knows only the id arithmetic + the
        // pattern literals and replays the 16-bit banding — a codec,
        // hashing, or banding bug cannot reproduce its pairs.
        import s.implicits._
        val docIds = m.getDDFByName("documents").df
          .filter(col("doc_id") < 24).select("doc_id")
          .collect().map(_.getLong(0)).toSeq.sorted
        val imgs = patternImages(docIds)
        val hashes = pipeline.Multimodal.imageDHashes(
          imgs.toDF("id", "payload"), "id", "payload")
        pipeline.Multimodal.nearDupImagePairs(hashes, "id",
            maxHamming = 2, bands = 4)
          .orderBy("id1", "id2")
      },
      Some("""WITH pat(k, p) AS (VALUES
             |  (0, 4348954285570149135::BIGINT), (1, 4348954285570149134::BIGINT),
             |  (2, 4348954287449197327::BIGINT), (3, 1317473026990674775::BIGINT),
             |  (4, 1317473026990674772::BIGINT), (5, 6510615555426900570::BIGINT)),
             |h AS MATERIALIZED (
             |  SELECT doc_id AS id, p FROM documents
             |  JOIN pat ON pat.k = doc_id % 6 WHERE doc_id < 24),
             |bands AS MATERIALIZED (
             |  SELECT id, p, b, (p >> (b * 16)) & 65535 AS bv
             |  FROM h, (VALUES (0), (1), (2), (3)) t(b)),
             |cand AS (
             |  SELECT DISTINCT a.id AS id1, b.id AS id2, a.p AS p1, b.p AS p2
             |  FROM bands a JOIN bands b
             |    ON a.b = b.b AND a.bv = b.bv AND a.id < b.id)
             |SELECT id1, id2, bit_count(xor(p1, p2))::BIGINT AS hamming
             |FROM cand WHERE bit_count(xor(p1, p2)) <= 2
             |ORDER BY id1, id2""".stripMargin)),

    Q("z01_zorder_roundtrip",
      (s, d) => {
        val m = mgr(s, d)
        // Z-order clustered rewrite of lineitem on (l_partkey, l_suppkey),
        // then read back: content must be EXACTLY the source — only the
        // file layout (and so footer-stat pruning) changes. The layout
        // win itself is measured in tools/ZorderSmoke + LayoutSpec.
        val src = m.getDDFByName("lineitem").df
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
        val dir = s"${System.getProperty("java.io.tmpdir")}/graft_z01_" +
          java.security.MessageDigest.getInstance("MD5")
            .digest(d.getBytes).map("%02x".format(_)).mkString.take(8)
        sources.Layout.zorderWrite(src, Seq("l_partkey", "l_suppkey"), dir,
          numFiles = 8)
        s.read.parquet(dir).orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("bk01_bucketed_join",
      (s, d) => {
        val m = mgr(s, d)
        // The full bucketed-sink loop oracle-checked end-to-end: write
        // BOTH join sides bucketed+sorted on the join key, read back via
        // the catalog, join and aggregate. The oracle is the PLAIN join
        // — bucketing is layout-only, so the content must be invisible
        // (the no-Exchange plan win itself is pinned in ScaleSpec).
        val o = m.getDDFByName("orders").df
          .select("o_orderkey", "o_custkey", "o_totalprice")
        val c = m.getDDFByName("customer").df
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
        sources.Bucketing.writeBucketed(o, "graft_bk01_orders", Seq("o_custkey"), 8)
        sources.Bucketing.writeBucketed(c, "graft_bk01_customer", Seq("o_custkey"), 8)
        sources.Bucketing.readBucketed(s, "graft_bk01_orders")
          .join(sources.Bucketing.readBucketed(s, "graft_bk01_customer"), "o_custkey")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("rev"))
          .orderBy("c_mktsegment")
      },
      Some(s"""SELECT c_mktsegment, count(*)::BIGINT AS n_orders,
              |  ${dsumSql("o_totalprice")} AS rev
              |FROM orders JOIN customer ON o_custkey = c_custkey
              |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))
  )

  // =====================================================================
  // URL / domain curation (w-family; r15 — no reference counterpart, the
  // CommonCrawl-style web-corpus operators). The documents table carries
  // no URL column, so each query derives a deterministic MESSY url from
  // doc_id (mixed-case scheme/host, default + explicit ports, tracking
  // params, fragments, empty paths) identically on both engines, then
  // the Spark side exercises pipeline.UrlCuration while the oracle
  // transliterates the normalization contract step for step.
  // =====================================================================

  /** Synthetic messy URL from doc_id; `hostMod` controls domain
    * cardinality (small → per-domain caps and URL dedup actually bind).
    */
  private def syntheticUrl(hostMod: Int): Column = {
    val id = col("doc_id")
    val scheme = when(id % 3 === 0, "HTTPS").when(id % 3 === 1, "http")
      .otherwise("https")
    val tld = when(id % 7 === 0, "Co.UK")
      .when(id % 7 === 1 || id % 7 === 2, "example.COM")
      .when(id % 7 === 3, "GitHub.IO")
      .when(id % 7 === 4, "blogspot.com")
      .when(id % 7 === 5, "org")
      .otherwise("net.au")
    val port = when(id % 5 === 0, ":443").when(id % 5 === 1, ":8080")
      .otherwise("")
    val path = when(id % 4 === 0, "").when(id % 4 === 1, "/")
      .otherwise(concat(lit("/Articles/"), (id % 100).cast("string")))
    val query = when(id % 6 === 0,
        concat(lit("?utm_source=feed&id="), (id % 50).cast("string")))
      .when(id % 6 === 1,
        concat(lit("?id="), (id % 50).cast("string"), lit("&utm_campaign=x&ref=tw")))
      .when(id % 6 === 2, "?gclid=abc123")
      .when(id % 6 === 3, "?a=1&b=2")
      .otherwise("")
    val frag = when(id % 8 === 0, "#Section-2").otherwise("")
    // id % 13 == 9 rows are IPv6-literal URLs — they pin the r16
    // bracketed-authority quarantine (NULL canonical key) in the oracle
    when(id % 13 === 9,
      concat(lit("https://[2001:db8::"), (id % 4).cast("string"),
        lit("]:8080/v6/"), (id % 10).cast("string")))
      .otherwise(concat(scheme, lit("://Site-"), (id % hostMod).cast("string"),
        lit("."), tld, port, path, query, frag))
  }

  /** DuckDB twin of [[syntheticUrl]]. NOTE: these helper strings are
    * interpolated into oracle templates that apply .stripMargin to the
    * WHOLE result, so no emitted line may start with whitespace + `|` —
    * every `||` concat sits at a line END.
    */
  private def duckUrlRaw(hostMod: Int): String =
    s"""CASE WHEN doc_id % 13 = 9 THEN 'https://[2001:db8::' ||
       |    (doc_id % 4)::VARCHAR || ']:8080/v6/' || (doc_id % 10)::VARCHAR
       |  ELSE
       |  CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' WHEN doc_id % 3 = 1 THEN 'http'
       |       ELSE 'https' END ||
       |  '://Site-' || (doc_id % $hostMod)::VARCHAR || '.' ||
       |  CASE WHEN doc_id % 7 = 0 THEN 'Co.UK'
       |       WHEN doc_id % 7 IN (1, 2) THEN 'example.COM'
       |       WHEN doc_id % 7 = 3 THEN 'GitHub.IO'
       |       WHEN doc_id % 7 = 4 THEN 'blogspot.com'
       |       WHEN doc_id % 7 = 5 THEN 'org' ELSE 'net.au' END ||
       |  CASE WHEN doc_id % 5 = 0 THEN ':443'
       |       WHEN doc_id % 5 = 1 THEN ':8080' ELSE '' END ||
       |  CASE WHEN doc_id % 4 = 0 THEN '' WHEN doc_id % 4 = 1 THEN '/'
       |       ELSE '/Articles/' || (doc_id % 100)::VARCHAR END ||
       |  CASE WHEN doc_id % 6 = 0 THEN '?utm_source=feed&id=' || (doc_id % 50)::VARCHAR
       |       WHEN doc_id % 6 = 1 THEN '?id=' || (doc_id % 50)::VARCHAR || '&utm_campaign=x&ref=tw'
       |       WHEN doc_id % 6 = 2 THEN '?gclid=abc123'
       |       WHEN doc_id % 6 = 3 THEN '?a=1&b=2' ELSE '' END ||
       |  CASE WHEN doc_id % 8 = 0 THEN '#Section-2' ELSE '' END
       |  END""".stripMargin

  /** DuckDB twin of UrlCuration.hostOf on column `url` (assumes the
    * input always carries a scheme, as the synthetic builders do).
    * Bracketed IPv6 authorities quarantine to NULL (r16 advice fix) —
    * mirrored from the Scala expression.
    */
  private def duckHostExprOf(urlCol: String): String =
    s"""CASE WHEN substr(regexp_extract(regexp_replace(trim($urlCol),
       |      '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '^([^/?#]*)', 1), 1, 1) = '['
       |    THEN NULL
       |    ELSE lower(regexp_extract(regexp_extract(
       |      regexp_replace(trim($urlCol), '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
       |      '^([^/?#]*)', 1), '^([^:]*)', 1)) END""".stripMargin

  private lazy val duckHostExpr: String = duckHostExprOf("url")

  /** DuckDB transliteration of UrlCuration.urlNormalizeCol as CTE steps:
    * expects a relation `$rel(…, url)`, defines `p5(…, url_norm)`.
    */
  private def duckUrlNormCtesFrom(rel: String): String = {
    val trackRe =
      "^(utm_[^=&]*|gclid|fbclid|msclkid|yclid|mc_eid|igshid|ref|ref_src|_ga)(=|$)"
    s"""p1 AS (SELECT *, trim(url) AS __src FROM $rel),
       |p2 AS (SELECT *,
       |  lower(regexp_extract(__src, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS __scheme,
       |  regexp_replace(regexp_replace(__src, '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
       |    '#.*', '') AS __nofrag FROM p1),
       |p3 AS (SELECT *, regexp_extract(__nofrag, '^([^/?]*)', 1) AS __auth,
       |  regexp_replace(__nofrag, '^[^/?]*', '') AS __pathq FROM p2),
       |p4 AS (SELECT *, lower(regexp_extract(__auth, '^([^:]*)', 1)) AS __host,
       |  regexp_extract(__auth, ':([0-9]+)$$', 1) AS __port,
       |  regexp_extract(__pathq, '^([^?]*)', 1) AS __path,
       |  coalesce(array_to_string(list_filter(
       |    string_split(regexp_extract(__pathq, '\\?(.*)', 1), '&'),
       |    x -> x <> '' AND NOT regexp_matches(x, '$trackRe')), '&'), '') AS __qn
       |  FROM p3),
       |p5 AS (SELECT *, CASE WHEN __scheme = '' OR __host = ''
       |    OR substr(__auth, 1, 1) = '[' THEN NULL ELSE
       |    __scheme || '://' || __host ||
       |    CASE WHEN __port = '' OR (__scheme = 'http' AND __port = '80')
       |         OR (__scheme = 'https' AND __port = '443') THEN ''
       |         ELSE ':' || __port END ||
       |    CASE WHEN __path = '' THEN '/' ELSE __path END ||
       |    CASE WHEN __qn = '' THEN '' ELSE '?' || __qn END END AS url_norm
       |  FROM p4)""".stripMargin
  }

  private lazy val duckUrlNormCtes: String = duckUrlNormCtesFrom("u")

  /** Suffix rules used by the w02/w03 queries (explicit so the oracle
    * inlines them); depth-1 and depth-2 entries of
    * [[pipeline.UrlCuration.defaultSuffixes]] that the synthetic hosts hit.
    */
  private lazy val wSuffixes =
    Seq("com", "org", "uk", "io", "au", "co.uk", "net.au", "github.io",
      "blogspot.com")

  /** DuckDB twin of UrlCuration.registeredDomain on relation `h(…, host)`:
    * defines `d3(…, registered_domain, registered_domain_suffix)`.
    */
  private lazy val duckRegDomainCtes: String = {
    val d1 = wSuffixes.filter(!_.contains('.')).map(s => s"'$s'").mkString(", ")
    val d2 = wSuffixes.filter(_.contains('.')).map(s => s"'$s'").mkString(", ")
    s"""d1 AS (SELECT *, string_split(lower(host), '.') AS __l,
       |  len(string_split(lower(host), '.')) AS __n FROM h),
       |d2 AS (SELECT *, CASE
       |    WHEN __n >= 2 AND array_to_string(__l[__n - 1:__n], '.') IN ($d2) THEN 2
       |    WHEN __n >= 1 AND __l[__n] IN ($d1) THEN 1
       |    WHEN __n >= 1 THEN 1 END AS __d FROM d1),
       |d3 AS (SELECT *,
       |  CASE WHEN __d IS NOT NULL
       |    THEN array_to_string(__l[__n - __d + 1:__n], '.') END AS registered_domain_suffix,
       |  CASE WHEN __n >= __d + 1
       |    THEN array_to_string(__l[__n - __d:__n], '.') END AS registered_domain
       |  FROM d2)""".stripMargin
  }

  private val urlQ: Seq[Q] = Seq(
    Q("w01_url_normalize",
      (s, d) => {
        val m = mgr(s, d)
        val docs = m.getDDFByName("documents").df
          .select(col("doc_id"), syntheticUrl(40).as("url"))
        pipeline.UrlCuration.urlNormalize(docs, "url")
          .select("doc_id", "url", "url_norm")
          .orderBy("doc_id")
      },
      Some(s"""WITH u AS (SELECT doc_id, ${duckUrlRaw(40)} AS url FROM documents),
              |$duckUrlNormCtes
              |SELECT doc_id, url, url_norm FROM p5 ORDER BY doc_id""".stripMargin)),

    Q("w02_registered_domain",
      (s, d) => {
        val m = mgr(s, d)
        val hosts = m.getDDFByName("documents").df
          .select(col("doc_id"),
            pipeline.UrlCuration.hostOf(syntheticUrl(40)).as("host"))
        pipeline.UrlCuration.registeredDomain(hosts, "host", wSuffixes)
          .select("doc_id", "host", "registered_domain", "registered_domain_suffix")
          .orderBy("doc_id")
      },
      Some(s"""WITH u AS (SELECT doc_id, ${duckUrlRaw(40)} AS url FROM documents),
              |h AS (SELECT doc_id, $duckHostExpr AS host FROM u),
              |$duckRegDomainCtes
              |SELECT doc_id, host, registered_domain, registered_domain_suffix
              |FROM d3 ORDER BY doc_id""".stripMargin)),

    Q("w03_domain_cap_build",
      (s, d) => {
        val m = mgr(s, d)
        // the composed crawl-curation shape: normalize → registered
        // domain → broadcast blocklist anti-join → per-domain cap (5
        // best-by-length docs per registrant) via budgetSelectByGroup —
        // the payload never rides a window, the blocklist never shuffles
        val spark = s
        import spark.implicits._
        val docs = m.getDDFByName("documents").df
          .select(col("doc_id"), col("n_chars"), syntheticUrl(5).as("url"))
        val withDom = pipeline.UrlCuration.registeredDomain(
          docs.withColumn("host", pipeline.UrlCuration.hostOf(col("url"))),
          "host", wSuffixes)
        val block = Seq("example.com", "site-3.co.uk").toDF("blocked")
        val allowed = withDom
          .join(broadcast(block), col("registered_domain") === col("blocked"),
            "left_anti")
          .withColumn("__cost", lit(1L))
        Views.budgetSelectByGroup(allowed, "registered_domain",
            Seq(col("n_chars").desc, col("doc_id").asc), "__cost",
            budgets = Map.empty, defaultBudget = 5L)
          .select("doc_id", "registered_domain", "n_chars")
          .orderBy("registered_domain", "doc_id")
      },
      Some(s"""WITH u AS (SELECT doc_id, n_chars, ${duckUrlRaw(5)} AS url
              |  FROM documents),
              |h AS (SELECT doc_id, n_chars, $duckHostExpr AS host FROM u),
              |$duckRegDomainCtes,
              |r AS (SELECT doc_id, registered_domain, n_chars,
              |    row_number() OVER (PARTITION BY registered_domain
              |      ORDER BY n_chars DESC, doc_id) AS rn
              |  FROM d3
              |  WHERE registered_domain IS NULL
              |     OR registered_domain NOT IN ('example.com', 'site-3.co.uk'))
              |SELECT doc_id, registered_domain, n_chars FROM r WHERE rn <= 5
              |ORDER BY registered_domain, doc_id""".stripMargin)),

    Q("w05_registered_domain_psl",
      (s, d) => {
        val m = mgr(s, d)
        // the FULL public-suffix algorithm (r15): wildcard '*.ck' makes
        // every <label>.ck its own suffix, exception '!www.ck' carves
        // www.ck back out as a registrable domain, exacts and the
        // implicit '*' default rule fill the rest — hosts synthesized to
        // hit every rule class including the host-IS-suffix NULL case
        val id = col("doc_id")
        val host = when(id % 6 === 0,
            concat(lit("www.Site-"), (id % 40).cast("string"), lit(".Co.UK")))
          .when(id % 6 === 1,
            concat(lit("a.b.Site-"), (id % 40).cast("string"), lit(".CK")))
          .when(id % 6 === 2, lit("WWW.CK"))
          .when(id % 6 === 3, lit("Sub.www.ck"))
          .when(id % 6 === 4,
            concat(lit("Site-"), (id % 40).cast("string"), lit(".ck")))
          .otherwise(
            concat(lit("x.Site-"), (id % 40).cast("string"), lit(".example.com")))
        val hosts = m.getDDFByName("documents").df.select(id, host.as("host"))
        pipeline.UrlCuration.registeredDomain(hosts, "host",
            Seq("com", "uk", "co.uk", "ck", "*.ck", "!www.ck"))
          .select("doc_id", "host", "registered_domain", "registered_domain_suffix")
          .orderBy("doc_id")
      },
      Some("""WITH h AS (SELECT doc_id, CASE
             |    WHEN doc_id % 6 = 0 THEN 'www.Site-' || (doc_id % 40)::VARCHAR || '.Co.UK'
             |    WHEN doc_id % 6 = 1 THEN 'a.b.Site-' || (doc_id % 40)::VARCHAR || '.CK'
             |    WHEN doc_id % 6 = 2 THEN 'WWW.CK'
             |    WHEN doc_id % 6 = 3 THEN 'Sub.www.ck'
             |    WHEN doc_id % 6 = 4 THEN 'Site-' || (doc_id % 40)::VARCHAR || '.ck'
             |    ELSE 'x.Site-' || (doc_id % 40)::VARCHAR || '.example.com' END AS host
             |  FROM documents),
             |d1 AS (SELECT *, string_split(lower(host), '.') AS l,
             |  len(string_split(lower(host), '.')) AS n FROM h),
             |d2 AS (SELECT *, CASE
             |    WHEN n >= 2 AND array_to_string(l[n - 1:n], '.') = 'www.ck' THEN 1
             |    WHEN n >= 2 AND (array_to_string(l[n - 1:n], '.') = 'co.uk'
             |                     OR l[n] = 'ck') THEN 2
             |    WHEN n >= 1 AND l[n] IN ('com', 'uk', 'ck') THEN 1
             |    WHEN n >= 1 THEN 1 END AS d FROM d1)
             |SELECT doc_id, host,
             |  CASE WHEN n >= d + 1 THEN array_to_string(l[n - d:n], '.') END
             |    AS registered_domain,
             |  CASE WHEN d IS NOT NULL THEN array_to_string(l[n - d + 1:n], '.') END
             |    AS registered_domain_suffix
             |FROM d2 ORDER BY doc_id""".stripMargin)),

    Q("w06_domain_datacard",
      (s, d) => {
        val m = mgr(s, d)
        // the crawl report card (r15): URL family composed with p10's
        // datasheet — registered domain becomes the reporting key, so a
        // corpus owner reads per-REGISTRANT volumes, dup rates, quality
        // pass counts and language mix (the admission question at
        // domain granularity, not source-tag granularity)
        val docs = m.getDDFByName("documents").df
          .select(col("doc_id"), col("text"), syntheticUrl(5).as("url"))
        val withDom = pipeline.UrlCuration.registeredDomain(
          docs.withColumn("host", pipeline.UrlCuration.hostOf(col("url"))),
          "host", wSuffixes)
        pipeline.TextAnalysis.datacard(withDom, "text", "doc_id",
            "registered_domain")
          .select(col("source").as("registered_domain"), col("n_docs"),
            col("n_tokens"), col("n_dup_docs"), col("n_quality_hi"),
            col("top_lang"), col("n_langs"))
          .orderBy("registered_domain")
      },
      Some(s"""WITH u AS (SELECT doc_id, text, ${duckUrlRaw(5)} AS url
              |  FROM documents),
              |h AS (SELECT doc_id, text, $duckHostExpr AS host FROM u),
              |$duckRegDomainCtes,
              |sc AS (SELECT doc_id, registered_domain AS source, text,
              |    $duckLangScores
              |  FROM d3),
              |b AS (SELECT source, md5(${duckNorm("text")}) AS fp,
              |    ${duckTokenCount("text")} AS tc,
              |    $duckLangCase AS lang,
              |    CASE WHEN ${duckQuality("text")} >= 0.5 THEN 1 ELSE 0 END AS hi
              |  FROM sc),
              |g AS (SELECT source, fp, count(*) AS n, sum(tc) AS tok,
              |    sum(hi) AS hi, min(lang) AS lang
              |  FROM b GROUP BY source, fp),
              |per AS (SELECT source, sum(n)::BIGINT AS n_docs,
              |    sum(tok)::BIGINT AS n_tokens,
              |    (sum(n) - count(*))::BIGINT AS n_dup_docs,
              |    sum(hi)::BIGINT AS n_quality_hi
              |  FROM g GROUP BY source),
              |lc AS (SELECT source, lang, sum(n) AS ln FROM g GROUP BY source, lang),
              |top AS (SELECT source, lang,
              |    row_number() OVER (PARTITION BY source ORDER BY ln DESC, lang) AS rn,
              |    count(*) OVER (PARTITION BY source) AS nl FROM lc)
              |SELECT p.source AS registered_domain, p.n_docs, p.n_tokens,
              |  p.n_dup_docs, p.n_quality_hi, t.lang AS top_lang,
              |  t.nl::BIGINT AS n_langs
              |FROM per p JOIN top t
              |  ON t.source IS NOT DISTINCT FROM p.source AND t.rn = 1
              |ORDER BY registered_domain""".stripMargin)),

    Q("w04_url_dedup",
      (s, d) => {
        val m = mgr(s, d)
        // distinct raw spellings of one resource (tracking params, case,
        // default ports, '' vs '/' paths, fragments) collapse to one
        // canonical group; only the canonical key shuffles
        val docs = m.getDDFByName("documents").df
          .select(col("doc_id"), syntheticUrl(5).as("url"))
        pipeline.UrlCuration.urlDedup(docs, "url", "doc_id")
          .orderBy("url_norm")
      },
      Some(s"""WITH u AS (SELECT doc_id, ${duckUrlRaw(5)} AS url FROM documents),
              |$duckUrlNormCtes
              |SELECT url_norm, min(doc_id)::BIGINT AS keep_id,
              |  count(*)::BIGINT AS n_dups
              |FROM p5 WHERE url_norm IS NOT NULL
              |GROUP BY url_norm ORDER BY url_norm""".stripMargin))
  )

  // ---------------------------------------------------------------
  // HTML/markup extraction (h01-h03) — the front end of the crawl
  // pipeline the w-family serves: raw markup → text + outlinks.
  // ---------------------------------------------------------------

  /** Synthetic HTML document from `documents` rows: entities (incl.
    * double-escapes), a style block, a script subtree on 1/3 of docs, a
    * comment, the doc's text, one messy absolute link ([[syntheticUrl]],
    * so the IPv6 quarantine rides through h03), and per-residue
    * root-relative / relative / fragment+mailto / protocol-relative
    * links. Mirrored verbatim by [[duckHtmlRaw]].
    */
  private def syntheticHtml: Column = {
    val id = col("doc_id")
    concat(
      lit("<!DOCTYPE html><html><head><title>Doc "), id.cast("string"),
      lit(" &amp; friends</title><style>p{m:"), (id % 7).cast("string"),
      lit("}</style>"),
      when(id % 3 === 0,
        concat(lit("<script>var p=\"<b>skip "), (id % 5).cast("string"),
          lit("</b>\";</script>"))).otherwise(""),
      lit("</head><body><!-- c "), (id % 5).cast("string"),
      lit(" --><h1>Title&nbsp;"), (id % 9).cast("string"),
      lit("</h1><p class=\"big\">"), substring(col("text"), 1, 60),
      lit(" &lt;q&gt; &#38; x</p><a href=\""), syntheticUrl(12), lit("\">a1</a>"),
      when(id % 4 === 1,
        concat(lit("<a href='/rel/"), (id % 20).cast("string"), lit("'>a2</a>")))
        .when(id % 4 === 2,
          concat(lit("<a href=sub/p-"), (id % 10).cast("string"), lit(".html>a3</a>")))
        .when(id % 4 === 3,
          lit("<a href=\"#top\">f</a><a href=\"mailto:a@b.c\">m</a>"))
        .otherwise(lit("<a href=\"//cdn.ex.com/l.js\">c</a>")),
      lit("</body></html>"))
  }

  /** Base (document) URL for the h02/h03 resolution cases: pathless,
    * file-with-query, and trailing-dir forms. Mirrored by the oracle.
    */
  private def syntheticBaseUrl: Column = {
    val id = col("doc_id")
    when(id % 3 === 0,
      concat(lit("https://site-"), (id % 15).cast("string"), lit(".example.com")))
      .when(id % 3 === 1,
        concat(lit("https://site-"), (id % 15).cast("string"),
          lit(".example.com/dir/page.html?s=1")))
      .otherwise(concat(lit("http://site-"), (id % 15).cast("string"),
        lit(".example.com:8080/a/b/")))
  }

  /** DuckDB twin of [[syntheticHtml]] (same stripMargin discipline as
    * [[duckUrlRaw]]: every concat `||` sits at a line END).
    */
  private lazy val duckHtmlRaw: String =
    s"""'<!DOCTYPE html><html><head><title>Doc ' || doc_id::VARCHAR ||
       |  ' &amp; friends</title><style>p{m:' || (doc_id % 7)::VARCHAR ||
       |  '}</style>' ||
       |  CASE WHEN doc_id % 3 = 0 THEN '<script>var p="<b>skip ' ||
       |    (doc_id % 5)::VARCHAR || '</b>";</script>' ELSE '' END ||
       |  '</head><body><!-- c ' || (doc_id % 5)::VARCHAR ||
       |  ' --><h1>Title&nbsp;' || (doc_id % 9)::VARCHAR ||
       |  '</h1><p class="big">' || substr(text, 1, 60) ||
       |  ' &lt;q&gt; &#38; x</p><a href="' || (${duckUrlRaw(12)}) || '">a1</a>' ||
       |  CASE WHEN doc_id % 4 = 1 THEN '<a href=''/rel/' ||
       |    (doc_id % 20)::VARCHAR || '''>a2</a>'
       |  WHEN doc_id % 4 = 2 THEN '<a href=sub/p-' ||
       |    (doc_id % 10)::VARCHAR || '.html>a3</a>'
       |  WHEN doc_id % 4 = 3 THEN '<a href="#top">f</a><a href="mailto:a@b.c">m</a>'
       |  ELSE '<a href="//cdn.ex.com/l.js">c</a>' END ||
       |  '</body></html>'""".stripMargin

  /** DuckDB twin of [[syntheticBaseUrl]]. */
  private lazy val duckBaseUrlRaw: String =
    """CASE WHEN doc_id % 3 = 0 THEN 'https://site-' ||
      |    (doc_id % 15)::VARCHAR || '.example.com'
      |  WHEN doc_id % 3 = 1 THEN 'https://site-' ||
      |    (doc_id % 15)::VARCHAR || '.example.com/dir/page.html?s=1'
      |  ELSE 'http://site-' ||
      |    (doc_id % 15)::VARCHAR || '.example.com:8080/a/b/' END""".stripMargin

  /** DuckDB transliteration of HtmlExtract.htmlToTextCol as CTE steps:
    * expects a relation `u(…, html)`, defines `e(…, text_extracted)`.
    */
  private lazy val duckHtmlTextCtes: String =
    """e0 AS (SELECT *, regexp_replace(html, '(?s)<!--.*?-->', ' ', 'g') AS t0
      |  FROM u),
      |e1 AS (SELECT *, regexp_replace(regexp_replace(t0,
      |    '(?is)<script\b[^>]*>.*?</script\s*>', ' ', 'g'),
      |    '(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g') AS t1 FROM e0),
      |e2 AS (SELECT *, regexp_replace(t1, '<[/!A-Za-z][^>]*>', ' ', 'g') AS t2
      |  FROM e1),
      |e3 AS (SELECT *,
      |  replace(replace(replace(replace(replace(replace(replace(replace(
      |    replace(replace(replace(replace(
      |    t2, '&lt;', '<'), '&#60;', '<'), '&gt;', '>'), '&#62;', '>'),
      |    '&quot;', '"'), '&#34;', '"'), '&apos;', ''''), '&#39;', ''''),
      |    '&nbsp;', ' '), '&#160;', ' '), '&amp;', '&'), '&#38;', '&') AS t3
      |  FROM e2),
      |e AS (SELECT *, trim(regexp_replace(t3, '[\s\x{00A0}]+', ' ', 'g'))
      |    AS text_extracted
      |  FROM e3)""".stripMargin

  /** DuckDB transliteration of HtmlExtract.hrefsCol + resolveHrefCol as
    * CTE steps: expects `u(…, src_url, html)`, defines
    * `r(…, href, resolved)` — one row per extracted href.
    */
  private lazy val duckLinkCtes: String =
    """l AS (SELECT doc_id, src_url, unnest(regexp_extract_all(html,
      |    '(?i)<a\b[^>]*\bhref\s*=\s*("[^"]*"|''[^'']*''|[^\s>]+)', 1)) AS h0
      |  FROM u),
      |hr AS (SELECT doc_id, src_url, replace(regexp_replace(regexp_replace(h0,
      |    '^["'']', ''), '["'']$', ''), '&amp;', '&') AS href FROM l),
      |rb AS (SELECT *, trim(href) AS th,
      |    regexp_extract(src_url, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)
      |      AS origin,
      |    lower(regexp_extract(src_url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
      |      AS bscheme,
      |    regexp_replace(src_url, '[?#].*', '') AS bstripped
      |  FROM hr),
      |rc AS (SELECT *, CASE WHEN regexp_matches(bstripped,
      |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*$') THEN bstripped || '/'
      |    ELSE regexp_replace(bstripped, '/[^/]*$', '/') END AS bdir FROM rb),
      |r AS (SELECT doc_id, src_url, href, CASE
      |      WHEN th = '' OR substr(th, 1, 1) = '#' THEN NULL
      |      WHEN regexp_matches(th, '^[A-Za-z][A-Za-z0-9+.-]*:') THEN
      |        CASE WHEN regexp_matches(th, '^(?i)https?://') THEN th END
      |      WHEN origin = '' THEN NULL
      |      WHEN substr(th, 1, 2) = '//' THEN bscheme || ':' || th
      |      WHEN substr(th, 1, 1) = '/' THEN origin || th
      |      ELSE bdir || th END AS resolved
      |  FROM rc)""".stripMargin

  private val htmlQ: Seq[Q] = Seq(
    Q("ht01_html_to_text",
      (s, d) => {
        val m = mgr(s, d)
        val docs = m.getDDFByName("documents").df
          .select(col("doc_id"), syntheticHtml.as("html"))
        pipeline.HtmlExtract.htmlToText(docs, "html", "text_extracted")
          .select("doc_id", "text_extracted")
          .orderBy("doc_id")
      },
      Some(s"""WITH u AS (SELECT doc_id, $duckHtmlRaw AS html FROM documents),
              |$duckHtmlTextCtes
              |SELECT doc_id, text_extracted FROM e ORDER BY doc_id""".stripMargin)),

    Q("ht02_link_extract",
      (s, d) => {
        val m = mgr(s, d)
        val docs = m.getDDFByName("documents").df
          .select(col("doc_id"), syntheticBaseUrl.as("src_url"),
            syntheticHtml.as("html"))
        docs.select(col("doc_id"), col("src_url"),
            explode(pipeline.HtmlExtract.hrefsCol(col("html"))).as("href"))
          .withColumn("resolved",
            pipeline.HtmlExtract.resolveHrefCol(col("src_url"), col("href")))
          .orderBy("doc_id", "href")
      },
      Some(s"""WITH u AS (SELECT doc_id, $duckBaseUrlRaw AS src_url,
              |    $duckHtmlRaw AS html FROM documents),
              |$duckLinkCtes
              |SELECT doc_id, src_url, href, resolved FROM r
              |ORDER BY doc_id, href""".stripMargin)),

    Q("ht03_crawl_extract_build",
      (s, d) => {
        val m = mgr(s, d)
        // the composed front-of-pipeline build extending w03: raw HTML →
        // link extraction → resolution → canonical URL (IPv6/garbage
        // quarantined to NULL and dropped) → one key-only dedup shuffle →
        // registered domain (broadcast suffix probes) → per-domain cap of
        // the 3 most-linked canonical URLs, payload never under a window
        val docs = m.getDDFByName("documents").df
          .select(col("doc_id"), syntheticBaseUrl.as("src_url"),
            syntheticHtml.as("html"))
        val links = pipeline.HtmlExtract.linkExtract(docs, "html", "src_url")
        val canon = links
          .select(pipeline.UrlCuration.urlNormalizeCol(col("resolved")).as("url_norm"))
          .filter(col("url_norm").isNotNull)
          .groupBy("url_norm").agg(count(lit(1)).as("n_links"))
        val withDom = pipeline.UrlCuration.registeredDomain(
          canon.withColumn("host", pipeline.UrlCuration.hostOf(col("url_norm"))),
          "host", wSuffixes)
        Views.budgetSelectByGroup(withDom.withColumn("__cost", lit(1L)),
            "registered_domain",
            Seq(col("n_links").desc, col("url_norm").asc), "__cost",
            budgets = Map.empty, defaultBudget = 3L)
          .select("url_norm", "registered_domain", "n_links")
          .orderBy("registered_domain", "url_norm")
      },
      Some(s"""WITH u AS (SELECT doc_id, $duckBaseUrlRaw AS src_url,
              |    $duckHtmlRaw AS html FROM documents),
              |$duckLinkCtes,
              |u2 AS (SELECT resolved AS url FROM r WHERE resolved IS NOT NULL),
              |${duckUrlNormCtesFrom("u2")},
              |g AS (SELECT url_norm, count(*)::BIGINT AS n_links FROM p5
              |  WHERE url_norm IS NOT NULL GROUP BY url_norm),
              |h AS (SELECT url_norm, n_links, ${duckHostExprOf("url_norm")} AS host
              |  FROM g),
              |$duckRegDomainCtes,
              |cap AS (SELECT url_norm, registered_domain, n_links,
              |    row_number() OVER (PARTITION BY registered_domain
              |      ORDER BY n_links DESC, url_norm) AS rn
              |  FROM d3)
              |SELECT url_norm, registered_domain, n_links FROM cap WHERE rn <= 3
              |ORDER BY registered_domain, url_norm""".stripMargin))
  )

  private val allQueries: Seq[Q] =
    relational ++ sqlFrontend ++ joins ++ aggregation ++ statsQ ++
      binningMissing ++ transforms ++ pipelineQ ++ curationQ ++ ingestQ ++
      urlQ ++ htmlQ

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allQueries.find(_.name == "q10_tpch_q1").get.fn(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
